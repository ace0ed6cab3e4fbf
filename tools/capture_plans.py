"""Capture .explain('formatted') for a list of registry queries.

Usage: python tools/capture_plans.py <out_dir> <suffix> name1,name2,...

Writes <out_dir>/<name>_<suffix>.txt for each query. Queries whose
builder runs eager driver-side steps (streaming rows, iterative loops)
still produce a plan for their RETURNED frame; the file notes that the
returned plan is the final stage only.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lime_on_spark_spark.plans import registry  # noqa: E402
from lime_on_spark_spark.session import get_spark  # noqa: E402


def main() -> int:
    out_dir, suffix, names_csv = sys.argv[1], sys.argv[2], sys.argv[3]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = [n for n in names_csv.split(",") if n]
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    for name in names:
        fn = qs[name]
        try:
            import contextlib
            import io

            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as exc:  # noqa: BLE001
            plan = f"PLAN CAPTURE FAILED: {exc!r}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
