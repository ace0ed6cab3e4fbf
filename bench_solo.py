"""Solo-floor companion harness (BENCH_NOTES receipts, round-10 verdict
task 5): measures ONE registered query in a FRESH SparkSession — no shared-
session cache/GC inheritance, the co-tenancy control the per-round drift
attributions rely on.

Usage: ``python bench_solo.py <query_name> [more names...]``; each name
runs in its own subprocess (own JVM), warm-up + best-of-3 with
clearCache + System.gc() between runs (the bench.py isolation protocol),
printing one JSON line per name. Env: SPARK_GRAFT_SF_DIR (default sf0.1),
SPARK_GRAFT_CPUS.

Record the output in BENCH_NOTES.md each round for the ops whose driver-
artifact numbers drift across sessions (d10/d10b since round 8; the full
default set since round 11) so the next cross-session comparison has a
same-protocol floor to compare with.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _measure(name: str) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from lime_on_spark_spark.plans import registry
    from lime_on_spark_spark.session import get_spark

    spark = get_spark(f"solo-{name}")
    spark.sparkContext.setLogLevel("ERROR")
    fn = registry.queries()[name]

    def run_once() -> float:
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    run_once()  # warm-up (class loading, file index)
    times = [run_once() for _ in range(3)]
    print(
        json.dumps(
            {
                "query": name,
                "solo_floor_sec": round(min(times), 4),
                "runs": [round(t, 4) for t in times],
                "sf_dir": sf_dir,
            }
        )
    )
    sys.stdout.flush()
    spark.stop()


def main() -> None:
    # The child role is marked by an explicit argv flag, NOT an environment
    # variable: an inherited _SOLO_CHILD=1 in the caller's environment would
    # silently run the measurement in-process and lose fresh-JVM isolation.
    argv = sys.argv[1:]
    if argv and argv[0] == "--child":
        _measure(argv[1])
        return
    # Default set = every extended-block op whose artifact numbers have
    # drifted across sessions (d10/d10b since round 8) plus the heavy
    # round-9/10/11 entries the round-10 verdict asked to automate
    # (d86's 3.3x artifact outlier had to be hand-adjudicated).
    names = argv or [
        "d10_dup_clusters",
        "d10b_cc_star",
        "d86_mann_whitney",
        "d88_langid_classifier",
        "d91_pq_quantization",
        "d92_ivfadc_search",
        "d2_ngram_jaccard",
        "d84_cross_doc_spans",
        "d87_span_removal",
        # round-12: the CDC composition probes (constant-size synthetic
        # lineage — these floor connector/stream overhead, not data cost).
        "d97_incremental_view_maintenance",
        "t27_streaming_ivm",
    ]
    for name in names:
        # One JVM per op: a subprocess, not a loop in this process.
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", name],
            check=True,
        )


if __name__ == "__main__":
    main()
