"""Order-insensitive DataFrame comparison mirroring the driver's oracle gate.

Local approximation of the driver's t2 check (row-count + schema +
order-insensitive value-hash): canonicalize both result sets to sorted
tuples of normalized values and compare. Floats are rounded to 6 decimals
— registered queries already round their own aggregates harder than that,
so any mismatch surfacing here is a real semantic difference, not repr noise.

Values are TYPE-TAGGED: the driver's value-hash distinguishes int 3 from
float 3.0 (DuckDB hugeint aggregates arrive as float64 while Spark emits
bigint — the r4 `p7_try_arithmetic` failure class), so `canon_value`
returns `(tag, value)` pairs and equality compares the tag too. The row
SORT key remains type-insensitive (floats and ints with equal value sort
together) so equal-valued rows still align pairwise before the strict
equality runs.
"""

from __future__ import annotations

import datetime
import decimal
import math
from typing import Any

import numpy as np
import pandas as pd

# Tags: z=null  b=bool  i=int  f=float(Decimal folds here)  s=string-like
# (str / bytes-hex / timestamps-as-iso)  a=array/tuple
def canon_value(v: Any) -> tuple:
    if v is None:
        return ("z", None)
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            # NaN is how pandas spells NULL in numeric columns — collapse to
            # the null tag so a nullable bigint (object None on one side,
            # float64 NaN on the other) doesn't false-fail on the tag.
            return ("z", None)
        return ("f", round(f, 6))
    if isinstance(v, pd.Timestamp):
        return ("s", v.to_pydatetime().replace(tzinfo=None).isoformat())
    if isinstance(v, datetime.datetime):
        return ("s", v.replace(tzinfo=None).isoformat())
    if isinstance(v, datetime.date):
        return ("s", v.isoformat())
    if isinstance(v, (list, tuple, np.ndarray)):
        return ("a", tuple(canon_value(x) for x in v))
    if isinstance(v, bytes):
        return ("s", v.hex())
    return ("s", str(v))


def canon_frame(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = [
        tuple(canon_value(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]

    # Type-insensitive sort key: 100 (int) and 100.0 (float) must sort
    # identically on both sides or equal rows can misalign pairwise — the
    # tag is excluded from the numeric sort key and only used as the final
    # tiebreak. repr keeps >2^53 ints deterministic; recurse into tuples.
    def _kv(tv: tuple) -> tuple:
        tag, v = tv
        if tag == "a":
            return (2, tuple(_kv(x) for x in v), "")
        if tag in ("i", "f") and v is not None:
            return (1, float(v), repr(v) + tag)
        return (0, repr(v), tag)

    return sorted(rows, key=lambda row: tuple(_kv(v) for v in row))


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str):
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column names differ: spark={sorted(spark_pdf.columns)} "
        f"oracle={sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count differs: spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    )
    # Column-level dtype guard: an integer column on one side vs a float
    # column on the other is the hugeint/float64 driver-hash failure class
    # even when the frame is EMPTY (value-level tags can't see 0 rows).
    # Only hard numeric-kind conflicts fail here — object columns defer to
    # the per-value tags below.
    def _kind(series: pd.Series) -> str:
        # Extend pandas dtype kinds with 'D' for object columns that hold
        # decimal.Decimal values: Spark fetches DecimalType as Decimal
        # objects while DuckDB's client demotes DECIMAL(>18) to float64, a
        # pair the driver's type-tagged hash fails but the float-folding
        # value tags below cannot see (the r13 a19_decimal_money class).
        k = series.dtype.kind
        if k == "O" and any(
            isinstance(v, decimal.Decimal) for v in series.dropna().head(16)
        ):
            return "D"
        return k

    for col in sorted(spark_pdf.columns):
        sk = _kind(spark_pdf[col])
        ok = _kind(oracle_pdf[col])
        int_vs_float = {"i", "u"} & {sk} and ok == "f" or sk == "f" and ok in "iu"
        bool_vs_num = ("b" in (sk, ok)) and ({sk, ok} & set("iuf"))
        dec_vs_float = ("D" in (sk, ok)) and ({sk, ok} & set("iuf"))
        assert not (int_vs_float or bool_vs_num or dec_vs_float), (
            f"{name}: column {col!r} dtype-kind mismatch: "
            f"spark={spark_pdf[col].dtype} (kind {sk}) "
            f"oracle={oracle_pdf[col].dtype} (kind {ok}) "
            "(driver value-hash distinguishes int/Decimal from float — cast "
            "the boundary, e.g. CAST(SUM(...) AS BIGINT) or AS VARCHAR for "
            "DECIMAL wider than 18 digits)"
        )
    s_rows = canon_frame(spark_pdf)
    o_rows = canon_frame(oracle_pdf)
    for i, (s, o) in enumerate(zip(s_rows, o_rows)):
        assert s == o, (
            f"{name}: first differing canonical row #{i}:\n  spark : {s}\n  oracle: {o}"
        )
