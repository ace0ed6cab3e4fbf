"""Order-insensitive DataFrame comparison mirroring the driver's oracle gate.

Local approximation of the driver's t2 check (row-count + schema +
order-insensitive value-hash): canonicalize both result sets to sorted
tuples of normalized values and compare. Floats are rounded to 6 decimals
— registered queries already round their own aggregates harder than that,
so any mismatch surfacing here is a real semantic difference, not repr noise.
"""

from __future__ import annotations

import datetime
import decimal
import math
from typing import Any

import numpy as np
import pandas as pd


def canon_value(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, (bool, np.bool_)):
        return bool(v)
    if isinstance(v, (int, np.integer)):
        return int(v)
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return None
        return round(f, 6)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(canon_value(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def canon_frame(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = [
        tuple(canon_value(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]
    # Type-insensitive sort key: 100 (int) and 100.0 (float) must sort
    # identically on both sides or equal rows can misalign pairwise. repr as
    # final tiebreak keeps >2^53 ints deterministic; recurse into tuples so
    # array columns holding ints on one side / floats on the other align too.
    def _kv(v: Any) -> tuple:
        if isinstance(v, tuple):
            return (2, tuple(_kv(x) for x in v), "")
        if isinstance(v, (int, float)) and not isinstance(v, bool):
            return (1, float(v), repr(v))
        return (0, repr(v), "")

    return sorted(rows, key=lambda row: tuple(_kv(v) for v in row))


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str):
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column names differ: spark={sorted(spark_pdf.columns)} "
        f"oracle={sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count differs: spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    )
    s_rows = canon_frame(spark_pdf)
    o_rows = canon_frame(oracle_pdf)
    for i, (s, o) in enumerate(zip(s_rows, o_rows)):
        assert s == o, (
            f"{name}: first differing canonical row #{i}:\n  spark : {s}\n  oracle: {o}"
        )
