"""Static oracle-SQL convention checks (no Spark session needed).

Enforces the registry.py docstring rule born from the r13 driver-red
``a19_decimal_money``: a SUM/AVG over a DECIMAL expression widens past 18
digits (DuckDB: SUM(DECIMAL) -> DECIMAL(38,s); Spark: precision+10), and
DuckDB's pandas client demotes any DECIMAL wider than 18 digits to
float64 on fetch while Spark returns exact ``decimal.Decimal`` objects.
The driver's value hash type-tags Decimal vs float, so such a pair fails
even when numerically identical.  Rule: every SUM/AVG whose argument
involves a DECIMAL cast must be wrapped in a CAST/TRY_CAST to a
NON-DECIMAL type — ``AS VARCHAR(n)`` (digit-exact) or ``AS DOUBLE``
(float on both sides).  ROUND is NOT a guard: DuckDB's
``ROUND(DECIMAL, n)`` returns ``DECIMAL(38, s)`` (probed), which the
client still demotes — the exact hazard, one wrapper deeper.  Nor is a
CAST back to a DECIMAL type.  This static pass is defense-in-depth; the
runtime referee is tests/compare.py's Decimal-vs-float kind check, which
sweeps every oracle pair at three SFs.
"""

from __future__ import annotations

import re

from lime_on_spark_spark.plans import registry

_AGG_RE = re.compile(r"\b(SUM|AVG)\s*\(", re.IGNORECASE)

#: Cast target types that neutralise the decimal-width boundary hazard.
_SAFE_TARGET = re.compile(
    r"\bAS\s+(VARCHAR|CHAR|TEXT|STRING|DOUBLE|FLOAT|REAL|BIGINT|INTEGER|INT)\b",
    re.IGNORECASE,
)


def _balanced_arg(sql: str, open_idx: int) -> str:
    """Return the text inside the paren opening at ``open_idx``."""
    depth = 0
    for i in range(open_idx, len(sql)):
        if sql[i] == "(":
            depth += 1
        elif sql[i] == ")":
            depth -= 1
            if depth == 0:
                return sql[open_idx + 1 : i]
    return sql[open_idx + 1 :]


def _enclosing_calls(sql: str, pos: int) -> list[tuple[str, int]]:
    """(name, open-paren index) of calls whose parens are open at ``pos``."""
    stack: list[tuple[str, int]] = []
    for m in re.finditer(r"[()]", sql[:pos]):
        if m.group() == "(":
            prefix = sql[: m.start()].rstrip()
            word = re.search(r"([A-Za-z_][A-Za-z_0-9]*)\s*$", prefix)
            stack.append((word.group(1).upper() if word else "", m.start()))
        elif stack:
            stack.pop()
    return stack


def _cast_guards(sql: str, pos: int) -> bool:
    """True iff some enclosing CAST/TRY_CAST targets a non-DECIMAL type.

    The target type is the LAST depth-0 ``AS <type>`` inside the cast's
    balanced argument; a cast back to DECIMAL/NUMERIC does not guard.
    """
    for name, open_idx in _enclosing_calls(sql, pos):
        if name not in ("CAST", "TRY_CAST"):
            continue
        arg = _balanced_arg(sql, open_idx)
        # Strip nested parens so inner `AS DECIMAL(18,2)` casts don't
        # shadow the OUTER cast's own target.
        depth, flat = 0, []
        for ch in arg:
            depth += ch == "("
            if depth == 0:
                flat.append(ch)
            depth -= ch == ")"
        targets = list(_SAFE_TARGET.finditer("".join(flat)))
        if targets:
            return True
    return False


def _unguarded_decimal_aggs(sql: str) -> list[str]:
    """SUM/AVG calls over DECIMAL expressions not under a non-decimal cast."""
    bad: list[str] = []
    for m in _AGG_RE.finditer(sql):
        open_idx = sql.index("(", m.end() - 1)
        arg = _balanced_arg(sql, open_idx)
        if "DECIMAL" not in arg.upper():
            continue
        if not _cast_guards(sql, m.start()):
            bad.append(sql[m.start() : open_idx + 1] + arg[:60] + "...)")
    return bad


def test_no_oracle_returns_wide_decimal():
    offenders = {
        name: bad
        for name, sql in registry.oracle_sql().items()
        if (bad := _unguarded_decimal_aggs(sql))
    }
    assert not offenders, (
        "oracles with SUM/AVG over DECIMAL not wrapped in a cast to a "
        "non-decimal type (DuckDB demotes DECIMAL>18 to float64; the "
        f"driver hash type-tags Decimal vs float): {offenders}"
    )


def test_scanner_catches_the_a19_class():
    # The exact shape that was driver-red in r13 must be flagged...
    red = """
    SELECT l_returnflag,
           SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS gross
    FROM lineitem GROUP BY l_returnflag
    """
    assert _unguarded_decimal_aggs(red)
    # ...as must the one-wrapper-deeper variants that still return a bare
    # wide DECIMAL: ROUND (DuckDB ROUND(DECIMAL) stays DECIMAL(38,s)) and
    # a cast BACK to decimal.
    still_red = """
    SELECT ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 6) AS g,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                AS DECIMAL(38,4)) AS h
    FROM lineitem
    """
    assert len(_unguarded_decimal_aggs(still_red)) == 2
    # The fixed shapes pass: a string-cast boundary, a double cast, and a
    # decimal-free SUM.
    green = """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                AS VARCHAR(64)) AS g,
           CAST(AVG(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS d,
           SUM(l_quantity) AS q
    FROM lineitem
    """
    assert not _unguarded_decimal_aggs(green)
