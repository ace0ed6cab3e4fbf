"""Static oracle-SQL convention checks (no Spark session needed).

Enforces the registry.py docstring rule born from the r13 driver-red
``a19_decimal_money``: a SUM/AVG over a DECIMAL expression widens past 18
digits (DuckDB: SUM(DECIMAL) -> DECIMAL(38,s); Spark: precision+10), and
DuckDB's pandas client demotes any DECIMAL wider than 18 digits to
float64 on fetch while Spark returns exact ``decimal.Decimal`` objects.
The driver's value hash type-tags Decimal vs float, so such a pair fails
even when numerically identical.  Rule: every SUM/AVG whose argument
involves a DECIMAL cast must itself be wrapped in a boundary cast —
``CAST(... AS VARCHAR)`` (digit-exact) or ``CAST(... AS DOUBLE)`` /
``ROUND(...)`` (float on both sides).
"""

from __future__ import annotations

import re

from lime_on_spark_spark.plans import registry

#: Wrappers that neutralise the decimal-width boundary hazard when they
#: enclose the aggregate call: a string cast is digit-exact on both
#: engines; a double cast / round makes both sides float.
_GUARDS = {"CAST", "TRY_CAST", "ROUND"}

_AGG_RE = re.compile(r"\b(SUM|AVG)\s*\(", re.IGNORECASE)


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


def _enclosing_calls(sql: str, pos: int) -> list[str]:
    """Names of the call-sites whose parens are still open at ``pos``."""
    stack: list[str] = []
    for m in re.finditer(r"[()]", sql[:pos]):
        if m.group() == "(":
            prefix = sql[: m.start()].rstrip()
            word = re.search(r"([A-Za-z_][A-Za-z_0-9]*)\s*$", prefix)
            stack.append(word.group(1).upper() if word else "")
        elif stack:
            stack.pop()
    return stack


def _unguarded_decimal_aggs(sql: str) -> list[str]:
    """SUM/AVG calls over DECIMAL expressions not wrapped in a guard."""
    bad: list[str] = []
    for m in _AGG_RE.finditer(sql):
        open_idx = sql.index("(", m.end() - 1)
        arg = _balanced_arg(sql, open_idx)
        if "DECIMAL" not in arg.upper():
            continue
        if not (_GUARDS & set(_enclosing_calls(sql, m.start()))):
            bad.append(sql[m.start() : open_idx + 1] + arg[:60] + "...)")
    return bad


def test_no_oracle_returns_wide_decimal():
    offenders = {
        name: bad
        for name, sql in registry.oracle_sql().items()
        if (bad := _unguarded_decimal_aggs(sql))
    }
    assert not offenders, (
        "oracles with SUM/AVG over DECIMAL not wrapped in CAST/ROUND "
        "(DuckDB demotes DECIMAL>18 to float64; the driver hash type-tags "
        f"Decimal vs float): {offenders}"
    )


def test_scanner_catches_the_a19_class():
    # The exact shape that was driver-red in r13 must be flagged...
    red = """
    SELECT l_returnflag,
           SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS gross
    FROM lineitem GROUP BY l_returnflag
    """
    assert _unguarded_decimal_aggs(red)
    # ...and the fixed shape (string-cast boundary) must pass, as must a
    # decimal-free SUM and a rounded decimal AVG.
    green = """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS g,
           ROUND(AVG(CAST(l_discount AS DECIMAL(4,2))), 6) AS d,
           SUM(l_quantity) AS q
    FROM lineitem
    """
    assert not _unguarded_decimal_aggs(green)
