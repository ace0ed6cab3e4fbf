"""C4-style corpus cleaning primitives (Raffel et al. 2020, §2.2).

Two stages every production pretraining pipeline runs that the funnel
(d49) previously lacked:

* **badwords blocklist** — flag/drop documents containing any term from a
  blocklist ("List of Dirty, Naughty, Obscene..." in C4; any broadcast
  term list here). The list is a driver-side constant compiled into the
  plan (a literal array / single predicate), so the filter is a narrow
  JVM-side scan — no shuffle, no Python. For blocklists too large to
  inline (millions of terms), switch to the token↦term broadcast
  semi-join: explode tokens, `F.broadcast(terms)` left-semi, groupBy
  doc_id — still one narrow join, never a regex of that size.
* **line-level cleaning** — split each page into lines, keep lines with
  >= ``min_words`` words, keep lines ending in terminal punctuation,
  remove all-but-one occurrence of any line duplicated across the
  corpus, and drop pages left with < ``min_lines`` surviving lines.

The line splitter is parameterized: C4 splits on ``\\n`` and tests the
last character against ``[.!?"']``; the synthetic test corpus has no
newlines or punctuation, so the registry rows (d106/d107 in
plans/datasel.py) instantiate fixed-width token chunking and a planted
terminal-token set instead — same rule structure, exact oracle counts.

Scale notes (100 TB):
* ``badwords_hits`` is a per-row higher-order-function over the token
  array — whole-stage-codegen'd, zero shuffle; the per-source profile is
  one map-side-combinable agg.
* ``chunk_lines`` is a narrow explode (fan-out len/width, no shuffle).
* Cross-doc line dedup shuffles ``(md5, doc_id, line_idx, source)`` —
  ~50 bytes per surviving line, never line bodies — and only for lines
  that already passed the narrow min-words/terminal filters.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _literal_sep(sep: str) -> str:
    """Quote ``sep`` for Java-regex ``F.split`` so it matches literally
    (Pattern.quote semantics: \\Q...\\E, with embedded \\E split out).
    The documented DuckDB twin (string_split) is literal, so a
    regex-meaningful separator ('.', '|') must not silently diverge."""
    return "\\Q" + sep.replace("\\E", "\\E\\\\E\\Q") + "\\E"


def badwords_hits(text_col: Column | str, blocklist: Sequence[str],
                  sep: str = " ") -> Column:
    """Occurrence count of blocklist terms among the tokens of ``text_col``.

    Exact whole-token matching (C4 matches words, not substrings — "class"
    must not hit on "ass"). The blocklist is inlined as a literal IN-set,
    evaluated inside codegen; ``hits == 0`` is the survivor predicate.
    """
    if not blocklist:
        raise ValueError("empty blocklist")
    toks = F.split(F.col(text_col) if isinstance(text_col, str) else text_col,
                   _literal_sep(sep))
    return F.aggregate(
        toks,
        F.lit(0),
        lambda acc, t: acc + F.when(t.isin(*blocklist), 1).otherwise(0),
    ).cast("bigint")


def chunk_lines(df: DataFrame, text_col: str = "text", width: int = 10,
                sep: str = " ") -> DataFrame:
    """Explode each document into fixed-width token "lines".

    Output: the input columns (minus ``text_col``) plus
    ``line_idx`` (0-based), ``line`` (space-joined), ``n_words``,
    ``last_tok``. Narrow (one generator, no shuffle); line reconstruction
    is pure array slicing — no groupBy-to-reassemble.
    """
    toks = F.split(F.col(text_col), _literal_sep(sep))
    n_lines = F.ceil(F.size(toks) / F.lit(width)).cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), n_lines - 1),
        lambda i: F.slice(toks, i * width + 1, width),
    )
    keep = [c for c in df.columns if c != text_col]
    return (
        df.select(*keep, F.posexplode(lines).alias("line_idx", "line_toks"))
        .select(
            *keep,
            F.col("line_idx").cast("bigint").alias("line_idx"),
            F.concat_ws(" ", "line_toks").alias("line"),
            F.size("line_toks").cast("bigint").alias("n_words"),
            F.element_at("line_toks", -1).alias("last_tok"),
        )
    )


def dedup_lines_keep_first(lines: DataFrame,
                           order_cols: Sequence[str] = ("doc_id", "line_idx"),
                           carry_cols: Sequence[str] = ("source",),
                           ) -> DataFrame:
    """Cross-document duplicate-line removal: one winner per distinct
    ``line`` text, first occurrence by ``order_cols`` (C4 keeps one copy).

    Returns one row per distinct line: ``order_cols`` + ``carry_cols`` of
    the winner. The shuffle key is ``md5(line)`` and the shuffled payload
    is ids only — the d1 hash-dedup machinery at line granularity.
    ``order_cols`` must be a unique key (doc_id, line_idx is), so the
    min_by winner is deterministic with no tie to break.
    """
    ordk = F.struct(*[F.col(c) for c in order_cols])
    payload = F.struct(*[F.col(c) for c in (*order_cols, *carry_cols)])
    w = (
        lines.select(F.md5("line").alias("_h"), payload.alias("_p"),
                     ordk.alias("_o"))
        .groupBy("_h")
        .agg(F.min_by("_p", "_o").alias("_w"))
    )
    return w.select(*[F.col(f"_w.{c}").alias(c)
                      for c in (*order_cols, *carry_cols)])
