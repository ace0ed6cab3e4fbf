"""Unit tests for the data-QA operators: A20 Misra-Gries heavy hitters,
D41 contamination spans, D42 anomaly z-scores, D43 k-anonymity."""

from __future__ import annotations

from pyspark.sql import functions as F

from lime_on_spark_spark.plans.registry import queries


def test_mg_candidates_are_superset_of_true_heavy_hitters(spark, sf_dir):
    """MG soundness: every token the exact rescan keeps must also appear in
    the final output, and rates must sum to <= 1."""
    out = queries()["a20_heavy_hitters"](spark, sf_dir).collect()
    assert len(out) > 0
    total_rate = sum(r["rate"] for r in out)
    assert 0 < total_rate <= 1.0 + 1e-6
    for r in out:
        assert r["rate"] >= 1.0 / 30 - 1e-3  # phi threshold honored


def test_contamination_spans_exceed_single_hits(spark, sf_dir):
    """A run of R matched shingle positions spans R+2 tokens, so every
    reported max span is >= 3; benchmark docs themselves never appear."""
    out = queries()["d41_contamination_spans"](spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        assert r["max_span_tokens"] >= 3
        assert r["n_long_span"] <= r["n_docs_hit"]


def test_anomaly_zscores_are_extreme_only(spark, sf_dir):
    out = queries()["d42_event_anomaly"](spark, sf_dir).collect()
    for r in out:
        assert abs(r["z"]) >= 1.5
        assert r["cnt"] > 0


def test_k_anonymity_partitions_all_rows(spark, sf_dir):
    from lime_on_spark_spark.sources.catalog import load_table

    out = {r["status"]: r for r in queries()["d43_k_anonymity"](spark, sf_dir).collect()}
    n_cust = load_table(spark, sf_dir, "customer").count()
    assert sum(r["n_rows"] for r in out.values()) == n_cust
    if "released" in out:
        # Released cells each hold >= 5 rows by definition.
        assert out["released"]["n_rows"] >= 5 * out["released"]["n_cells"]
    if "suppressed" in out:
        assert out["suppressed"]["n_rows"] < 5 * out["suppressed"]["n_cells"]


def test_cross_doc_spans_finds_planted_span(spark, tmp_path):
    """d84 on a planted corpus: two docs sharing an exact 9-token span (and
    nothing else long) must surface as a pair with span_tokens = 9; docs
    sharing only a 7-token span are below the w + k - 1 = 8 contract and
    must not appear."""
    from lime_on_spark_spark.plans.textpipe import d84_cross_doc_spans

    span9 = "alpha bravo charlie delta echo foxtrot golf hotel india"
    span7 = "one two three four five six seven"
    docs = [
        (1, f"xx yy {span9} zz qq", "en", "src0", 0),
        (2, f"aa {span9} bb cc dd", "en", "src1", 0),
        (3, f"pp {span7} rr", "en", "src0", 0),
        (4, f"ss {span7} tt", "en", "src1", 0),
        (5, "totally unrelated words with no overlap at all here", "en", "src2", 0),
    ]
    spark.createDataFrame(
        docs,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    rows = d84_cross_doc_spans(spark, str(tmp_path)).collect()
    assert [(r["doc_a"], r["doc_b"], r["span_tokens"]) for r in rows] == [(1, 2, 9)]
    assert rows[0]["n_pairs"] == 1 and rows[0]["n_affected_docs"] == 2


def test_span_removal_merges_overlapping_intervals(spark, tmp_path):
    """d87 on a planted corpus exercising the interval-union merge: doc 3
    shares w1..w10 with doc 1 and w7..w16 with doc 2 — overlapping runs in
    doc 3, so its removal must be the 16-token UNION, not the 20-token sum.
    Doc 5 shares a plain 9-token span with doc 4 (no overlap case). Docs 1,
    2, 4 are the earlier side of every pair and keep all their tokens."""
    from lime_on_spark_spark.plans.textpipe import d87_span_removal

    w = [f"w{i}" for i in range(1, 17)]
    span9 = "alpha bravo charlie delta echo foxtrot golf hotel india"
    docs = [
        (1, "aa1 " + " ".join(w[:10]) + " aa2", "en", "src0", 0),
        (2, "bb1 " + " ".join(w[6:]) + " bb2", "en", "src0", 0),
        (3, "cc1 " + " ".join(w) + " cc2", "en", "src1", 0),
        (4, f"dd1 {span9} dd2", "en", "src0", 0),
        (5, f"ee1 ee2 {span9} ee3", "en", "src1", 0),
        (6, "totally unrelated words with no overlap at all here", "en", "src2", 0),
    ]
    spark.createDataFrame(
        docs,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    rows = d87_span_removal(spark, str(tmp_path)).collect()
    got = [
        (r["doc_id"], r["n_tokens"], r["removed_tokens"], r["kept_tokens"])
        for r in rows
    ]
    assert got == [(3, 18, 16, 2), (5, 12, 9, 3)]
    assert rows[0]["n_docs_trimmed"] == 2 and rows[0]["total_removed"] == 25


def test_unicode_normalize_planted_fixtures(spark, tmp_path):
    """d85 on planted non-NFC docs: a decomposed-accent doc (e + U+0301)
    and a zero-width-space-infested doc must each normalize to equal an
    existing NFC doc, so docs_changed and dedup_delta are nonzero — and the
    Spark (unicodedata NFC) result must match DuckDB's nfc_normalize
    oracle on the same fixtures, proving the two engines' NFC agree off
    the ASCII happy path."""
    import duckdb

    from lime_on_spark_spark.plans.registry import oracle_sql
    from lime_on_spark_spark.plans.textpipe import d85_unicode_normalize
    from tests.compare import canon_frame

    docs = [
        (1, "café au lait", "fr", "src0", 0),          # NFC é
        (2, "café au lait", "fr", "src1", 0),         # decomposed e + ́
        (3, "hello​ world﻿", "en", "src0", 0),    # ZWSP + BOM
        (4, "hello world", "en", "src1", 0),
        (5, "plain ascii text", "en", "src2", 0),
    ]
    path = tmp_path / "documents.parquet"
    spark.createDataFrame(
        docs,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(str(path))

    out = {r["lang"]: r for r in d85_unicode_normalize(spark, str(tmp_path)).collect()}
    assert out["fr"]["docs_changed"] == 1 and out["fr"]["dedup_delta"] == 1
    assert out["en"]["docs_changed"] == 1 and out["en"]["dedup_delta"] == 1
    assert out["fr"]["dups_before"] == 0 and out["fr"]["dups_after"] == 1

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{path}/*.parquet'"
    )
    oracle = canon_frame(con.execute(oracle_sql()["d85_unicode_normalize"]).df())
    mine = canon_frame(
        d85_unicode_normalize(spark, str(tmp_path)).toPandas()
    )
    assert oracle == mine


def test_markup_extraction_fixture_deltas(spark, tmp_path):
    """d89 on a minimal corpus: the planted HTML fixtures must show a
    NONZERO extraction delta (markup + boilerplate removed) with the
    link-density rule keeping content and dropping nav/footer/link-list
    blocks — and the Arrow-stage result must hash-match the DuckDB
    regexp-chain oracle on the same corpus."""
    import duckdb

    from lime_on_spark_spark.plans.registry import oracle_sql
    from lime_on_spark_spark.plans.textpipe import (
        _D89_FIXTURES,
        d89_markup_extraction,
    )
    from tests.compare import canon_frame

    docs = [(1, "plain spark words only", "en", "src0", 22)]
    path = tmp_path / "documents.parquet"
    spark.createDataFrame(
        docs,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(str(path))

    out = {r["source"]: r for r in d89_markup_extraction(spark, str(tmp_path)).collect()}
    fx = out["html_fixture"]
    assert fx["n_docs"] == len(_D89_FIXTURES)
    assert fx["docs_with_markup"] == len(_D89_FIXTURES)
    # Nonzero extraction delta: tags + script/style/title + link-dense
    # boilerplate blocks are gone, but real content survives.
    assert 0 < fx["chars_extracted"] < fx["chars_raw"]
    assert fx["chars_removed"] == fx["chars_raw"] - fx["chars_extracted"]
    # The markup-free doc passes through exactly (no-op contract).
    assert out["src0"]["chars_extracted"] == out["src0"]["chars_raw"] == 22
    assert out["src0"]["chars_removed"] == 0 and out["src0"]["docs_with_markup"] == 0

    # Rule-level checks on one nav+content+footer fixture: the kept text
    # is the content paragraph only.
    import re

    nav_doc = next(t for d, s, t in _D89_FIXTURES if d == -1)
    assert "Home" in nav_doc and "discusses shuffle partitions" in nav_doc
    # Expected extracted length for doc -1, computed independently here:
    content = re.search(r"<p>([^<]*)</p>", nav_doc).group(1)
    per_fixture = {
        d: t for d, s, t in _D89_FIXTURES
    }
    # doc -1's only surviving block is the <p> content — reuse the plan's
    # own pipeline via a tiny one-doc corpus write.
    docs2 = [(99, per_fixture[-1], "en", "fx_only", len(per_fixture[-1]))]
    path2 = tmp_path / "d2" / "documents.parquet"
    spark.createDataFrame(
        docs2,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(str(path2))
    out2 = {
        r["source"]: r
        for r in d89_markup_extraction(spark, str(tmp_path / "d2")).collect()
    }
    assert out2["fx_only"]["chars_extracted"] == len(content)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{path}/*.parquet'")
    oracle = canon_frame(con.execute(oracle_sql()["d89_markup_extraction"]).df())
    mine = canon_frame(d89_markup_extraction(spark, str(tmp_path)).toPandas())
    assert oracle == mine
