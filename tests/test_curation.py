"""Semantic + plan tests for the curation operators (round 3):
repetition stats, domain-mixture sampling, shard shuffle, PII scrub.
Oracle parity at sf0.001 is covered by tests/test_queries.py's
parametrized gate preflight; these tests pin the semantics the SQL
twin alone can't demonstrate (multi-line text, planted PII, shard
permutation invariants) and the plan shapes PLANS.md claims.
"""

from __future__ import annotations

import re

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, lang, "srcT", len(t)) for i, (t, lang) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")


def _write_docs(spark, tmp_path, rows):
    d = tmp_path / "docs"
    _docs(spark, rows).write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_repetition_flags_boilerplate(spark, tmp_path):
    """A spam doc (one token repeated) and a dup-line doc are flagged /
    measured; a normal doc is not."""
    from ai_pdf_ocr_spark.queries.curation import text_repetition_stats
    sf = _write_docs(spark, tmp_path, [
        ("spam spam spam spam", "xx"),            # top_bigram_frac 1.0
        ("alpha beta\ngamma delta\nalpha beta\nepsilon zeta", "yy"),
        ("one two three four five six", "zz"),    # clean
    ])
    out = {r["lang"]: r for r in text_repetition_stats(spark, sf).collect()}
    assert out["xx"]["n_flagged"] == 1
    assert out["xx"]["avg_dup_token_frac"] == 0.75   # (4-1)/4
    assert out["xx"]["avg_top_bigram_frac"] == 1.0   # 3/3
    # 4 lines, 3 distinct -> (4-3)/4
    assert out["yy"]["avg_dup_line_frac"] == 0.25
    assert out["zz"]["n_flagged"] == 0
    assert out["zz"]["avg_dup_token_frac"] == 0.0


def test_pii_scrub_redacts_and_counts(spark):
    """Every planted PII form is replaced by its placeholder and
    counted; no raw email/IP survives."""
    from ai_pdf_ocr_spark.queries.curation import text_pii_scrub
    rows = text_pii_scrub(spark, SF_DIR).collect()
    assert rows, "doc_id<50 slice empty?"
    for r in rows:
        assert "<EMAIL>" in r["scrubbed"]
        assert "<PHONE>" in r["scrubbed"]
        assert "<IP>" in r["scrubbed"]
        assert "@example.com" not in r["scrubbed"]
        assert "10.0." not in r["scrubbed"]
        assert r["n_email"] >= 1 and r["n_phone"] >= 1 and r["n_ip"] >= 1


def test_mixture_rates_and_determinism(spark):
    """Thresholds are capped at 1e6, selection is a subset of each
    lang's docs, and membership is rerun-stable (hash, not RNG)."""
    from ai_pdf_ocr_spark.queries.curation import sample_domain_mixture
    a = sorted(map(tuple, sample_domain_mixture(spark, SF_DIR).collect()))
    b = sorted(map(tuple, sample_domain_mixture(spark, SF_DIR).collect()))
    assert a == b
    for lang, n_sel, sel_tok, thr, tot in a:
        assert 0 < thr <= 1_000_000
        assert 0 <= sel_tok <= tot
    # a lang at rate<1 must not select everything (budget is half the
    # corpus, so at least one lang is down-sampled)
    assert any(thr < 1_000_000 for _, _, _, thr, _ in a)


def test_shard_shuffle_is_permutation(spark):
    """Every doc appears exactly once; positions are 1..n contiguous
    per shard; assignment is deterministic."""
    from ai_pdf_ocr_spark.queries.curation import shard_global_shuffle
    rows = shard_global_shuffle(spark, SF_DIR).collect()
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert len(rows) == n_docs
    assert len({r["doc_id"] for r in rows}) == n_docs
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
    rows2 = shard_global_shuffle(spark, SF_DIR).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


def _executed_plan(df) -> str:
    df.count()
    return df._jdf.queryExecution().executedPlan().toString()


def test_pii_scrub_zero_shuffle(spark):
    """The scrub is a pure projection: no Exchange, no UDF (the final
    orderBy is the bounded doc_id<50 presentation sort — allow its
    rangepartitioning only)."""
    from ai_pdf_ocr_spark.queries.curation import text_pii_scrub
    plan = _executed_plan(text_pii_scrub(spark, SF_DIR))
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 0, \
        plan[:2000]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_shard_shuffle_single_exchange(spark):
    """One hash Exchange (the shard key) and nothing else — the
    operator's scale contract."""
    from ai_pdf_ocr_spark.queries.curation import shard_global_shuffle
    plan = _executed_plan(shard_global_shuffle(spark, SF_DIR))
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, \
        plan[:2000]
    assert "Exchange rangepartitioning" not in plan
    assert "Exchange SinglePartition" not in plan


def test_top_ngrams_is_top_n_not_global_sort(spark):
    """Corpus top-N must compile to TakeOrderedAndProject (per-partition
    top-N), never a global sort or single-partition window."""
    from ai_pdf_ocr_spark.queries.curation import corpus_top_ngrams
    plan = _executed_plan(corpus_top_ngrams(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    assert "Exchange rangepartitioning" not in plan
    assert "Exchange SinglePartition" not in plan


def test_mixture_fact_side_never_hash_shuffles(spark):
    """The corpus side joins the tiny per-lang threshold table via
    BROADCAST; the only hash Exchanges are the tiny aggregates'
    (bounded by |langs|), never a repartition of doc rows for a join."""
    from ai_pdf_ocr_spark.queries.curation import sample_domain_mixture
    plan = _executed_plan(sample_domain_mixture(spark, SF_DIR))
    assert len(re.findall(r"BroadcastHashJoin", plan)) >= 2, plan[:2000]
    assert "SortMergeJoin" not in plan
