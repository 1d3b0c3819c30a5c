"""Degenerate-input behavior: empty tables and null text must not
crash any registered documents/embeddings operator (a 100 TB pipeline
WILL meet empty partitions, null payloads, and zero-row shards)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

DOC_QUERIES = [
    "dedup_exact", "dedup_ngram_jaccard", "dedup_jaccard_verified",
    "dedup_minhash_lsh", "dedup_simhash", "dedup_simhash_pairs",
    "dedup_cluster_resolve", "sample_hash_split",
    "decontaminate_ngram_overlap", "text_token_count",
    "text_quality_score", "text_langid_heuristic",
    "dedup_duplicate_spans",
]


def _write_docs(path, rows):
    pq.write_table(pa.table(
        {"doc_id": pa.array([r[0] for r in rows], pa.int64()),
         "text": pa.array([r[1] for r in rows], pa.string()),
         "lang": pa.array([r[2] for r in rows], pa.string()),
         "source": pa.array(["synth"] * len(rows), pa.string()),
         "n_chars": pa.array(
             [len(r[1] or "") for r in rows], pa.int64())}),
        str(path))


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_sf")
    _write_docs(d / "documents.parquet", [])
    return str(d)


@pytest.fixture(scope="module")
def nulls_sf(tmp_path_factory):
    d = tmp_path_factory.mktemp("nulls_sf")
    _write_docs(d / "documents.parquet", [
        (1, None, "en"), (2, "", "en"), (3, "   ", "de"),
        (4, "real text here", "en"), (5, "real text here", "en"),
    ])
    return str(d)


@pytest.mark.parametrize("name", DOC_QUERIES)
def test_runs_on_empty_documents(spark, empty_sf, name):
    from ai_pdf_ocr_spark.queries import all_queries
    rows = all_queries()[name].fn(spark, empty_sf).collect()
    assert rows == [] or all(r is not None for r in rows)


@pytest.mark.parametrize("name", DOC_QUERIES)
def test_runs_on_null_and_blank_text(spark, nulls_sf, name):
    from ai_pdf_ocr_spark.queries import all_queries
    rows = all_queries()[name].fn(spark, nulls_sf).collect()
    assert rows is not None  # no crash; content checked where meaningful


def test_null_text_semantics(spark, nulls_sf):
    """Docs 4/5 are identical AND docs 2/3 both normalize to "" -> two
    exact-dup groups; the null/blank docs are absent from token-based
    pairing (no tokens -> no signature)."""
    from ai_pdf_ocr_spark.queries import all_queries
    qs = all_queries()
    ex = qs["dedup_exact"].fn(spark, nulls_sf).collect()[0]
    assert ex.n_groups == 2 and ex.n_redundant == 2
    pairs = {(r.d1, r.d2)
             for r in qs["dedup_ngram_jaccard"].fn(spark, nulls_sf).collect()}
    assert pairs == {(4, 5)}
    clusters = {r.doc_id: (r.cluster_id, r.keep) for r in
                qs["dedup_cluster_resolve"].fn(spark, nulls_sf).collect()}
    assert clusters[4] == (4, True) and clusters[5] == (4, False)
    assert clusters[1] == (1, True)  # null-text doc is its own cluster
