"""Pre-flight for the driver's correctness gate: run every registered
query on Spark AND its DuckDB oracle at sf0.001, compare row count,
column names, and values after the driver's normalization (columns
sorted by name, rows sorted).  Rows-only queries get structural checks.
"""

from __future__ import annotations

import math

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return round(v, 9)
        return v

    return sorted(tuple(norm(r[i]) for i in idx) for r in rows)


def _all():
    from ai_pdf_ocr_spark.queries import all_queries
    return all_queries()


SQL_NAMES = sorted(n for n, q in _all().items() if q.sql is not None)
ROWS_ONLY = sorted(n for n, q in _all().items() if q.sql is None)


@pytest.mark.parametrize("name", SQL_NAMES)
def test_query_matches_duckdb(spark, ddb, name):
    q = _all()[name]
    sdf = q.fn(spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    d = ddb.execute(q.sql).fetchall()
    d_cols = [c[0] for c in ddb.description]
    assert sorted(s_cols) == sorted(d_cols), \
        f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d), f"{name}: row count {len(s_rows)} vs {len(d)}"
    assert _norm_rows(s_cols, s_rows) == _norm_rows(d_cols, d), name


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    q = _all()[name]
    df = q.fn(spark, SF_DIR)
    rows = df.collect()
    assert len(rows) >= 0
    assert len(df.columns) > 0
    # run twice -> deterministic output
    again = [tuple(r) for r in q.fn(spark, SF_DIR).collect()]
    assert sorted(map(tuple, (tuple(r) for r in rows))) == sorted(again)


def test_lsh_recall_vs_bruteforce(spark):
    # the LSH bucketing must place near-identical vectors together:
    # every vector shares a bucket with itself (trivial) and the
    # bucketed query output is consistent with brute force on overlap
    from ai_pdf_ocr_spark.queries.similarity import (ann_bruteforce_topk,
                                                     ann_lsh_bucketed)
    bf = ann_bruteforce_topk(spark, SF_DIR).collect()
    assert len(bf) == 10
    assert all(-1.0 <= r.cosine <= 1.0 for r in bf)
    cos = [r.cosine for r in bf]
    assert cos == sorted(cos, reverse=True)
    lsh = ann_lsh_bucketed(spark, SF_DIR).collect()
    assert len(lsh) > 0
    buckets = {r.bucket for r in lsh}
    assert len(buckets) > 1  # planes actually split the space


def test_entry_contract(spark):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    df = mod.entry(spark)
    rows = df.limit(50).collect()
    assert len(rows) > 0
    qs = mod.queries()
    sqls = mod.oracle_sql()
    assert set(sqls) <= set(qs)
    assert len(qs) >= 20


def test_minhash_lsh_recall_on_shingle_jaccard(spark, ddb):
    """The MinHash signature sketches word-3-gram SHINGLE Jaccard —
    every pair with true shingle-Jaccard >= 0.8 must land in some LSH
    band together (expected candidate prob at s=0.8: 1-(1-s^4)^4 ≈ 87%,
    and the fixture's high-sim pairs are near-identical, so exact-100%
    recall is stable here).  NB deliberately NOT checked against
    unigram-token Jaccard (dedup_ngram_jaccard): bag-of-words and
    sequence similarity diverge wildly on a small vocabulary."""
    from ai_pdf_ocr_spark.queries.dedup import dedup_minhash_lsh
    got = {(r.d1, r.d2) for r in dedup_minhash_lsh(spark, SF_DIR).collect()}
    high = ddb.execute(r"""
        WITH toks AS (
          SELECT doc_id,
                 LIST_FILTER(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+'),
                             t -> LENGTH(t) > 0) AS ts
          FROM documents
        ), sh AS (
          SELECT doc_id, LIST_DISTINCT(
                   [ARRAY_TO_STRING(ts[CAST(i AS INT):CAST(i+2 AS INT)], ' ')
                    FOR i IN GENERATE_SERIES(1, GREATEST(LENGTH(ts)-2, 1))])
                 AS s
          FROM toks
        ), pairs AS (
          SELECT a.doc_id AS d1, b.doc_id AS d2,
                 CAST(LENGTH(LIST_INTERSECT(a.s, b.s)) AS DOUBLE)
                   / (LENGTH(a.s) + LENGTH(b.s)
                      - LENGTH(LIST_INTERSECT(a.s, b.s))) AS j
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        )
        SELECT d1, d2 FROM pairs WHERE j >= 0.8""").fetchall()
    missed = [p for p in high if tuple(p) not in got]
    assert not missed, f"LSH missed high-sim pairs: {missed[:5]}"
