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
