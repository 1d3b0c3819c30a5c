"""Query registry: every SURVEY.md §2 operator exposed as a
(spark_fn, oracle_sql) pair for the driver's DuckDB correctness gate.

Conventions (driver contract, __spark_entry__.py):
 - every computed column is aliased identically on both sides;
 - float aggregates are ROUNDed on both sides (the value-hash compare
   is exact, and Spark/DuckDB summation orders differ);
 - DuckDB integer sums are CAST to BIGINT to match Spark's LongType;
 - no raw timestamp output columns (cast to string when needed).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Q:
    fn: Callable[[SparkSession, str], DataFrame]
    sql: Optional[str]


REGISTRY: dict[str, Q] = {}


def register(name: str, sql: str | None = None):
    def deco(fn):
        REGISTRY[name] = Q(fn, sql)
        return fn
    return deco


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _fixture_dir() -> str:
    # repo-root fixtures/ when running from a checkout; the shipped
    # --py-files zip has no fixtures (oracles run driver-side only)
    import os
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    cand = os.path.join(root, "fixtures", "expected")
    return cand if os.path.isdir(cand) else "/root/repo/fixtures/expected"


FIXTURE_DIR = _fixture_dir()


def fixture_sql(name: str) -> str:
    """DuckDB oracle for operators whose expected output is materialized
    by an independent pure-Python implementation (gen_fixtures.py +
    tests/oracle_sketches.py — DuckDB has no xxhash64 and cannot express
    the greedy layout kernel).  Fixtures carry rows for every SF, tagged
    with ``_corpus`` = SUM(n_chars) of that SF's ``documents`` table, so
    ONE static SQL string dispatches to the right slice whether the gate
    runs at sf0.001 or sf0.01."""
    return (f"SELECT * EXCLUDE (_corpus) "
            f"FROM read_parquet('{FIXTURE_DIR}/{name}.parquet') "
            f"WHERE _corpus = (SELECT SUM(n_chars) FROM documents)")


def all_queries() -> dict[str, Q]:
    # import side-effect registration
    from . import (corpus_ops, dedup, multimodal, relational,  # noqa: F401
                   similarity, text_analysis)
    from .. import flagship  # noqa: F401
    return dict(REGISTRY)
