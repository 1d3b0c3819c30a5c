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


def _fixture_root() -> str:
    # repo-root fixtures/ when running from a checkout; the shipped
    # --py-files zip has no fixtures (oracles run driver-side only)
    import os
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    cand = os.path.join(root, "fixtures")
    return cand if os.path.isdir(cand) else "/root/repo/fixtures"


# expected/: oracle EXPECTED OUTPUTS (driver-side DuckDB only).
# inputs/: small INPUT dimension tables the testdata does not ship
# (media_assets) — a deployment would host these beside the corpus;
# keeping them under a separate dir makes the input-vs-expected split
# explicit (code-review r2).
FIXTURE_DIR = _fixture_root() + "/expected"
INPUT_DIR = _fixture_root() + "/inputs"


def fixture_sql(name: str) -> str:
    """DuckDB oracle for operators whose expected output is materialized
    by an independent pure-Python implementation (gen_fixtures.py +
    tests/oracle_sketches.py — DuckDB has no xxhash64 and cannot express
    the greedy layout kernel).  Fixtures carry one slice per SF, tagged
    with ``_corpus`` = SUM(n_chars) of that SF's ``documents`` table, so
    ONE static SQL string dispatches to the right slice at whatever SF
    the gate runs.  An unknown marker (corpus the fixture was never
    baked for) raises via DuckDB error() instead of silently comparing
    against an empty slice (code-review r2)."""
    f = f"read_parquet('{FIXTURE_DIR}/{name}.parquet')"
    return (
        f"SELECT * EXCLUDE (_corpus) FROM {f} WHERE _corpus = "
        f"(SELECT CASE WHEN EXISTS (SELECT 1 FROM {f} x "
        f"WHERE x._corpus = m.v) THEN m.v ELSE "
        f"error('fixture {name} has no slice for this corpus marker — "
        f"rerun gen_fixtures.py') END "
        f"FROM (SELECT SUM(n_chars) AS v FROM documents) m)")


def all_queries() -> dict[str, Q]:
    # import side-effect registration
    from . import (corpus_ops, curation, dedup, multimodal,  # noqa: F401
                   relational, similarity, text_analysis)
    from .. import flagship  # noqa: F401
    return dict(REGISTRY)
