"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship extraction pipeline on synthetic
interleaved documents at sf0.001 scale; ``queries()``/``oracle_sql()``
expose every implemented operator (SURVEY.md §2 + the training-data
pipeline layer) with DuckDB oracles where SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query at sf0.001; driver checks rows>0 + stable schema."""
    from ai_pdf_ocr_spark.flagship import extract_spans
    return extract_spans(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ai_pdf_ocr_spark.queries import all_queries
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    from ai_pdf_ocr_spark.queries import all_queries
    return {name: q.sql for name, q in all_queries().items()
            if q.sql is not None}
