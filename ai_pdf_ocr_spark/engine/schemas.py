"""Fixed Spark schemas (SURVEY.md §1.3: fixed StructType, lenient
defaults applied in the decode stage, not the schema)."""

from __future__ import annotations

from pyspark.sql import types as T

RAW_SPAN = T.StructType([
    T.StructField("kind", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("media_ref", T.StringType()),
    T.StructField("offset", T.IntegerType()),
])

DOCUMENTS = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("spans", T.ArrayType(RAW_SPAN)),
])

OUT_SPAN = T.StructType([
    T.StructField("kind", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("media_ref", T.StringType()),
    T.StructField("order", T.IntegerType()),
])

EXTRACTED = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("spans", T.ArrayType(OUT_SPAN)),
    T.StructField("span_count_in", T.LongType()),
    T.StructField("span_count_out", T.LongType()),
    T.StructField("malformed", T.LongType()),
    T.StructField("merged_away", T.LongType()),
    T.StructField("dedup_removed", T.LongType()),
    T.StructField("filtered", T.LongType()),
])

CHECKPOINT = T.StructType([
    T.StructField("run_id", T.StringType(), False),
    T.StructField("bin", T.IntegerType(), False),
    T.StructField("doc_id_min", T.StringType()),
    T.StructField("doc_id_max", T.StringType()),
    T.StructField("doc_count", T.LongType()),
    T.StructField("span_count_in", T.LongType()),
    T.StructField("span_count_out", T.LongType()),
    T.StructField("dedup_removed", T.LongType()),
    T.StructField("kernel_version", T.StringType()),
    T.StructField("wall_time_s", T.DoubleType()),
    T.StructField("status", T.StringType()),
])
