"""Structured Streaming ingestion: continuous file-arrival extraction.

The batch engine (checkpoint.py) owns run-level resume; this module
covers the other operational mode a 100 TB pipeline needs — documents
LANDING continuously.  ``spark.readStream`` over the input directory
gives exactly-once FILE tracking via the streaming engine's own
checkpoint (processed files are never re-read after a restart), and
each micro-batch runs the same fused Arrow extraction with the same
skew-aware weighted repartition as the batch path.

Idempotent epoch replay: extracted output is written with dynamic
partition overwrite under ``(epoch, bin)`` — if a crash interrupts an
epoch, the streaming engine replays that epoch from its file manifest
and the rewrite replaces exactly the partitions the failed attempt
half-wrote.  Per-(epoch, bin) lineage + span-count metric rows land in
the shared checkpoint table with run_id "<run_id>-e<epoch>", so the
monitoring surface is identical to batch runs.

(The reference is single-machine batch CLI only — this surface is a
round-2 addition from the north_rule's pipeline framing, not a ported
behavior.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..kernel.extract import KERNEL_VERSION
from . import schemas
from .io import TableStore
from .partitioning import (DEFAULT_BUCKETS, assign_bins, compute_assignment,
                           mapping_df, with_bin)
from .pipeline import extract_documents

STREAM_TABLE = "documents_extracted_stream"


def _process_epoch(spark: SparkSession, store: TableStore, run_id: str,
                   num_partitions: int, buckets: int,
                   batch_df: DataFrame, epoch_id: int) -> bool:
    if not batch_df.take(1):
        return False
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    assignment = compute_assignment(batch_df, num_partitions, buckets)
    binned = assign_bins(batch_df, num_partitions, buckets,
                         assignment=assignment)
    part = (binned.repartition(num_partitions, "rep")
            .sortWithinPartitions("doc_id"))
    extracted = with_bin(extract_documents(part),
                         mapping_df(spark, assignment, num_partitions),
                         buckets).drop("rep")
    out = extracted.withColumn("epoch", F.lit(int(epoch_id)))
    (out.write.mode("overwrite").partitionBy("epoch", "bin")
        .parquet(store.path(STREAM_TABLE)))
    # lineage from the COMMITTED files (same discipline as batch).
    # Idempotent under epoch replay: the append-only checkpoint table
    # cannot rewrite rows, so a replayed epoch (same stream-checkpoint
    # dir -> same epoch_id, regardless of the caller's run_id) SKIPS
    # the lineage append if any '-e<epoch>' rows already exist — the
    # data rewrite above already replaced the half-written partitions.
    existing = (store.read_checkpoint()
                .where(F.col("run_id").endswith(f"-e{int(epoch_id)}"))
                .take(1))
    if existing:
        return True
    committed = (spark.read.parquet(store.path(STREAM_TABLE))
                 .where(F.col("epoch") == int(epoch_id)))
    rows = (committed.groupBy("bin")
            .agg(F.min("doc_id").alias("doc_id_min"),
                 F.max("doc_id").alias("doc_id_max"),
                 F.count("*").alias("doc_count"),
                 F.sum("span_count_in").alias("span_count_in"),
                 F.sum("span_count_out").alias("span_count_out"),
                 F.sum("dedup_removed").alias("dedup_removed"))
            .withColumn("run_id", F.lit(f"{run_id}-e{int(epoch_id)}"))
            .withColumn("kernel_version", F.lit(KERNEL_VERSION))
            .withColumn("wall_time_s", F.lit(0.0))
            .withColumn("status", F.lit("done"))
            .select("run_id", "bin", "doc_id_min", "doc_id_max",
                    "doc_count", "span_count_in", "span_count_out",
                    "dedup_removed", "kernel_version", "wall_time_s",
                    "status"))
    store.append_checkpoint(rows)
    return True


def stream_extract(spark: SparkSession, input_path: str, store: TableStore,
                   run_id: str, num_partitions: int,
                   buckets: int = DEFAULT_BUCKETS) -> dict:
    """Process every file currently available in ``input_path`` that
    the stream checkpoint has not seen, then stop (availableNow
    trigger — the cron-able drain mode; drop the trigger for a
    long-running continuous job).  Returns {"epochs_run": n}."""
    seen = {"n": 0}

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        if _process_epoch(spark, store, run_id, num_partitions, buckets,
                          batch_df, epoch_id):
            seen["n"] += 1  # only epochs that actually produced output

    stream = (spark.readStream.schema(schemas.DOCUMENTS)
              .parquet(input_path))
    q = (stream.writeStream.foreachBatch(process)
         .option("checkpointLocation", store.path("stream_checkpoint"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return {"epochs_run": seen["n"]}


def read_stream_extracted(spark: SparkSession, store: TableStore) -> DataFrame:
    return spark.read.parquet(store.path(STREAM_TABLE))
