"""Checkpointed, resumable extraction runs.

Mirrors the reference's checkpoint-exists short-circuit
(``/root/reference/main.py:368-398``: JSON checkpoint written at
``:418``, resume skips OCR at ``:429-430``) at partition granularity:

 - bins are a deterministic pure function of (corpus, P, buckets)
   (see partitioning.py), so a rerun reproduces identical bins;
 - extracted output is written with dynamic partition overwrite, so a
   partially-written bin from a killed run is cleanly replaced;
 - a checkpoint row (lineage + span-count metrics, FIXTURES.md §3) is
   appended per bin only after the data write committed — resume skips
   exactly the bins with a 'done' row (anti-join semantics, J4).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..kernel.extract import KERNEL_VERSION
from .io import TableStore
from .partitioning import (DEFAULT_BUCKETS, assign_bins, compute_assignment,
                           mapping_df, with_bin)
from .pipeline import extract_documents


def run_extraction(spark: SparkSession, documents: DataFrame,
                   store: TableStore, run_id: str,
                   num_partitions: int,
                   buckets: int = DEFAULT_BUCKETS,
                   _bin_filter: set[int] | None = None) -> dict:
    """Run (or resume) one extraction job; returns a summary dict.

    ``_bin_filter`` restricts processing to the given bins — used by the
    kill-and-rerun tests to simulate a job that died mid-corpus."""
    t0 = time.monotonic()

    # deterministic bins MUST be derived from the full corpus (resume
    # filtering happens after) so reruns reproduce identical layout
    assignment = compute_assignment(documents, num_partitions, buckets)
    binned = assign_bins(documents, num_partitions, buckets,
                         assignment=assignment)

    ckpt = store.read_checkpoint()
    done = {
        r.bin for r in
        ckpt.where((F.col("run_id") == run_id) & (F.col("status") == "done"))
        .select("bin").distinct().collect()
    }

    todo = binned
    if done:
        todo = todo.where(~F.col("bin").isin(*done))
    if _bin_filter is not None:
        todo = todo.where(F.col("bin").isin(*_bin_filter))

    target_bins = sorted(
        (set(range(num_partitions)) - done)
        & (_bin_filter if _bin_filter is not None
           else set(range(num_partitions))))
    if not target_bins:
        return {"run_id": run_id, "bins_done_prior": sorted(done),
                "bins_processed": [], "docs_processed": 0,
                "wall_time_s": time.monotonic() - t0}

    part = (todo.repartition(num_partitions, "rep")
            .sortWithinPartitions("doc_id"))
    # re-derive bin from doc_id after the UDF via the same broadcast
    # mapping table (avoids threading bin through the Arrow stage)
    extracted = with_bin(extract_documents(part),
                         mapping_df(spark, assignment, num_partitions),
                         buckets).drop("rep")

    store.write_extracted(extracted, mode="overwrite")
    wall = time.monotonic() - t0

    # lineage + metrics per bin, derived from the committed output
    new = (
        store.read_extracted()
        .where(F.col("bin").isin(*target_bins))
        .groupBy("bin")
        .agg(F.min("doc_id").alias("doc_id_min"),
             F.max("doc_id").alias("doc_id_max"),
             F.count("*").alias("doc_count"),
             F.sum("span_count_in").alias("span_count_in"),
             F.sum("span_count_out").alias("span_count_out"),
             F.sum("dedup_removed").alias("dedup_removed"))
        .withColumn("run_id", F.lit(run_id))
        .withColumn("kernel_version", F.lit(KERNEL_VERSION))
        .withColumn("wall_time_s", F.lit(float(wall)))
        .withColumn("status", F.lit("done"))
        .select("run_id", "bin", "doc_id_min", "doc_id_max", "doc_count",
                "span_count_in", "span_count_out", "dedup_removed",
                "kernel_version", "wall_time_s", "status")
    )
    rows = new.collect()
    docs_processed = sum(r.doc_count for r in rows)
    # bins that received zero docs still get a 'done' row so resume
    # never retargets them
    empty_bins = set(target_bins) - {r.bin for r in rows}
    if empty_bins:
        zeros = spark.createDataFrame(
            [(run_id, b, None, None, 0, 0, 0, 0, KERNEL_VERSION,
              float(wall), "done") for b in sorted(empty_bins)],
            schema=new.schema)
        new = new.unionByName(zeros)
    store.append_checkpoint(new)
    return {"run_id": run_id, "bins_done_prior": sorted(done),
            "bins_processed": target_bins,
            "docs_processed": docs_processed, "wall_time_s": wall}
