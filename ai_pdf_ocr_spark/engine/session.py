"""SparkSession factory with scale-oriented defaults.

local[N] in this sandbox; the same config block is what we'd pass to
spark-submit on a real cluster (AQE on, Arrow batches sized for the
fused extraction stage, shuffle partitions matched to parallelism).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(app: str = "ai-pdf-ocr-spark", master: str | None = None,
                  shuffle_partitions: int | None = None,
                  arrow_batch: int = 4096) -> SparkSession:
    # arrow_batch=4096: measured sweet spot for the fused extraction
    # stage — 1024-row batches pay ~25% more per-batch JVM<->Arrow
    # overhead, 8k+ batches lose cache locality (exp on 192k-doc corpus)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = master[master.find("[") + 1:master.find("]")] if "[" in master else str(cpus)
        shuffle_partitions = cpus if n == "*" else int(n)
    builder = SparkSession.builder.appName(app).master(master)
    # shuffle spill on tmpfs: disk-backed /tmp serializes shuffle IO and
    # caps scaling; RAM-backed local dirs keep the exchange CPU-bound
    # (the cluster analog: NVMe/ram-disk shuffle volumes)
    shm = "/dev/shm/spark-local"
    try:
        os.makedirs(shm, exist_ok=True)
        builder = builder.config("spark.local.dir", shm)
    except OSError:
        pass
    return (
        builder
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
