"""SparkSession factory with scale-appropriate defaults.

Defaults target the 100TB design point (AQE on, skew-join handling on,
Arrow-batched Python UDFs, bounded Arrow batch sizes so the O(L^2) selection
heads can't blow executor memory) while staying correct on local[N].
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Arrow batch sizing: the [L,L,R] score cubes of the mhs/biaffine heads are
# allocated per-row INSIDE the UDF (never batch-wide), so the batch only
# holds input texts + output triple lists. Large batches amortize the
# JVM<->Python Arrow round-trip, which measurement showed dominating at the
# default 10k/256 granularity (~4.7x wall-clock on the extraction stage).
DEFAULT_ARROW_BATCH = 4096


def get_spark(
    app_name: str = "nlp-series-re-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER")
    if master is None:
        # under spark-submit, spark.master is already set — do NOT override
        # it (a hardcoded local[*] default would silently pull a cluster
        # launch back onto the driver); fall back to local only when no
        # master is configured anywhere
        from pyspark import SparkConf

        if not SparkConf().contains("spark.master"):
            master = "local[%s]" % os.environ.get("SPARK_GRAFT_CPUS", "*")
    cores = os.cpu_count() or 8
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(max(cores, 8)))
        )
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    builder = (
        builder
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(DEFAULT_ARROW_BATCH),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # Python worker reuse: the per-process encoder singleton survives
        # across tasks, like the reference's per-worker model instance.
        .config("spark.python.worker.reuse", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
