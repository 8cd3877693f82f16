"""Parallelism guard for small-split inputs.

A table that arrives as fewer splits than the session has cores serializes
everything before its first shuffle — scans, explodes, and Arrow UDF
stages all run on the handful of input partitions Spark derived from file
layout. At production scale the input has thousands of splits and this is
a no-op; at small scale (one parquet file = one row group = ONE split —
measured: the whole audio synthesis stage ran on a single core) the
round-robin repartition is cheap insurance: the rows being spread are the
NARROW pre-explosion side (text, not payloads).

Used at the entry of explode- or UDF-heavy chains (media/audio synthesis,
bigram-LM passes, shingling); results are partitioning-invariant, which
the operators' oracle cross-checks verify on every run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Round-robin ``df`` up to the session's default parallelism if it
    has fewer partitions; no-op otherwise."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
