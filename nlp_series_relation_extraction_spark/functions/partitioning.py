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


def checkpoint_nostats(
    df: DataFrame, eager: bool = True, max_bits: int = 67
) -> DataFrame:
    """``localCheckpoint`` that DROPS the inherited Catalyst statistics
    once they turn absurd — the checkpoint for iterative fixpoints.

    ``max_bits``: keep the preserved stats while the leaf's sizeInBytes
    estimate fits in this many bits (2^67 ~ 1.5e20 bytes — beyond any
    physical dataset, so only garbage estimates are dropped and sane
    loops keep plan-time auto-broadcast). ``max_bits=0`` strips
    unconditionally (used by tests to pin the JVM rebuild path).

    Since Spark 3.4, ``Dataset.localCheckpoint`` copies the truncated
    plan's computed statistics onto the new ``LogicalRDD`` leaf
    (``originStats``), and there is no conf to disable it.  In a
    fixpoint loop (pointer-jumping connected components, entailment
    cascades) every round's joins MULTIPLY ``sizeInBytes`` estimates,
    the next checkpoint stores the product as its leaf stats, and the
    BigInteger digit count compounds geometrically round over round.
    Measured on this install: the third nested CC of
    ``owl_equality_entailment`` spent >600s of driver CPU inside
    ``BigInteger.multiply`` doing stats arithmetic on a ~5-row frame
    (thread-dump evidence; ``kg_owl_sameas`` 644s at sf0.1, ~all of it
    plan-side and data-independent — the same blow-up would stall a
    1000-executor driver identically).

    Fix: after checkpointing, rebuild the DataFrame from the
    materialized ``InternalRow`` RDD via
    ``SparkSession.internalCreateDataFrame`` — the fresh ``LogicalRDD``
    carries no origin stats, so its leaf reports
    ``defaultSizeInBytes`` and each round's stats math starts flat.
    No data is recomputed or copied (the RDD is the already-eager
    checkpoint), and results are unchanged — only estimates reset.

    Deliberate trade-offs: the rebuilt leaf loses preserved
    partitioning/ordering metadata and plan-time auto-broadcast
    eligibility.  Inside these loops joins re-key every round anyway,
    and AQE re-derives broadcast/local-read decisions from ACTUAL
    shuffle sizes at runtime, so nothing is lost at scale.  Falls back
    to the plain checkpoint if the private JVM API ever moves.
    """
    ck = df.localCheckpoint(eager=eager)
    try:
        jdf = ck._jdf
        qe = jdf.queryExecution()
        if max_bits > 0:
            # preserved stats are only DROPPED once the estimate is
            # physically absurd (> 2^max_bits bytes ~ 10^20 at the
            # default) — a sane estimate stays, so loops whose stats
            # remain realistic keep plan-time auto-broadcast
            # eligibility. (An interleaved A/B on kg_betweenness at
            # sf0.1 showed strip-vs-keep parity — min 13.9s vs 14.1s —
            # so this is defense-in-depth, not a measured win: real
            # estimates are strictly more information than a forced
            # default.) Compounding still can't start: every leaf is
            # capped at ~max_bits bits, so a round's plan multiplies a
            # bounded number of bounded leaves and the next checkpoint
            # re-caps. Reading the leaf's preserved stats is O(1) — a
            # stored value on the LogicalRDD, not a plan-wide
            # recomputation.
            # py4j converts the scala BigInt to a Python int
            bits = int(
                qe.optimizedPlan().stats().sizeInBytes()
            ).bit_length()
            if bits <= max_bits:
                return ck
        new_jdf = jdf.sparkSession().internalCreateDataFrame(
            qe.toRdd(), qe.analyzed().schema(), False
        )
        return DataFrame(new_jdf, df.sparkSession)
    except Exception:  # private-API drift: keep correctness, lose the reset
        return ck
