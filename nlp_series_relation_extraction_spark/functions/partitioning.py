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

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

_MIN_PARTITION_KEY = "spark.sql.adaptive.coalescePartitions.minPartitionSize"

# Per-partition byte floor inside compute-dense regions. The default
# floor (1MB) assumes compute scales with bytes; frontier/fixpoint joins
# fan tiny rows out to heavy in-stage work, so the region drops the
# floor two orders of magnitude — task count then still scales with
# bytes (a 5KB round stays single-task; a 4MB fan-in spreads over the
# cores) instead of flipping to all-or-nothing. Env-tunable; at
# production scale the shuffles inside these loops exceed the DEFAULT
# floor anyway and the region is a no-op.
import os as _os

_DENSE_MIN_PARTITION = _os.environ.get(
    "SPARK_GRAFT_DENSE_MIN_PARTITION", "16k"
)


@contextmanager
def compute_dense_region(spark: SparkSession):
    """Lower the AQE partition-coalescing byte floor for the actions run
    INSIDE the ``with`` block (lazy frames executed after the block run
    with the session default again).

    Why: AQE coalesces post-shuffle partitions by BYTES. Iterative graph
    and fixpoint operators run joins whose inputs are tiny (a frontier,
    a label table) but whose in-stage compute fans out (frontier x
    adjacency, sigma aggregation, entailment composition) — byte-based
    coalescing collapses those stages to ONE task and serializes the
    round (round-6 event-log find: a 4.3s single-task frontier-join
    stage inside kg_betweenness). Fully DISABLING coalescing
    over-corrects: loops whose per-round state really is a few KB
    (SCC's trim rounds) then pay 32 task dispatches per tiny stage and
    regress (kg_scc measured 4.9s -> 10.2s under enabled=false).
    Lowering the floor keeps both regimes honest. Scoped to the loop
    rather than set session-wide so the default byte heuristic keeps
    working for scan/aggregate queries, where bytes ARE the right cost
    model.

    Not thread-safe across concurrent regions with different desired
    states (session conf is global); concurrent fits (kg_link_prediction)
    enter the region once around the whole pool."""
    try:
        old = spark.conf.get(_MIN_PARTITION_KEY)
    except Exception:
        old = None
    spark.conf.set(_MIN_PARTITION_KEY, _DENSE_MIN_PARTITION)
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(_MIN_PARTITION_KEY)
        else:
            spark.conf.set(_MIN_PARTITION_KEY, old)


def checkpoint_with_metrics(
    df: DataFrame, *exprs, eager: bool = True, max_bits: int = 67
):
    """``checkpoint_nostats`` with aggregate metrics OBSERVED on the
    materializing action itself: returns ``(checkpointed_df, metrics)``
    where ``metrics`` is the dict of the given aggregate expressions
    evaluated over the materialized rows.

    Iterative fixpoints typically pay TWO actions per round — the
    eager checkpoint, then a scalar convergence probe (a count, an
    isEmpty, a label-sum) over the checkpointed rows. The probe values
    are plain aggregates of exactly the rows the checkpoint just
    materialized, so ``Dataset.observe`` computes them inside the
    checkpoint job for free (Observation.get is a ~3ms listener wait
    after an eager action — measured round 6, same mechanism as the
    streaming sink's touched-bucket probe). Values are identical to
    the follow-up query by construction; only the job count changes.

    The observe node sits BELOW the checkpoint, so the returned frame
    is a plain materialized-RDD leaf — downstream lineage is unchanged.
    """
    from pyspark.sql import Observation

    obs = Observation()
    ck = checkpoint_nostats(
        df.observe(obs, *exprs), eager=eager, max_bits=max_bits
    )
    return ck, obs.get


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
