"""checkpoint_nostats (functions/partitioning.py): the fixpoint-loop
checkpoint that drops inherited Catalyst statistics.

Why it exists (measured, round 5): Spark >= 3.4 preserves the truncated
plan's computed stats on the LogicalRDD leaf after localCheckpoint.  In
an iterated join the sizeInBytes estimates MULTIPLY every round, the
next checkpoint stores the product, and the BigInteger digit count
compounds geometrically — the third nested connected-components of
owl_equality_entailment burned >600s of driver CPU inside
BigInteger.multiply on a ~5-row frame (kg_owl_sameas: 644s -> 27s at
sf0.1 after the fix).  These tests pin both halves: results unchanged,
and the digit growth actually stopped.
"""

import pytest
from pyspark.sql import functions as F

from nlp_series_relation_extraction_spark.functions.partitioning import (
    checkpoint_nostats,
)


def _stats_digits(df):
    """Digit count of the optimized plan's sizeInBytes estimate."""
    jstats = df._jdf.queryExecution().optimizedPlan().stats()
    return len(str(jstats.sizeInBytes()))


def _one_round(df):
    """One fixpoint-shaped round: 1:1 self-join on a UNIQUE key (rows
    never grow), re-derive columns.  Catalyst's size-only join estimate
    is the PRODUCT of both sides' sizeInBytes regardless of actual row
    counts, so with plain localCheckpoint the next leaf inherits the
    product and digits compound — while the data stays fixed-size."""
    other = df.select(
        F.col("k").alias("k2"), F.col("v").alias("v2")
    )
    return df.join(other, df["k"] == other["k2"]).select(
        "k", (F.col("v") + F.col("v2")).alias("v")
    )


def test_roundtrip_rows_and_schema(spark):
    df = spark.range(100).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("v")
    )
    out = checkpoint_nostats(df)
    assert out.schema == df.schema
    assert sorted(out.collect()) == sorted(df.collect())


def test_rows_survive_iterated_rounds(spark):
    df = spark.range(20).select(
        F.col("id").alias("k"), F.col("id").alias("v")
    )
    plain = df
    nostats = df
    for _ in range(3):
        plain = _one_round(plain).localCheckpoint(eager=True)
        nostats = checkpoint_nostats(_one_round(nostats))
    assert sorted(plain.collect()) == sorted(nostats.collect())


def test_stats_digits_stay_flat_where_plain_checkpoint_compounds(spark):
    df = spark.range(200).select(
        F.col("id").alias("k"), F.col("id").alias("v")
    )
    plain = df.localCheckpoint(eager=True)
    nostats = checkpoint_nostats(df)
    plain_digits, nostats_digits = [], []
    for _ in range(4):
        plain = _one_round(plain).localCheckpoint(eager=True)
        nostats = checkpoint_nostats(_one_round(nostats))
        plain_digits.append(_stats_digits(plain))
        nostats_digits.append(_stats_digits(nostats))
    # plain checkpoints inherit the joined product: strictly growing
    # digit counts (the geometric blow-up in its first rounds)
    assert plain_digits == sorted(plain_digits) and (
        plain_digits[-1] > plain_digits[0]
    ), plain_digits
    # conditional stripping: sane estimates are KEPT (early rounds may
    # grow), but any leaf whose estimate exceeds 2^67 resets to the
    # 19-digit default — digits are bounded forever and stabilize at
    # the default once stripping engages, instead of compounding
    assert max(nostats_digits) <= 2 * 21, nostats_digits
    assert nostats_digits[-1] == 19, nostats_digits
    assert nostats_digits[-2] == 19, nostats_digits


def test_jvm_rebuild_is_active_not_fallback(spark):
    """The private-API path must actually run on this install — if it
    silently fell back to the plain checkpoint, the compounding would
    come back with no test failing.  max_bits=0 forces the strip."""
    df = spark.range(10).select(F.col("id").alias("k"))
    ck = df.localCheckpoint(eager=True)
    out = checkpoint_nostats(df, max_bits=0)
    # the rebuilt leaf reports the default estimate, not the computed one
    assert _stats_digits(out) >= 19, _stats_digits(out)
    assert _stats_digits(ck) < 19, _stats_digits(ck)


def test_sane_stats_are_preserved(spark):
    """Realistic estimates survive the checkpoint: plan-time
    auto-broadcast eligibility keeps working in well-behaved loops
    (real estimates are strictly more information than the forced
    default; interleaved A/B on kg_betweenness showed parity)."""
    df = spark.range(100).select(F.col("id").alias("k"))
    out = checkpoint_nostats(df)
    ck = df.localCheckpoint(eager=True)
    assert _stats_digits(out) == _stats_digits(ck) < 19


def test_empty_frame(spark):
    df = spark.createDataFrame([], "k long, v string")
    out = checkpoint_nostats(df)
    assert out.count() == 0
    assert out.schema == df.schema
