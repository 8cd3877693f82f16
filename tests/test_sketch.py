"""Sketch operators: HyperLogLog count-distinct and count-min heavy hitters.

Pins the three properties that make a sketch usable at corpus scale:
bounded size (register/cell count never exceeds the design constant),
mergeability (sketch(A ∪ B) == merge(sketch(A), sketch(B)) — the algebra
partial aggregation relies on), and the accuracy contract (HLL relative
error within the theoretical band; CM never under-estimates)."""

import pyspark.sql.functions as F
import pytest

from nlp_series_relation_extraction_spark.functions.sketch import (
    CM_DEPTH,
    CM_WIDTH,
    HLL_M,
    cm_estimate,
    cm_heavy_hitters,
    cm_sketch,
    hll_distinct,
    hll_registers,
)


def _ids(spark, n, offset=0):
    return spark.range(offset, offset + n).select(
        F.col("id").alias("k")
    )


def test_hll_register_count_bounded(spark):
    regs = hll_registers(_ids(spark, 50_000), "k")
    assert regs.count() <= HLL_M


def test_hll_raw_estimate_within_error_band(spark):
    # 50k distinct >> 2.5m = 10240 -> raw HLL regime; with m = 4096 the
    # standard error is 1.04/sqrt(m) ~ 1.6%, so 8% is a 5-sigma pin.
    row = hll_distinct(_ids(spark, 50_000), "k").collect()[0]
    assert abs(row.est - 50_000) / 50_000 < 0.08
    assert row.est == row.est_hll  # raw branch chosen


def test_hll_linear_counting_small_cardinality(spark):
    # 200 distinct -> almost-empty registers -> linear counting branch,
    # which is near-exact at this fill rate.
    row = hll_distinct(_ids(spark, 200), "k").collect()[0]
    assert row.est == row.est_linear
    assert abs(row.est - 200) / 200 < 0.02


def test_hll_merge_is_register_max(spark):
    # the map-side-combine algebra: registers of the union == elementwise
    # max of the halves' registers (duplicated ids between halves included
    # — HLL is insensitive to duplication by construction).
    a, b = _ids(spark, 3_000), _ids(spark, 3_000, offset=2_000)
    ra = hll_registers(a, "k")
    rb = hll_registers(b, "k")
    merged = (
        ra.unionByName(rb)
        .groupBy("idx")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    full = hll_registers(a.unionByName(b), "k")
    sym_diff = merged.exceptAll(full).count() + full.exceptAll(merged).count()
    assert sym_diff == 0


def test_hll_duplicates_do_not_move_estimate(spark):
    once = hll_distinct(_ids(spark, 5_000), "k").collect()[0]
    tripled = hll_distinct(
        _ids(spark, 5_000).crossJoin(spark.range(3)).select("k"), "k"
    ).collect()[0]
    assert once == tripled


def _zipf_words(spark):
    # 'w0' x 400, 'w1' x 200, 'w2' x 133, ... — a Zipf head over 40 words
    return spark.range(40).select(
        F.explode(
            F.expr("transform(sequence(1, cast(400 / (id + 1) as int)),"
                   " x -> concat('w', id))")
        ).alias("word")
    )


def test_cm_cell_count_bounded(spark):
    cells = cm_sketch(_zipf_words(spark), "word")
    assert cells.count() <= CM_DEPTH * CM_WIDTH


def test_cm_never_underestimates(spark):
    words = _zipf_words(spark)
    sk = cm_sketch(words, "word")
    est = cm_estimate(sk, words.distinct(), "word")
    exact = words.groupBy("word").agg(F.count("*").alias("exact"))
    bad = (
        est.join(exact, "word")
        .where(F.col("est") < F.col("exact"))
        .count()
    )
    assert bad == 0


def test_cm_merge_is_cell_sum(spark):
    a, b = _zipf_words(spark), _ids(spark, 500).select(
        F.concat(F.lit("x"), (F.col("k") % 7).cast("string")).alias("word")
    )
    merged = (
        cm_sketch(a, "word")
        .unionByName(cm_sketch(b, "word"))
        .groupBy("j", "bucket")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    full = cm_sketch(a.unionByName(b), "word")
    sym_diff = merged.exceptAll(full).count() + full.exceptAll(merged).count()
    assert sym_diff == 0


def test_cm_heavy_hitters_superset_of_true(spark):
    words = _zipf_words(spark)
    total = words.count()
    hh = cm_heavy_hitters(words, "word", fraction_ppm=50_000)
    got = {r.word for r in hh.collect()}
    true_hh = {
        r.word
        for r in words.groupBy("word")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") * 1_000_000 >= total * 50_000)
        .collect()
    }
    assert true_hh <= got  # no false negatives, ever
    for r in hh.collect():
        assert r.est >= r.exact


def test_hll_single_shuffle_plan(spark):
    # the whole register build must be scan -> partial agg -> ONE exchange
    # -> final agg: a second exchange would mean the sketch is shuffling
    # more than register rows.
    plan = hll_registers(_ids(spark, 1_000), "k")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_hdr_histogram_bounded_size_and_merge(spark):
    from nlp_series_relation_extraction_spark.functions.sketch import (
        hdr_histogram,
    )

    a = spark.range(1, 50_000).selectExpr("id * 7 as v")
    b = spark.range(1, 20_000).selectExpr("id * 13 as v")
    ha, hb = hdr_histogram(a, "v"), hdr_histogram(b, "v")
    assert ha.count() <= 8 * 43  # constant-size whatever the input
    merged = (
        ha.unionByName(hb)
        .groupBy("bin")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    full = hdr_histogram(a.unionByName(b), "v")
    assert merged.exceptAll(full).count() == 0
    assert full.exceptAll(merged).count() == 0


def test_hdr_percentiles_relative_error_bound(spark):
    from nlp_series_relation_extraction_spark.functions.sketch import (
        hdr_histogram,
        hdr_percentiles,
    )

    vals = spark.range(1, 100_001).selectExpr("id as v")  # 1..100000
    got = {
        r.p: r.lo
        for r in hdr_percentiles(hdr_histogram(vals, "v")).collect()
    }
    for p, true in [(50, 50_000), (95, 95_000), (99, 99_000)]:
        # lo is the bin's lower edge: within one bin width (<9.1%) below,
        # never above the true percentile by more than a bin
        assert true * (1 - 0.091) <= got[p] <= true * (1 + 0.091)


def test_hdr_nonpositive_values_land_in_bin_zero(spark):
    from nlp_series_relation_extraction_spark.functions.sketch import (
        hdr_histogram,
    )

    df = spark.createDataFrame([(0,), (-5,), (1,), (2,)], "v long")
    got = {r.bin: r.cnt for r in hdr_histogram(df, "v").collect()}
    assert got[0] == 3  # 0, -5, and 1 (first bin spans [1, 2^(1/8)))
    assert sum(got.values()) == 4


def test_cm_estimate_unseen_key_is_zero(spark):
    from nlp_series_relation_extraction_spark.functions.sketch import (
        cm_estimate,
        cm_sketch,
    )

    stream = _zipf_words(spark)
    sk = cm_sketch(stream, "word")
    probes = spark.createDataFrame(
        [("w0",), ("never-seen-key-xyz",)], "word string"
    )
    got = {r.word: r.est for r in cm_estimate(sk, probes, "word").collect()}
    # the unseen key must be PRESENT with estimate 0 unless all 4 of its
    # buckets collide with real traffic (w=512, 40 distinct words: at
    # least one empty bucket is overwhelmingly certain and deterministic
    # for this fixed corpus)
    assert got["never-seen-key-xyz"] == 0
    assert got["w0"] >= 400


def test_hdr_grouped_isolates_groups(spark):
    from nlp_series_relation_extraction_spark.functions.sketch import (
        hdr_histogram_grouped,
        hdr_percentiles_grouped,
    )

    # group 'small': values ~100; group 'big': values ~100000 — each
    # group's percentiles must reflect ONLY its own distribution
    df = spark.range(1, 1001).selectExpr(
        "case when id % 2 = 0 then 'small' else 'big' end as grp",
        "case when id % 2 = 0 then 100 + id % 7 else 100000 + id end as v",
    )
    hist = hdr_histogram_grouped(df, ["grp"], "v")
    got = {
        (r.grp, r.p): r.lo
        for r in hdr_percentiles_grouped(hist, ["grp"]).collect()
    }
    assert 90 <= got[("small", 50)] <= 110
    assert 90_000 <= got[("big", 50)] <= 110_000
    assert got[("big", 99)] >= got[("big", 50)]
