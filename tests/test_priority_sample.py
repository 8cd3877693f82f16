"""Priority sampling (functions/curation.py:priority_sample, Duffield
2007): exact equality with the md5 twin, the fixed-size contract, the
n <= k degenerate case (estimator = own weight), and the property the
operator exists for — subset-sum estimates are unbiased across salts."""

import random

from nlp_series_relation_extraction_spark.functions.curation import (
    priority_sample,
    priority_sample_python,
)


def _df(spark, items):
    return spark.createDataFrame(items, "doc_id long, w double")


def _run(spark, items, k, salt="ps"):
    got = [
        (r["id"], r["weight"], r["weight_est_micro"])
        for r in priority_sample(
            _df(spark, items), "doc_id", "w", k, salt=salt
        ).collect()
    ]
    want = priority_sample_python(items, k, salt=salt)
    assert got == want
    return got


def test_exact_twin_equality(spark):
    rng = random.Random(81)
    items = [(i, round(rng.uniform(0.1, 50.0), 3)) for i in range(200)]
    for k in (5, 20, 60):
        got = _run(spark, items, k)
        assert len(got) == k  # fixed-size contract


def test_small_input_keeps_everything_with_own_weight(spark):
    items = [(1, 2.5), (2, 7.0), (3, 0.5)]
    got = _run(spark, items, 10)
    assert got == [
        (1, 2.5, 2_500_000),
        (2, 7.0, 7_000_000),
        (3, 0.5, 500_000),
    ]


def test_heavy_rows_always_kept_with_own_weight(spark):
    # a weight far above tau is sampled with certainty and its
    # estimator is its own weight (max(w, tau) = w)
    items = [(i, 1.0) for i in range(100)] + [(999, 10_000.0)]
    got = dict((i, e) for i, _w, e in _run(spark, items, 10))
    assert got[999] == 10_000.0 * 1e6


def test_subset_sum_unbiased_across_salts(spark):
    rng = random.Random(82)
    items = [(i, round(rng.uniform(0.5, 9.5), 3)) for i in range(300)]
    true_sum = sum(w for _, w in items)
    # average the estimator over many independent salts (python twin:
    # same arithmetic as the operator, already proven equal above)
    n_salts, k = 300, 40
    acc = 0.0
    for s in range(n_salts):
        samp = priority_sample_python(items, k, salt=f"s{s}")
        acc += sum(e / 1e6 for _, _, e in samp)
    mean = acc / n_salts
    assert abs(mean - true_sum) / true_sum < 0.05


def test_group_subset_sums_unbiased(spark):
    # the paper's point: ARBITRARY subsets, chosen after sampling
    rng = random.Random(83)
    items = [(i, round(rng.uniform(0.5, 9.5), 3)) for i in range(300)]
    group = {i for i, _ in items if i % 3 == 0}
    true_g = sum(w for i, w in items if i in group)
    acc = 0.0
    n_salts, k = 300, 40
    for s in range(n_salts):
        samp = priority_sample_python(items, k, salt=f"g{s}")
        acc += sum(e / 1e6 for i, _, e in samp if i in group)
    mean = acc / n_salts
    assert abs(mean - true_g) / true_g < 0.08
