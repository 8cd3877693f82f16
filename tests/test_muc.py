"""muc_eval (evaluation/clustering.py): Vilain MUC-6 link score —
the paper's own worked examples and the singleton blind spot."""

from nlp_series_relation_extraction_spark.evaluation.clustering import (
    muc_eval,
)

A = "item_id long, pred_cluster string, gold_cluster string"


def _row(spark, rows):
    [r] = muc_eval(spark.createDataFrame(rows, A)).collect()
    return r


def test_perfect_clustering(spark):
    rows = [(1, "x", "g1"), (2, "x", "g1"), (3, "y", "g2"), (4, "y", "g2")]
    r = _row(spark, rows)
    assert (r.pred_links, r.gold_links) == (2, 2)
    assert r.muc_precision_ppm == r.muc_recall_ppm == r.muc_f1_ppm \
        == 1_000_000


def test_vilain_example_split_cluster(spark):
    # gold {1,2,3,4} predicted as {1,2} {3,4}: recall = (4-2)/(4-1)=2/3,
    # precision = ((2-1)+(2-1))/((2-1)+(2-1)) = 1
    rows = [(1, "a", "g"), (2, "a", "g"), (3, "b", "g"), (4, "b", "g")]
    r = _row(spark, rows)
    assert r.muc_precision_ppm == 1_000_000
    assert r.muc_recall_ppm == 2 * 1_000_000 // 3
    p, q = 1_000_000, 2 * 1_000_000 // 3
    assert r.muc_f1_ppm == 2 * p * q // (p + q)


def test_overmerge_hits_precision(spark):
    # gold {1,2} {3,4} predicted as one cluster: precision = (4-2)/3,
    # recall = 1
    rows = [(1, "a", "g1"), (2, "a", "g1"), (3, "a", "g2"), (4, "a", "g2")]
    r = _row(spark, rows)
    assert r.muc_recall_ppm == 1_000_000
    assert r.muc_precision_ppm == 2 * 1_000_000 // 3


def test_all_singletons_both_sides(spark):
    # no links claimed, none to recover: both ratios 1e6 by convention
    rows = [(i, f"p{i}", f"g{i}") for i in range(4)]
    r = _row(spark, rows)
    assert (r.pred_links, r.gold_links) == (0, 0)
    assert r.muc_precision_ppm == r.muc_recall_ppm == 1_000_000


def test_singleton_blind_spot(spark):
    # MUC ignores correctly-left-alone singletons: adding them changes
    # nothing (the documented reason B3 is reported alongside)
    base = [(1, "a", "g"), (2, "a", "g"), (3, "b", "g")]
    with_singletons = base + [(10, "s1", "h1"), (11, "s2", "h2")]
    r1, r2 = _row(spark, base), _row(spark, with_singletons)
    assert (r1.muc_precision_ppm, r1.muc_recall_ppm) == (
        r2.muc_precision_ppm, r2.muc_recall_ppm,
    )
