"""bag_denoise (operators/distant.py): at-least-once multi-instance
selection — determinism, bag stats, keep_per_bag."""

import pytest

from nlp_series_relation_extraction_spark.operators.distant import (
    bag_denoise,
)

W = ("doc_id long, subj_text string, predicate string, obj_text string, "
     "score long")


def _run(spark, rows, **kw):
    out = bag_denoise(
        spark.createDataFrame(rows, W), "score", **kw
    ).collect()
    return {(r.subj_text, r.predicate, r.obj_text, r.sel_rank): r
            for r in out}


def test_top1_per_bag(spark):
    rows = [
        (1, "a", "p", "b", 10),
        (2, "a", "p", "b", 30),   # winner
        (3, "a", "p", "b", 20),
        (4, "x", "q", "y", 5),    # singleton bag
    ]
    got = _run(spark, rows)
    assert len(got) == 2
    r = got[("a", "p", "b", 1)]
    assert (r.doc_id, r.bag_size) == (2, 3)
    assert got[("x", "q", "y", 1)].bag_size == 1


def test_keep_two_ranked(spark):
    rows = [(i, "a", "p", "b", i * 10) for i in range(1, 5)]
    got = _run(spark, rows, keep_per_bag=2)
    assert got[("a", "p", "b", 1)].doc_id == 4
    assert got[("a", "p", "b", 2)].doc_id == 3
    assert len(got) == 2


def test_tie_breaks_by_id(spark):
    rows = [(9, "a", "p", "b", 7), (2, "a", "p", "b", 7)]
    assert _run(spark, rows)[("a", "p", "b", 1)].doc_id == 2


def test_keep_exceeding_bag_size_returns_all(spark):
    rows = [(1, "a", "p", "b", 1)]
    got = _run(spark, rows, keep_per_bag=5)
    assert len(got) == 1 and got[("a", "p", "b", 1)].bag_size == 1


def test_validation(spark):
    with pytest.raises(ValueError):
        bag_denoise(
            spark.createDataFrame([(1, "a", "p", "b", 1)], W), "score",
            keep_per_bag=0,
        )
