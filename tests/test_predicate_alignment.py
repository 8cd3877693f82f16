"""align_predicates (operators/predicates.py): PARIS instance-based
cross-KG predicate alignment — hand-computed subsumption/equivalence."""

import pytest

from nlp_series_relation_extraction_spark.operators.predicates import (
    align_predicates,
)

T = "subject string, predicate string, object_val string"


def _rows(spark, a, b, **kw):
    out = align_predicates(
        spark.createDataFrame(a, T), spark.createDataFrame(b, T), **kw
    ).collect()
    return {(r.pred_a, r.pred_b): r for r in out}


def test_exact_equivalence(spark):
    a = [("s1", "made_by", "o1"), ("s2", "made_by", "o2")]
    b = [("s1", "madeBy", "o1"), ("s2", "madeBy", "o2")]
    got = _rows(spark, a, b)
    r = got[("made_by", "madeBy")]
    assert (r.n_a, r.n_b, r.n_joint) == (2, 2, 2)
    assert r.sub_ppm == r.super_ppm == r.jaccard_ppm == 1_000_000


def test_strict_subsumption(spark):
    # A's 'urgent' covers half of B's 'priority': urgent ⊑ priority
    a = [("s1", "urgent", "o1"), ("s2", "urgent", "o2")]
    b = [
        ("s1", "priority", "o1"),
        ("s2", "priority", "o2"),
        ("s3", "priority", "o3"),
        ("s4", "priority", "o4"),
    ]
    r = _rows(spark, a, b)[("urgent", "priority")]
    assert (r.n_a, r.n_b, r.n_joint) == (2, 4, 2)
    assert r.sub_ppm == 1_000_000        # every urgent pair is a priority pair
    assert r.super_ppm == 500_000
    assert r.jaccard_ppm == 2 * 1_000_000 // 4


def test_same_name_across_kgs_is_scored(spark):
    a = [("s1", "p", "o1"), ("s2", "p", "o2")]
    b = [("s1", "p", "o1")]
    r = _rows(spark, a, b)[("p", "p")]
    assert (r.n_joint, r.sub_ppm, r.super_ppm) == (1, 500_000, 1_000_000)


def test_duplicate_claims_collapse(spark):
    a = [("s1", "p", "o1"), ("s1", "p", "o1")]
    b = [("s1", "q", "o1"), ("s1", "q", "o1")]
    r = _rows(spark, a, b)[("p", "q")]
    assert (r.n_a, r.n_b, r.n_joint) == (1, 1, 1)


def test_min_joint_filters(spark):
    a = [("s1", "p", "o1")]
    b = [("s1", "q", "o1")]
    assert _rows(spark, a, b, min_joint=2) == {}


def test_stop_pair_firewall(spark):
    # (hub, hub) asserted under 3 predicates in A exceeds the cap 2 and
    # is dropped from the evidence on the A side entirely
    a = [("hub", f"p{i}", "hub") for i in range(3)] + [("s", "p0", "o")]
    b = [("hub", "q", "hub"), ("s", "q", "o")]
    got = _rows(spark, a, b, max_pair_preds=2)
    r = got[("p0", "q")]
    assert (r.n_a, r.n_b, r.n_joint) == (1, 2, 1)
    assert len(got) == 1  # p1/p2 have no surviving evidence


def test_disjoint_predicates_absent(spark):
    a = [("s1", "p", "o1")]
    b = [("s9", "q", "o9")]
    assert _rows(spark, a, b) == {}


def test_min_joint_validation(spark):
    with pytest.raises(ValueError):
        align_predicates(
            spark.createDataFrame([("s", "p", "o")], T),
            spark.createDataFrame([("s", "p", "o")], T),
            min_joint=0,
        )
