"""WL neighborhood fingerprints (operators/wl.py): twin exactness,
isomorphism invariance, refinement power, multiset (parallel-edge)
sensitivity, and the blocking-key contract."""

import pytest

from nlp_series_relation_extraction_spark.operators.wl import (
    wl_fingerprints,
    wl_fingerprints_python_twin,
)

EDGES = [
    ("a", "knows", "b"),
    ("b", "knows", "c"),
    ("a", "works", "x"),
    ("c", "works", "x"),
    ("d", "knows", "e"),  # disjoint pair, isomorphic to nothing above
]


def _run(spark, edges, labels=None, rounds=2):
    ldf = None
    if labels is not None:
        ldf = spark.createDataFrame(
            sorted(labels.items()), "node string, label string"
        )
    out = wl_fingerprints(
        spark.createDataFrame(
            edges, "subj string, predicate string, obj string"
        ),
        labels=ldf,
        rounds=rounds,
    )
    return {r.node: r.fingerprint for r in out.collect()}


class TestWlFingerprints:
    def test_matches_python_twin_exactly(self, spark):
        for rounds in (0, 1, 2, 3):
            got = _run(spark, EDGES, rounds=rounds)
            assert got == wl_fingerprints_python_twin(
                EDGES, rounds=rounds
            ), rounds

    def test_labels_seed_round_zero(self, spark):
        labels = {"a": "Person", "x": "Org"}
        got = _run(spark, EDGES, labels=labels, rounds=2)
        assert got == wl_fingerprints_python_twin(
            EDGES, labels=labels, rounds=2
        )
        # labeled 'a' now differs from its unlabeled twin run
        assert got["a"] != _run(spark, EDGES, rounds=2)["a"]

    def test_isomorphic_relabeling_preserves_fingerprints(self, spark):
        ren = {"a": "p", "b": "q", "c": "r", "d": "s", "e": "t", "x": "y"}
        mirrored = [(ren[s], p, ren[o]) for s, p, o in EDGES]
        base = _run(spark, EDGES, rounds=3)
        got = _run(spark, mirrored, rounds=3)
        assert {base[n] for n in ren} == {got[ren[n]] for n in ren}
        for n, m in ren.items():
            assert base[n] == got[m], (n, m)

    def test_refinement_separates_by_radius(self, spark):
        # path u1->u2->u3->u4: at round 0 all equal; u1 (source) and
        # u4 (sink) split from the middle at round 1; u2/u3 split from
        # each other only at round 2 (their 2-hop views differ)
        path = [
            ("u1", "p", "u2"), ("u2", "p", "u3"), ("u3", "p", "u4"),
        ]
        r0 = _run(spark, path, rounds=0)
        assert len(set(r0.values())) == 1
        r1 = _run(spark, path, rounds=1)
        assert r1["u2"] == r1["u3"] != r1["u1"]
        r2 = _run(spark, path, rounds=2)
        assert len(set(r2.values())) == 4

    def test_parallel_edges_are_a_multiset(self, spark):
        single = [("s", "p", "t")]
        double = [("s", "p", "t"), ("s", "p", "t")]
        # DataFrames keep duplicate rows, so the doubled edge must
        # produce a different round-1 hash for both endpoints
        got_s = _run(spark, single, rounds=1)
        got_d = _run(spark, double, rounds=1)
        assert got_s["s"] != got_d["s"] and got_s["t"] != got_d["t"]
        assert got_d == wl_fingerprints_python_twin(double, rounds=1)

    def test_direction_and_predicate_sensitivity(self, spark):
        fwd = _run(spark, [("a", "p", "b")], rounds=1)
        rev = _run(spark, [("b", "p", "a")], rounds=1)
        other = _run(spark, [("a", "q", "b")], rounds=1)
        # orientation swaps roles: a is a source in fwd, a sink in rev
        assert fwd["a"] != rev["a"]
        assert fwd["a"] != other["a"]

    def test_blocking_key_has_no_false_negatives(self, spark):
        # two structurally identical stars must share fingerprints at
        # every radius (the dedup-blocking contract)
        star1 = [("h1", "p", f"l1_{i}") for i in range(4)]
        star2 = [("h2", "p", f"l2_{i}") for i in range(4)]
        got = _run(spark, star1 + star2, rounds=3)
        assert got["h1"] == got["h2"]
        assert {got[f"l1_{i}"] for i in range(4)} == {
            got[f"l2_{i}"] for i in range(4)
        }

    def test_randomized_graphs_match_twin(self, spark):
        import random

        rng = random.Random(31)
        nodes = [f"n{i}" for i in range(12)]
        preds = ["p", "q"]
        for trial in range(3):
            edges = sorted(
                {
                    (rng.choice(nodes), rng.choice(preds), rng.choice(nodes))
                    for _ in range(20)
                }
            )
            labels = {n: f"L{rng.randrange(3)}" for n in nodes[:6]}
            got = _run(spark, edges, labels=labels, rounds=2)
            assert got == wl_fingerprints_python_twin(
                edges, labels=labels, rounds=2
            ), trial

    def test_negative_rounds_raise(self, spark):
        with pytest.raises(ValueError, match="rounds"):
            wl_fingerprints(
                spark.createDataFrame(
                    EDGES, "subj string, predicate string, obj string"
                ),
                rounds=-1,
            )
