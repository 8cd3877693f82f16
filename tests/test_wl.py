"""WL neighborhood fingerprints (operators/wl.py): twin exactness,
isomorphism invariance, refinement power, multiset (parallel-edge)
sensitivity, and the blocking-key contract."""

import pytest

from nlp_series_relation_extraction_spark.operators.wl import (
    align_by_structure,
    align_by_structure_python_twin,
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


def _edges_df(spark, edges):
    return spark.createDataFrame(
        edges, "subj string, predicate string, obj string"
    )


class TestAlignByStructure:
    # a small heterogeneous graph: hub with 2 leaves, a chain, an
    # isolated-pair — renamed copy must align completely
    A = [
        ("hub", "p", "leaf1"),
        ("hub", "p", "leaf2"),
        ("c1", "q", "c2"),
        ("c2", "q", "c3"),
    ]
    REN = {
        "hub": "HUB", "leaf1": "L1", "leaf2": "L2",
        "c1": "C1", "c2": "C2", "c3": "C3",
    }

    def _run(self, spark, ea, eb, rounds=2):
        out = align_by_structure(
            _edges_df(spark, ea), _edges_df(spark, eb), rounds=rounds
        )
        return {(r.node_a, r.node_b, r.fingerprint) for r in out.collect()}

    def test_pure_rename_recovers_mapping(self, spark):
        b = [(self.REN[s], p, self.REN[o]) for s, p, o in self.A]
        got = self._run(spark, self.A, b)
        pairs = {(a, bb) for a, bb, _ in got}
        # leaves / chain-ends are ambiguous? leaf1 vs leaf2 share a
        # fingerprint (identical radius-2 views) so they are EXCLUDED;
        # everything structurally unique aligns exactly
        assert ("hub", "HUB") in pairs
        assert ("c2", "C2") in pairs
        assert ("c1", "C1") in pairs and ("c3", "C3") in pairs
        assert not any(a.startswith("leaf") for a, _, _ in got)
        assert got == align_by_structure_python_twin(self.A, b)

    def test_matches_python_twin_on_perturbed_snapshot(self, spark):
        b = [(self.REN[s], p, self.REN[o]) for s, p, o in self.A]
        b.append(("HUB", "p", "L3"))  # B-only extra leaf
        got = self._run(spark, self.A, b)
        assert got == align_by_structure_python_twin(self.A, b)
        pairs = {(a, bb) for a, bb, _ in got}
        # the hub's neighborhood changed -> no hub match ...
        assert not any(a == "hub" for a, _ in pairs)
        # ... but the untouched chain still aligns
        assert ("c2", "C2") in pairs

    def test_ambiguous_blocks_are_excluded_both_ways(self, spark):
        # two clones in A, one in B: the shared fingerprint is not a
        # singleton in A, so no (possibly wrong) match is emitted
        a = [("x1", "p", "y1"), ("x2", "p", "y2")]
        b = [("X", "p", "Y")]
        got = self._run(spark, a, b)
        assert got == set()
        assert align_by_structure_python_twin(a, b) == set()

    def test_labels_disambiguate(self, spark):
        # same structure, labels split the clones into singletons
        a = [("x1", "p", "y1"), ("x2", "p", "y2")]
        b = [("X1", "p", "Y1"), ("X2", "p", "Y2")]
        la = {"x1": "red", "x2": "blue"}
        lb = {"X1": "red", "X2": "blue"}
        out = align_by_structure(
            _edges_df(spark, a),
            _edges_df(spark, b),
            labels_a=spark.createDataFrame(
                sorted(la.items()), "node string, label string"
            ),
            labels_b=spark.createDataFrame(
                sorted(lb.items()), "node string, label string"
            ),
            rounds=2,
        )
        got = {(r.node_a, r.node_b) for r in out.collect()}
        assert ("x1", "X1") in got and ("x2", "X2") in got
        assert ("x1", "X2") not in got
