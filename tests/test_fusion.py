"""Fact fusion / truth discovery (operators/fusion.py).

Covers: one-vote-per-source counting, the n_sources >= votes contract
(a source backing several objects), deterministic tie-breaks, the
majority-vote SQL-shape parity (the driver oracle is DuckDB; here the
same logic in plain python), and the TruthFinder-style iteration against
its numpy/dict twin — including the headline behavior majority vote
cannot produce: a minority object backed by reliable sources winning.
"""

import random

import pytest

from nlp_series_relation_extraction_spark.operators.fusion import (
    iterative_trust,
    iterative_trust_python,
    majority_vote,
)


def _claims_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "subject string, predicate string, object_val string, "
        "source_id string",
    )


class TestMajorityVote:
    def test_counts_distinct_sources_and_breaks_ties(self, spark):
        rows = [
            # item (a, p): o1 backed by s1+s2, o2 by s3 -> o1 wins 2/3
            ("a", "p", "o1", "s1"),
            ("a", "p", "o1", "s1"),  # repeat mention: still ONE vote
            ("a", "p", "o1", "s2"),
            ("a", "p", "o2", "s3"),
            # item (b, p): 1-1 tie -> lexicographically smaller object
            ("b", "p", "oB", "s1"),
            ("b", "p", "oA", "s2"),
        ]
        got = {
            (r.subject, r.predicate): r
            for r in majority_vote(_claims_df(spark, rows)).collect()
        }
        a = got[("a", "p")]
        assert (a.object_val, a.votes, a.n_sources) == ("o1", 2, 3)
        assert a.support == pytest.approx(2 / 3)
        assert got[("b", "p")].object_val == "oA"
        assert got[("b", "p")].support == pytest.approx(0.5)

    def test_source_backing_two_objects_counts_once_in_denominator(
        self, spark
    ):
        # s1 asserts BOTH objects: n_sources is distinct sources (2),
        # not sum of votes (3)
        rows = [
            ("a", "p", "o1", "s1"),
            ("a", "p", "o2", "s1"),
            ("a", "p", "o1", "s2"),
        ]
        row = majority_vote(_claims_df(spark, rows)).collect()[0]
        assert (row.object_val, row.votes, row.n_sources) == ("o1", 2, 2)
        assert row.support == pytest.approx(1.0)

    def test_one_row_per_item(self, spark):
        rng = random.Random(7)
        rows = [
            (
                f"e{rng.randrange(20)}",
                "p",
                f"o{rng.randrange(4)}",
                f"s{rng.randrange(30)}",
            )
            for _ in range(400)
        ]
        df = _claims_df(spark, rows)
        out = majority_vote(df).collect()
        items = {(s, p) for s, p, _, _ in rows}
        assert len(out) == len(items)
        # python replay of the same counting rule
        d = sorted(set(rows))
        votes: dict = {}
        srcs: dict = {}
        for s, p, o, src in d:
            votes[(s, p, o)] = votes.get((s, p, o), 0) + 1
            srcs.setdefault((s, p), set()).add(src)
        for r in out:
            want = min(
                (k[2] for k, v in votes.items()
                 if k[:2] == (r.subject, r.predicate)
                 and v == max(
                     v2 for k2, v2 in votes.items()
                     if k2[:2] == (r.subject, r.predicate)
                 )),
            )
            assert r.object_val == want
            assert r.n_sources == len(srcs[(r.subject, r.predicate)])


class TestIterativeTrust:
    def test_matches_python_twin(self, spark):
        rng = random.Random(13)
        rows = [
            (
                f"e{rng.randrange(12)}",
                rng.choice(["p", "q"]),
                f"o{rng.randrange(3)}",
                f"s{rng.randrange(15)}",
            )
            for _ in range(300)
        ]
        facts, trust = iterative_trust(_claims_df(spark, rows), iters=5)
        want_best, want_trust = iterative_trust_python(rows, iters=5)
        got_trust = {r.source_id: r.trust for r in trust.collect()}
        assert set(got_trust) == set(want_trust)
        for src, tr in want_trust.items():
            assert got_trust[src] == pytest.approx(tr, abs=1e-9)
        got_facts = {
            (r.subject, r.predicate): (r.object_val, r.confidence)
            for r in facts.collect()
        }
        assert set(got_facts) == set(want_best)
        for k, (o, c) in want_best.items():
            assert got_facts[k][0] == o
            assert got_facts[k][1] == pytest.approx(c, abs=1e-9)

    def test_reliable_minority_beats_unreliable_majority(self, spark):
        # A, B (reliable) assert the true object for every item; C, D, E
        # gang up on item e0 with the same wrong object (3-2 majority)
        # but scatter on every other item. Majority vote gets e0 wrong;
        # the trust iteration down-weights C/D/E and recovers it.
        rows = []
        for i in range(10):
            for src in ("A", "B"):
                rows.append((f"e{i}", "p", f"true{i}", src))
        for j, src in enumerate(("C", "D", "E")):
            rows.append(("e0", "p", "wrong0", src))
            for i in range(1, 10):
                rows.append((f"e{i}", "p", f"junk{i}_{j}", src))
        df = _claims_df(spark, rows)
        mv = {
            r.subject: r.object_val for r in majority_vote(df).collect()
        }
        assert mv["e0"] == "wrong0"  # the baseline's failure mode
        facts, trust = iterative_trust(df, iters=4)
        got = {r.subject: r.object_val for r in facts.collect()}
        assert got["e0"] == "true0"
        assert all(got[f"e{i}"] == f"true{i}" for i in range(10))
        tr = {r.source_id: r.trust for r in trust.collect()}
        assert min(tr["A"], tr["B"]) > max(tr["C"], tr["D"], tr["E"])

    def test_bad_iters_rejected(self, spark):
        with pytest.raises(ValueError, match="iters"):
            iterative_trust(_claims_df(spark, [("a", "p", "o", "s")]), iters=0)


def test_driver_queries_smoke(spark):
    from nlp_series_relation_extraction_spark.plans.queries import queries

    q = queries()
    fused = q["kg_fact_fusion"](spark, "/root/testdata/sf0.001")
    rows = fused.collect()
    assert len(rows) > 0
    assert fused.columns == [
        "subject", "predicate", "object_val", "votes", "n_sources",
        "support",
    ]
    assert all(0.0 < r.support <= 1.0 for r in rows)
    trust = q["kg_fact_fusion_trust"](spark, "/root/testdata/sf0.001")
    trows = trust.collect()
    assert len(trows) > 0
    assert all(0.0 < r.confidence <= 1.0 for r in trows)
