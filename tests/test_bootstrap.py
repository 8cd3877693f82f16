"""Snowball/DIPRE bootstrapping (operators/bootstrap.py): hand-computed
fixtures, a pure-python twin of the full multi-round recursion, and the
scale invariants (partition invariance, monotone seed growth, first-round
confidence retention). The driver query `kg_bootstrap` is additionally
bit-checked against its chained-CTE DuckDB oracle by
tests/test_oracle_crosscheck.py."""

import pytest
from pyspark.sql import functions as F

from nlp_series_relation_extraction_spark.operators.bootstrap import (
    cooccurrence_pairs,
    pair_types,
    pattern_apply,
    pattern_induction,
    snowball_bootstrap,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _python_twin(texts, seeds, rounds, max_mid, min_support, min_conf_ppm):
    """Identical recursion in plain python over (doc_id, text) rows."""
    ptypes = set()
    for _, text in texts:
        ts = text.split(" ")
        for i in range(len(ts)):
            for m in range(1, max_mid + 1):
                if i + m + 1 <= len(ts) - 1:
                    s, o = ts[i], ts[i + m + 1]
                    if s != o:
                        ptypes.add((s, " ".join(ts[i + 1 : i + m + 1]), o))
    totals = {}
    for s, mid, o in ptypes:
        totals[mid] = totals.get(mid, 0) + 1
    cur = {(s, o) for s, o in seeds if s != o}
    discovered = {}
    for r in range(1, rounds + 1):
        seed_hits = {}
        for s, mid, o in ptypes:
            if (s, o) in cur:
                seed_hits[mid] = seed_hits.get(mid, 0) + 1
        pats = {
            mid: (hits * 1_000_000) // totals[mid]
            for mid, hits in seed_hits.items()
            if hits >= min_support
            and (hits * 1_000_000) // totals[mid] >= min_conf_ppm
        }
        new = {}
        for s, mid, o in ptypes:
            if mid in pats and (s, o) not in cur:
                key = (s, o)
                new[key] = max(new.get(key, 0), pats[mid])
        for (s, o), conf in new.items():
            discovered[(s, o)] = (r, conf)
        cur |= set(new)
    return discovered


class TestCooccurrencePairs:
    def test_hand_computed_window(self, spark):
        out = cooccurrence_pairs(
            _docs(spark, [(1, "a b c d")]), max_mid=2
        ).collect()
        got = {(r.subj, r.middle, r.obj) for r in out}
        assert got == {
            ("a", "b", "c"),
            ("a", "b c", "d"),
            ("b", "c", "d"),
        }

    def test_self_pairs_dropped(self, spark):
        out = cooccurrence_pairs(
            _docs(spark, [(1, "x y x")]), max_mid=1
        ).collect()
        assert {(r.subj, r.middle, r.obj) for r in out} == set()

    def test_bad_max_mid_rejected(self, spark):
        with pytest.raises(ValueError, match="max_mid"):
            cooccurrence_pairs(_docs(spark, [(1, "a b c")]), max_mid=0)


class TestPatternScoring:
    def test_confidence_is_exact_integer_floor(self, spark):
        # middle 'of' connects 3 distinct pairs, 2 of them seeds:
        # conf = floor(2e6 / 3) = 666666 (a double-division floor would
        # be the same here, but the 1/3 expansion is the classic ulp
        # trap the div implementation exists for)
        docs = _docs(
            spark,
            [(1, "a of b"), (2, "c of d"), (3, "e of f")],
        )
        seeds = spark.createDataFrame(
            [("a", "b"), ("c", "d")], "subj string, obj string"
        )
        pt = pair_types(cooccurrence_pairs(docs, max_mid=1))
        pats = pattern_induction(
            pt, seeds, min_support=2, min_conf_ppm=0
        ).collect()
        assert len(pats) == 1
        row = pats[0]
        assert (row.middle, row.seed_pairs, row.total_pairs, row.conf_ppm) == (
            "of", 2, 3, 666_666,
        )

    def test_apply_excludes_seeds_and_takes_max_conf(self, spark):
        # 'x in y' matched by both accepted middles: takes the higher conf
        docs = _docs(
            spark,
            [
                (1, "a in b"), (2, "c in d"), (3, "x in y"),
                (4, "a at b"), (5, "c at d"), (6, "x at y"), (7, "x at z"),
            ],
        )
        seeds = spark.createDataFrame(
            [("a", "b"), ("c", "d")], "subj string, obj string"
        )
        pt = pair_types(cooccurrence_pairs(docs, max_mid=1))
        pats = pattern_induction(pt, seeds, min_support=2, min_conf_ppm=0)
        got = {
            (r.subj, r.obj): r.conf_ppm
            for r in pattern_apply(pt, pats, seeds).collect()
        }
        # 'in': 2/3 seeds -> 666666; 'at': 2/4 -> 500000
        assert got[("x", "y")] == 666_666
        assert got[("x", "z")] == 500_000
        assert ("a", "b") not in got and ("c", "d") not in got


class TestSnowballBootstrap:
    TEXTS = [
        (1, "alpha of beta gamma"),
        (2, "gamma of delta alpha"),
        (3, "beta of alpha delta"),
        (4, "delta near beta gamma of alpha"),
        (5, "alpha near gamma"),
        (6, "beta near delta"),
    ]
    SEEDS = [("alpha", "beta"), ("gamma", "delta")]

    def _spark_result(self, spark, rounds):
        docs = _docs(spark, self.TEXTS)
        seeds = spark.createDataFrame(
            self.SEEDS, "subj string, obj string"
        )
        out = snowball_bootstrap(
            docs, seeds, rounds=rounds, max_mid=2,
            min_support=2, min_conf_ppm=100_000,
        ).collect()
        return {(r.subj, r.obj): (r.round, r.conf_ppm) for r in out}

    def test_matches_python_twin(self, spark):
        got = self._spark_result(spark, rounds=3)
        want = _python_twin(
            self.TEXTS, self.SEEDS, rounds=3, max_mid=2,
            min_support=2, min_conf_ppm=100_000,
        )
        assert got == want
        assert len(got) > 0  # the fixture actually discovers something

    def test_rounds_grow_monotonically(self, spark):
        one = self._spark_result(spark, rounds=1)
        three = self._spark_result(spark, rounds=3)
        # round-1 discoveries identical, with identical confidences
        assert one == {k: v for k, v in three.items() if v[0] == 1}

    def test_partitioning_invariant(self, spark):
        docs = _docs(spark, self.TEXTS)
        seeds = spark.createDataFrame(
            self.SEEDS, "subj string, obj string"
        )
        a = snowball_bootstrap(
            docs.repartition(7), seeds, rounds=2, max_mid=2,
            min_support=2, min_conf_ppm=100_000,
        ).collect()
        b = snowball_bootstrap(
            docs.coalesce(1), seeds, rounds=2, max_mid=2,
            min_support=2, min_conf_ppm=100_000,
        ).collect()
        key = lambda r: (r.subj, r.obj)  # noqa: E731
        assert sorted(a, key=key) == sorted(b, key=key)

    def test_bad_rounds_rejected(self, spark):
        docs = _docs(spark, self.TEXTS)
        seeds = spark.createDataFrame(
            self.SEEDS, "subj string, obj string"
        )
        with pytest.raises(ValueError, match="rounds"):
            snowball_bootstrap(docs, seeds, rounds=0)
