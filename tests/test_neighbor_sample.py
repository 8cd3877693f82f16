"""GraphSAGE-style hop-sampled neighborhoods (operators/graph.py:
sample_neighborhoods): fan-out caps, without-replacement sampling,
md5-determinism across partitionings and salts, hop-frontier chaining,
and input validation. Cross-engine bit-parity is pinned by the
kg_neighbor_sample DuckDB oracle (tests/test_oracle_crosscheck.py)."""

import pytest
from pyspark.sql import functions as F

from nlp_series_relation_extraction_spark.operators.graph import (
    sample_neighborhoods,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        pairs, "subj_entity_id long, obj_entity_id long"
    )


def _seeds(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "seed_id long")


def _star(center, leaves):
    return [(center, leaf) for leaf in leaves]


class TestSampleNeighborhoods:
    def test_fanout_caps_and_hop_chaining(self, spark):
        # star of 6 leaves around 0; each leaf also touches a tail node
        pairs = _star(0, [1, 2, 3, 4, 5, 6]) + [
            (leaf, 100 + leaf) for leaf in [1, 2, 3, 4, 5, 6]
        ]
        out = sample_neighborhoods(
            _edges(spark, pairs), _seeds(spark, [0]), fanouts=(3, 2)
        ).collect()
        h1 = [r for r in out if r.hop == 1]
        h2 = [r for r in out if r.hop == 2]
        assert len(h1) == 3 and all(r.src == 0 for r in h1)
        assert len({r.dst for r in h1}) == 3  # without replacement
        # hop 2 sources are exactly the hop-1 sample
        assert {r.src for r in h2} <= {r.dst for r in h1}
        # each hop-2 source keeps at most 2 neighbors
        from collections import Counter

        per_src = Counter(r.src for r in h2)
        assert all(c <= 2 for c in per_src.values())

    def test_deterministic_and_partitioning_invariant(self, spark):
        pairs = [(i, j) for i in range(6) for j in range(i + 1, 6)]
        e = _edges(spark, pairs)
        s = _seeds(spark, [0, 3])
        a = sorted(map(tuple, sample_neighborhoods(
            e.repartition(7), s, fanouts=(2, 2)
        ).collect()))
        b = sorted(map(tuple, sample_neighborhoods(
            e.coalesce(1), s, fanouts=(2, 2)
        ).collect()))
        assert a == b and len(a) > 0

    def test_salt_changes_sample_but_not_shape(self, spark):
        pairs = _star(0, list(range(1, 10)))
        e = _edges(spark, pairs)
        s = _seeds(spark, [0])
        a = {r.dst for r in sample_neighborhoods(
            e, s, fanouts=(4,), salt="s"
        ).collect()}
        b = {r.dst for r in sample_neighborhoods(
            e, s, fanouts=(4,), salt="t"
        ).collect()}
        assert len(a) == 4 and len(b) == 4
        assert a != b  # 9-choose-4 collision astronomically unlikely

    def test_seeds_sample_independently(self, spark):
        # both seeds touch hub 0's big neighborhood at hop 2; their
        # hop-2 draws from the hub must differ (seed is in the hash)
        pairs = _star(0, list(range(1, 12))) + [(50, 0), (51, 0)]
        out = sample_neighborhoods(
            _edges(spark, pairs), _seeds(spark, [50, 51]), fanouts=(1, 3)
        ).collect()
        draws = {}
        for r in out:
            if r.hop == 2 and r.src == 0:
                draws.setdefault(r.seed_id, set()).add(r.dst)
        assert set(draws) == {50, 51}
        assert draws[50] != draws[51]

    def test_fanout_larger_than_degree_takes_all(self, spark):
        out = sample_neighborhoods(
            _edges(spark, _star(0, [1, 2])), _seeds(spark, [0]),
            fanouts=(5,),
        ).collect()
        assert {r.dst for r in out} == {1, 2}

    def test_absent_seed_contributes_nothing(self, spark):
        out = sample_neighborhoods(
            _edges(spark, [(1, 2)]), _seeds(spark, [99]), fanouts=(2,)
        ).collect()
        assert out == []

    def test_bad_fanouts_rejected(self, spark):
        e = _edges(spark, [(1, 2)])
        s = _seeds(spark, [1])
        with pytest.raises(ValueError, match="fanouts"):
            sample_neighborhoods(e, s, fanouts=())
        with pytest.raises(ValueError, match="fanouts"):
            sample_neighborhoods(e, s, fanouts=(2, 0))
