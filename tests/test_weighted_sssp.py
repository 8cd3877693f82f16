"""Hop-bounded weighted SSSP (operators/graph.py:weighted_sssp,
Bellman-Ford relaxation) against the hop-DP twin — exact distances,
including the cases hop-BFS gets wrong (cheap long path beats expensive
short path) and the hop bound's own semantics."""

import random

import pytest

from nlp_series_relation_extraction_spark.operators.graph import (
    weighted_sssp,
    weighted_sssp_python,
)


def _run(spark, wedges, seed_ids, max_hops=6):
    edges = spark.createDataFrame(
        wedges, "subj_entity_id long, obj_entity_id long, cost long"
    )
    seeds = spark.createDataFrame([(s,) for s in seed_ids], "entity_id long")
    got = {
        r["entity_id"]: r["dist"]
        for r in weighted_sssp(
            edges, seeds, cost_col="cost", max_hops=max_hops
        ).collect()
    }
    want = weighted_sssp_python(wedges, seed_ids, max_hops=max_hops)
    assert got == want
    return got


def test_cheap_long_path_beats_expensive_direct_edge(spark):
    got = _run(spark, [(1, 2, 5), (1, 3, 1), (3, 2, 1), (2, 4, 1)], [1])
    assert got == {1: 0, 2: 2, 3: 1, 4: 3}


def test_hop_bound_cuts_the_cheap_path(spark):
    # cheap path needs 3 hops; with max_hops=2 only the expensive
    # direct edge fits
    wedges = [(1, 2, 10), (1, 3, 1), (3, 4, 1), (4, 2, 1)]
    assert _run(spark, wedges, [1], max_hops=3)[2] == 3
    assert _run(spark, wedges, [1], max_hops=2)[2] == 10


def test_multiple_seeds_take_cheapest_origin(spark):
    got = _run(spark, [(1, 5, 9), (2, 5, 3)], [1, 2])
    assert got[5] == 3


def test_cycles_do_not_loop(spark):
    got = _run(spark, [(1, 2, 1), (2, 1, 1), (2, 3, 1)], [1])
    assert got == {1: 0, 2: 1, 3: 2}


@pytest.mark.parametrize("n,m,seed", [(20, 60, 61), (30, 100, 62)])
def test_random_graphs_match_twin(spark, n, m, seed):
    rng = random.Random(seed)
    wedges = [
        (rng.randrange(n), rng.randrange(n), rng.randrange(1, 8))
        for _ in range(m)
    ]
    wedges = [(u, v, w) for u, v, w in wedges if u != v]
    _run(spark, wedges, [0, 1], max_hops=5)
