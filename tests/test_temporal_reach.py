"""Time-respecting earliest-arrival reachability (operators/graph.py:
temporal_reachability) against the flat fixpoint twin — exact arrival
equality, with the causality cases plain reachability gets wrong. The
cross-engine oracle is kg_temporal_reach (recursive (v, t) closure),
exercised by tests/test_oracle_crosscheck.py at sf0.001."""

import random

import pytest

from nlp_series_relation_extraction_spark.operators.graph import (
    temporal_reachability,
    temporal_reachability_python,
)


def _run(spark, tedges, seed_ids):
    edges = spark.createDataFrame(
        tedges, "subj_entity_id long, obj_entity_id long, ts long"
    )
    seeds = spark.createDataFrame(
        [(s,) for s in seed_ids], "entity_id long"
    )
    got = {
        r["entity_id"]: r["arrival"]
        for r in temporal_reachability(edges, seeds).collect()
    }
    want = temporal_reachability_python(tedges, seed_ids)
    assert got == want
    return got


def test_time_travel_is_forbidden(spark):
    # 1 -(t=2)-> 2 -(t=1)-> 3: vertex 3 is NOT time-respecting-reachable
    got = _run(spark, [(1, 2, 2), (2, 3, 1), (2, 4, 3)], [1])
    assert got == {1: -1, 2: 2, 4: 3}


def test_equal_timestamps_chain_within_one_instant(spark):
    got = _run(spark, [(1, 2, 5), (2, 3, 5), (3, 4, 4)], [1])
    assert got == {1: -1, 2: 5, 3: 5}


def test_earliest_arrival_prefers_slower_first_hop(spark):
    # fast first hop (t=9) closes the door on the t=3 second hop;
    # the t=1 first hop keeps it open: arrival(3) must be 3
    got = _run(spark, [(1, 2, 9), (1, 2, 1), (2, 3, 3)], [1])
    assert got[2] == 1 and got[3] == 3


def test_cycles_terminate_and_reenter_correctly(spark):
    got = _run(spark, [(1, 2, 1), (2, 1, 2), (2, 3, 5), (3, 2, 6)], [1])
    assert got == {1: -1, 2: 1, 3: 5}


def test_multiple_seeds_take_min(spark):
    got = _run(spark, [(1, 3, 4), (2, 3, 2)], [1, 2])
    assert got == {1: -1, 2: -1, 3: 2}


@pytest.mark.parametrize("n,m,seed", [(20, 50, 31), (30, 90, 32)])
def test_random_temporal_graphs_match_twin(spark, n, m, seed):
    rng = random.Random(seed)
    tedges = [
        (rng.randrange(n), rng.randrange(n), rng.randrange(10))
        for _ in range(m)
    ]
    tedges = [(u, v, t) for u, v, t in tedges if u != v]
    _run(spark, tedges, [0, 1])
