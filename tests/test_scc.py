"""Strongly connected components: the FW-BW-trim min-label operator
(operators/graph.py:strongly_connected_components) against the iterative
Tarjan twin (scc_python) — exact dict equality, including the trim-only
(acyclic) and multi-SCC-chain regimes the outer loop must iterate for.
The cross-engine relational oracle is the kg_scc driver query
(mutual-reachability min over a recursive closure), exercised by
tests/test_oracle_crosscheck.py at sf0.001 like every oracle."""

import random

import pytest
from pyspark.sql import functions as F

from nlp_series_relation_extraction_spark.operators.graph import (
    scc_python,
    strongly_connected_components,
)


def _edges_df(spark, edges):
    return spark.createDataFrame(
        [(a, "p", b) for a, b in edges],
        "subj_entity_id long, predicate string, obj_entity_id long",
    )


def _run(spark, edges):
    got = {
        r["entity_id"]: r["component"]
        for r in strongly_connected_components(_edges_df(spark, edges)).collect()
    }
    want = scc_python(edges)
    assert got == want
    return got


def test_two_cycles_with_bridge_and_tail(spark):
    # 3-cycle {1,2,3} -> bridge -> 2-cycle {4,5} -> tail 6 -> 7
    got = _run(
        spark,
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 4), (5, 6), (6, 7)],
    )
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6, 7: 7}


def test_acyclic_graph_is_all_singletons(spark):
    # pure DAG: trim alone must settle everything (star + chain)
    edges = [(10, i) for i in range(1, 6)] + [(1, 20), (20, 21), (21, 22)]
    got = _run(spark, edges)
    assert set(got.values()) == set(got.keys())  # every vertex its own SCC


def test_self_loops_dropped_like_twin(spark):
    # vertex 9 appears ONLY in a self-loop -> absent from both outputs;
    # vertex 3's self-loop doesn't affect its SCC membership
    got = _run(spark, [(9, 9), (3, 3), (1, 2), (2, 1), (2, 3)])
    assert 9 not in got
    assert got == {1: 1, 2: 1, 3: 3}


def test_nested_scc_chain_needs_multiple_outer_rounds(spark):
    # chain of 2-cycles A -> B -> C where ids INCREASE along the chain:
    # round 1 settles the SCC of each label-region minimum; the chain
    # forces the outer loop to recompute labels after removal
    edges = []
    for k in range(5):
        a, b = 10 * k + 1, 10 * k + 2
        edges += [(a, b), (b, a)]
        if k < 4:
            edges.append((b, 10 * (k + 1) + 1))
    got = _run(spark, edges)
    for k in range(5):
        assert got[10 * k + 1] == got[10 * k + 2] == 10 * k + 1


@pytest.mark.parametrize("n,m,seed", [(40, 60, 1), (40, 120, 2), (60, 90, 3)])
def test_random_graphs_match_tarjan(spark, n, m, seed):
    rng = random.Random(seed)
    edges = list(
        {(rng.randrange(n), rng.randrange(n)) for _ in range(m)}
    )
    _run(spark, edges)


def test_component_is_min_id_and_partition(spark):
    rng = random.Random(7)
    edges = list({(rng.randrange(30), rng.randrange(30)) for _ in range(70)})
    got = _run(spark, edges)
    # component id is a member of its own component (min => fixed point)
    for v, c in got.items():
        assert got[c] == c
        assert c <= v
