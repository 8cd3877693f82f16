"""Core decomposition: the h-index fixpoint operator
(operators/graph.py:coreness, Lü 2016) against the CLASSIC min-degree
peeling twin (coreness_python, Batagelj-Zaversnik) — two different
algorithms that provably converge to the same integers, so exact dict
equality cross-validates both."""

import random

import pytest

from nlp_series_relation_extraction_spark.operators.graph import (
    coreness,
    coreness_python,
    k_core,
)


def _edges_df(spark, edges):
    return spark.createDataFrame(
        [(a, "p", b) for a, b in edges],
        "subj_entity_id long, predicate string, obj_entity_id long",
    )


def _run(spark, edges):
    got = {
        r["entity_id"]: r["coreness"]
        for r in coreness(_edges_df(spark, edges)).collect()
    }
    want = coreness_python(edges)
    assert got == want
    return got


def test_triangle_with_pendant(spark):
    got = _run(spark, [(1, 2), (2, 3), (3, 1), (3, 4)])
    assert got == {1: 2, 2: 2, 3: 2, 4: 1}


def test_clique_minus_chain(spark):
    k5 = list(range(5))
    edges = [(a, b) for i, a in enumerate(k5) for b in k5[i + 1 :]]
    edges += [(4, 10), (10, 11), (11, 12)]
    got = _run(spark, edges)
    for v in k5:
        assert got[v] == 4
    assert got[10] == got[11] == got[12] == 1


def test_h_index_needs_multiple_iterations(spark):
    # long path: degrees are 2 in the middle, but coreness is 1
    # everywhere — the h-index sequence must propagate the 1 inward
    # from the endpoints, one hop per iteration
    edges = [(i, i + 1) for i in range(12)]
    got = _run(spark, edges)
    assert set(got.values()) == {1}


@pytest.mark.parametrize("n,m,seed", [(30, 60, 51), (40, 160, 52), (25, 40, 53)])
def test_random_graphs_match_peeling_twin(spark, n, m, seed):
    rng = random.Random(seed)
    edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(m)})
    edges = [(a, b) for a, b in edges if a != b]
    _run(spark, edges)


def test_consistent_with_k_core_membership(spark):
    rng = random.Random(54)
    edges = list({(rng.randrange(25), rng.randrange(25)) for _ in range(70)})
    edges = [(a, b) for a, b in edges if a != b]
    got = _run(spark, edges)
    df = _edges_df(spark, edges)
    for k in (2, 3):
        members = {
            r["entity_id"] for r in k_core(df, k=k).collect()
        }
        assert members == {v for v, c in got.items() if c >= k}
