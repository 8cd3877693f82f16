"""Borůvka minimum spanning forest (operators/graph.py:boruvka_msf)
against the Kruskal twin (msf_python) under the shared (w, u, v) total
order — exact edge-SET equality (the order makes the MSF unique), exact
tree-membership equality, and the single-linkage property."""

import random

import pytest

from nlp_series_relation_extraction_spark.operators.graph import (
    boruvka_msf,
    msf_python,
)


def _edges_df(spark, wedges):
    return spark.createDataFrame(
        [(a, b, float(w)) for a, b, w in wedges],
        "subj_entity_id long, obj_entity_id long, weight double",
    )


def _run(spark, wedges):
    res = boruvka_msf(_edges_df(spark, wedges))
    got_edges = sorted(
        (r["u"], r["v"], r["w"]) for r in res["edges"].collect()
    )
    got_comp = {
        r["entity_id"]: r["component"]
        for r in res["components"].collect()
    }
    want = msf_python(wedges)
    assert got_edges == want["edges"]
    assert got_comp == want["components"]
    return got_edges, got_comp


def test_triangle_drops_heaviest_edge(spark):
    got, comp = _run(spark, [(1, 2, 1.0), (2, 3, 2.0), (1, 3, 3.0), (4, 5, 1.0)])
    assert got == [(1, 2, 1.0), (2, 3, 2.0), (4, 5, 1.0)]
    assert comp == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4}


def test_equal_weights_break_by_edge_identity(spark):
    # all weights equal: the (w, u, v) order still makes the MSF unique
    got, _ = _run(spark, [(1, 2, 5.0), (2, 3, 5.0), (1, 3, 5.0)])
    assert got == [(1, 2, 5.0), (1, 3, 5.0)]


def test_parallel_edges_and_orientation_collapse(spark):
    # (2,1) and (1,2) are the same undirected edge; cheapest weight wins
    got, _ = _run(spark, [(2, 1, 9.0), (1, 2, 1.0), (2, 3, 2.0)])
    assert got == [(1, 2, 1.0), (2, 3, 2.0)]


def test_chain_forces_multiple_boruvka_rounds(spark):
    # path with alternating weights: round 1 leaves several components
    wedges = [(i, i + 1, float(10 + (i % 3))) for i in range(1, 12)]
    _run(spark, wedges)


@pytest.mark.parametrize("n,m,seed", [(25, 40, 21), (25, 80, 22), (40, 60, 23)])
def test_random_graphs_match_kruskal(spark, n, m, seed):
    rng = random.Random(seed)
    seen = set()
    wedges = []
    for _ in range(m):
        a, b = rng.randrange(n), rng.randrange(n)
        if a == b:
            continue
        u, v = min(a, b), max(a, b)
        if (u, v) in seen:
            continue
        seen.add((u, v))
        wedges.append((a, b, float(rng.randrange(1, 15))))
    edges, comp = _run(spark, wedges)
    # forest invariants: |edges| = |V| - |trees|
    nv = len(comp)
    ntrees = len(set(comp.values()))
    assert len(edges) == nv - ntrees


def test_single_linkage_property(spark):
    # cutting the MSF at t yields the same clusters as thresholding the
    # full graph at t (single linkage): check on a two-blob graph
    blob1 = [(1, 2, 0.1), (2, 3, 0.2), (1, 3, 0.3)]
    blob2 = [(10, 11, 0.1), (11, 12, 0.15)]
    bridge = [(3, 10, 5.0)]
    edges, comp = _run(spark, blob1 + blob2 + bridge)
    t = 1.0
    kept = [(u, v) for u, v, w in edges if w < t]
    # union-find over kept MSF edges
    par = {x: x for x in comp}

    def find(x):
        while par[x] != x:
            par[x] = par[par[x]]
            x = par[x]
        return x

    for u, v in kept:
        par[find(u)] = find(v)
    clusters = {x: find(x) for x in par}
    assert len(set(clusters.values())) == 2
    assert clusters[1] == clusters[3] and clusters[10] == clusters[12]
    assert clusters[1] != clusters[10]
