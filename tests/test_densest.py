"""Densest subgraph by batched peeling (operators/graph.py:
densest_subgraph — Bahmani 2012 (2+2eps)-approx) against the flat twin:
bit-identical vertex sets (all density math is exact integer
cross-multiplication), planted-clique recovery, and the approximation
floor on random graphs."""

import random

import pytest

from nlp_series_relation_extraction_spark.operators.graph import (
    densest_subgraph,
    densest_subgraph_python,
)


def _edges_df(spark, edges):
    return spark.createDataFrame(
        [(a, "p", b) for a, b in edges],
        "subj_entity_id long, predicate string, obj_entity_id long",
    )


def _run(spark, edges, eps_pct=10):
    rows = densest_subgraph(_edges_df(spark, edges), eps_pct=eps_pct).collect()
    want = densest_subgraph_python(edges, eps_pct=eps_pct)
    got_v = sorted(r["entity_id"] for r in rows)
    assert got_v == want["vertices"]
    if rows:
        assert rows[0]["n_vertices"] == want["n_vertices"]
        assert rows[0]["n_edges"] == want["n_edges"]
    return want


def test_planted_clique_in_sparse_background(spark):
    rng = random.Random(5)
    clique = list(range(100, 108))  # K8: density (V-1)/2 = 3.5
    edges = [(a, b) for i, a in enumerate(clique) for b in clique[i + 1 :]]
    # sparse background tree + a few chords, attached to the clique
    for i in range(1, 60):
        edges.append((i, rng.randrange(i)))
    edges.append((0, 100))
    want = _run(spark, edges)
    assert set(clique) <= set(want["vertices"])
    # background tree vertices (density ~1) must be peeled away
    assert len(want["vertices"]) < 20


def test_single_edge_graph(spark):
    want = _run(spark, [(1, 2)])
    assert want == {"vertices": [1, 2], "n_vertices": 2, "n_edges": 1}


def test_two_cliques_picks_denser(spark):
    k6 = list(range(10, 16))
    k4 = list(range(30, 34))
    edges = [(a, b) for i, a in enumerate(k6) for b in k6[i + 1 :]]
    edges += [(a, b) for i, a in enumerate(k4) for b in k4[i + 1 :]]
    want = _run(spark, edges)
    assert want["vertices"] == k6


@pytest.mark.parametrize("n,m,seed", [(30, 60, 41), (40, 150, 42)])
def test_random_graphs_match_twin_and_approx_floor(spark, n, m, seed):
    rng = random.Random(seed)
    edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(m)})
    edges = [(a, b) for a, b in edges if a != b]
    want = _run(spark, edges)
    # (2+2eps)-approx sanity: density of the found subgraph is at least
    # the whole-graph density / (2 + 2*0.1) -- a weak but real floor
    und = {tuple(sorted(e)) for e in edges}
    verts = {x for e in und for x in e}
    whole = len(und) / len(verts)
    got = want["n_edges"] / want["n_vertices"]
    assert got >= whole / 2.2 - 1e-9


def test_eps_zero_batch_peel_semantics(spark):
    # triangle + pendant: whole graph and bare triangle tie at density
    # 1.0, and the batch peel at eps=0 removes {1,2,4} in one step (all
    # at/below average degree 2), so the FIRST snapshot (whole graph)
    # is the kept maximum — ties prefer the earlier, larger subgraph
    edges = [(1, 2), (2, 3), (3, 1), (3, 4)]
    want = _run(spark, edges, eps_pct=0)
    assert want["vertices"] == [1, 2, 3, 4]
    assert want["n_edges"] == 4 and want["n_vertices"] == 4
    # a heavier clique against the same pendant IS strictly denser and
    # must be isolated by the peel
    k5 = list(range(20, 25))
    edges2 = [(a, b) for i, a in enumerate(k5) for b in k5[i + 1 :]] + [
        (24, 40)
    ]
    want2 = _run(spark, edges2, eps_pct=0)
    assert want2["vertices"] == k5
    assert want2["n_edges"] == 10
