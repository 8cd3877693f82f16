"""SCC condensation + topological layering (operators/graph.py:
condensation) against the flat twin (condensation_python = Tarjan +
longest-path relaxation). The cross-engine oracle is kg_condensation
(recursive level relaxation over the closure-derived SCCs), exercised by
tests/test_oracle_crosscheck.py at sf0.001."""

import random

import pytest

from nlp_series_relation_extraction_spark.operators.graph import (
    condensation,
    condensation_python,
)


def _edges_df(spark, edges):
    return spark.createDataFrame(
        [(a, "p", b) for a, b in edges],
        "subj_entity_id long, predicate string, obj_entity_id long",
    )


def _run(spark, edges):
    got = {
        r["component"]: (r["n_vertices"], r["out_components"], r["depth"])
        for r in condensation(_edges_df(spark, edges)).collect()
    }
    want = condensation_python(edges)
    assert got == want
    return got


def test_chain_of_sccs_layers_in_order(spark):
    # 3-cycle -> 2-cycle -> chain tail: depths 0, 1, 2, 3
    got = _run(
        spark,
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 4), (5, 6), (6, 7)],
    )
    assert got == {1: (3, 1, 0), 4: (2, 1, 1), 6: (1, 1, 2), 7: (1, 0, 3)}


def test_dag_depth_is_longest_path_not_shortest(spark):
    # diamond with a long arm: 1->2->3->4 and 1->4 directly; depth(4)=3
    got = _run(spark, [(1, 2), (2, 3), (3, 4), (1, 4)])
    assert got[4] == (1, 0, 3)
    assert got[1] == (1, 2, 0)  # out_components counts DISTINCT successors


def test_parallel_vertex_edges_collapse_to_one_component_edge(spark):
    # two vertex-level edges between the same two SCCs -> out_components 1
    got = _run(spark, [(1, 2), (2, 1), (10, 11), (11, 10), (1, 10), (2, 11)])
    assert got[1] == (2, 1, 0)
    assert got[10] == (2, 0, 1)


@pytest.mark.parametrize("n,m,seed", [(30, 45, 11), (30, 90, 12), (50, 75, 13)])
def test_random_graphs_match_twin(spark, n, m, seed):
    rng = random.Random(seed)
    edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(m)})
    _run(spark, edges)


def test_precomputed_components_reused(spark):
    from nlp_series_relation_extraction_spark.operators.graph import (
        strongly_connected_components,
    )

    edges = [(1, 2), (2, 1), (2, 3)]
    df = _edges_df(spark, edges)
    comps = strongly_connected_components(df)
    got = {
        r["component"]: (r["n_vertices"], r["out_components"], r["depth"])
        for r in condensation(df, components=comps).collect()
    }
    assert got == condensation_python(edges)
