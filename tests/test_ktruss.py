"""k_truss (operators/graph.py): Cohen 2008 truss peeling — hand-computed
graphs and exact spark==python-twin equality."""

import random

import pytest

from nlp_series_relation_extraction_spark.operators.graph import (
    k_truss,
    k_truss_python,
)

E = "subj_entity_id long, obj_entity_id long"


def _spark_truss(spark, edges, k):
    df = k_truss(spark.createDataFrame(edges, E), k)
    return {(r.u, r.v): r.support for r in df.collect()}


def test_k4_is_a_4_truss(spark):
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    got = _spark_truss(spark, k4, 4)
    # every edge of K4 sits in exactly 2 triangles
    assert got == {e: 2 for e in k4}
    assert _spark_truss(spark, k4, 5) == {}


def test_triangle_survives_3_truss_bridge_does_not(spark):
    # two triangles joined by a bridge: the bridge has support 0
    edges = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5), (3, 5)]
    got = _spark_truss(spark, edges, 3)
    assert set(got) == {(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5)}
    assert all(s == 1 for s in got.values())


def test_cascading_peel(spark):
    # K4 plus a pendant triangle sharing one edge: at k=4 the pendant
    # triangle's edges die (support 1), K4 survives with support 2
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges = k4 + [(0, 9), (1, 9)]  # (0,1,9) pendant triangle
    got = _spark_truss(spark, edges, 4)
    assert got == {e: 2 for e in k4}


def test_support_is_inside_the_truss(spark):
    # (0,1) sits in 2 triangles of the full graph, but only 1 survives
    # the 3-truss (vertex 8's other edge is triangle-free and peels,
    # taking the (0,1,8) triangle with it... it doesn't: (0,8),(1,8)
    # have support 1 >= 1. Use k=4 where the pendant dies instead.)
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges = k4 + [(0, 8), (1, 8)]
    got4 = _spark_truss(spark, edges, 4)
    assert got4[(0, 1)] == 2  # pendant triangle gone, K4 support stays 2
    got3 = _spark_truss(spark, edges, 3)
    assert got3[(0, 1)] == 3  # all three triangles alive in the 3-truss


def test_spark_equals_python_twin_random_graph(spark):
    rng = random.Random(7)
    edges = list(
        {
            (min(a, b), max(a, b))
            for a, b in (
                (rng.randrange(30), rng.randrange(30)) for _ in range(180)
            )
            if a != b
        }
    )
    for k in (3, 4, 5):
        assert _spark_truss(spark, edges, k) == k_truss_python(edges, k)


def test_directed_duplicates_and_self_loops_collapse(spark):
    edges = [(0, 1), (1, 0), (1, 2), (2, 0), (0, 0), (1, 2)]
    got = _spark_truss(spark, edges, 3)
    assert got == {(0, 1): 1, (1, 2): 1, (0, 2): 1}


def test_k_validation(spark):
    with pytest.raises(ValueError):
        k_truss(spark.createDataFrame([(0, 1)], E), 2)
