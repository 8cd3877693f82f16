"""Global clustering coefficient and edge reciprocity (operators/
graph.py:global_clustering, reciprocity): hand-computed extremes and
conventions. Both driver queries carry bit-exact DuckDB oracles
(tests/test_oracle_crosscheck.py)."""

from nlp_series_relation_extraction_spark.operators.graph import (
    global_clustering,
    reciprocity,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        pairs, "subj_entity_id long, obj_entity_id long"
    )


class TestGlobalClustering:
    def test_triangle_is_fully_transitive(self, spark):
        row = global_clustering(
            _edges(spark, [(1, 2), (2, 3), (1, 3)])
        ).collect()[0]
        assert (row.n_triangles, int(row.n_wedges)) == (1, 3)
        assert row.transitivity_ppm == 1_000_000

    def test_path_has_wedges_but_no_triangles(self, spark):
        row = global_clustering(
            _edges(spark, [(1, 2), (2, 3), (3, 4)])
        ).collect()[0]
        assert row.n_triangles == 0
        assert int(row.n_wedges) == 2
        assert row.transitivity_ppm == 0

    def test_kite_hand_computed(self, spark):
        # triangle 1-2-3 plus tail 3-4: wedges = 1+1+3+0 = 5,
        # transitivity = 3*1/5 = 0.6
        row = global_clustering(
            _edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
        ).collect()[0]
        assert (row.n_triangles, int(row.n_wedges)) == (1, 5)
        assert row.transitivity_ppm == 600_000

    def test_wedge_free_matching_defined_zero(self, spark):
        row = global_clustering(
            _edges(spark, [(1, 2), (3, 4)])
        ).collect()[0]
        assert int(row.n_wedges) == 0 and row.transitivity_ppm == 0


class TestReciprocity:
    def test_pure_two_cycles(self, spark):
        row = reciprocity(
            _edges(spark, [(1, 2), (2, 1), (3, 4), (4, 3)])
        ).collect()[0]
        assert (row.n_directed_edges, row.n_reciprocal) == (4, 4)
        assert row.reciprocity_ppm == 1_000_000

    def test_dag_is_zero(self, spark):
        row = reciprocity(
            _edges(spark, [(1, 2), (2, 3), (1, 3)])
        ).collect()[0]
        assert (row.n_reciprocal, row.reciprocity_ppm) == (0, 0)

    def test_mixed_and_duplicates(self, spark):
        # one reciprocal pair of the three distinct edges; duplicates
        # and self-loops collapse/drop
        row = reciprocity(
            _edges(spark, [(1, 2), (2, 1), (2, 1), (1, 3), (5, 5)])
        ).collect()[0]
        assert (row.n_directed_edges, row.n_reciprocal) == (3, 2)
        assert row.reciprocity_ppm == 666_666

    def test_empty(self, spark):
        row = reciprocity(_edges(spark, [(7, 7)])).collect()[0]
        assert (row.n_directed_edges, row.reciprocity_ppm) == (0, 0)
