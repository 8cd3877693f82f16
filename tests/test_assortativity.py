"""Degree assortativity (operators/graph.py:degree_assortativity):
hand-computed extremes (star = -1, regular graph = 0 by the
zero-denominator convention), exact-Fraction floor parity on irregular
graphs, dedup conventions. kg_assortativity carries the bit-exact
HUGEINT DuckDB oracle (tests/test_oracle_crosscheck.py)."""

from fractions import Fraction

from nlp_series_relation_extraction_spark.operators.graph import (
    degree_assortativity,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        pairs, "subj_entity_id long, obj_entity_id long"
    )


def _twin_r_ppm(pairs):
    und = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    deg = {}
    for u, v in und:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    m = len(und)
    if m == 0:
        return 0
    s_jk = sum(deg[u] * deg[v] for u, v in und)
    s_sum = sum(deg[u] + deg[v] for u, v in und)
    s_sq = sum(deg[u] ** 2 + deg[v] ** 2 for u, v in und)
    num = 4 * m * s_jk - s_sum * s_sum
    den = 2 * m * s_sq - s_sum * s_sum
    if den == 0:
        return 0
    return (Fraction(num, den) * 10**6).__floor__()


class TestDegreeAssortativity:
    def test_star_is_perfectly_disassortative(self, spark):
        row = degree_assortativity(
            _edges(spark, [(0, 1), (0, 2), (0, 3)])
        ).collect()[0]
        assert row.m_edges == 3
        assert row.r_ppm == -1_000_000
        assert _twin_r_ppm([(0, 1), (0, 2), (0, 3)]) == -1_000_000

    def test_regular_graph_zero_by_convention(self, spark):
        # triangle: every endpoint degree 2 -> denominator 0 -> r_ppm 0
        row = degree_assortativity(
            _edges(spark, [(1, 2), (2, 3), (1, 3)])
        ).collect()[0]
        assert row.r_ppm == 0

    def test_matches_fraction_twin_on_irregular_graphs(self, spark):
        fixtures = [
            [(i, i + 1) for i in range(6)],                      # path
            [(0, i) for i in range(1, 5)] + [(1, 2), (3, 4)],     # star+chords
            [(i, (i * 3) % 7) for i in range(1, 7)],              # scramble
        ]
        for pairs in fixtures:
            row = degree_assortativity(_edges(spark, pairs)).collect()[0]
            assert row.r_ppm == _twin_r_ppm(pairs), pairs
            # the exact decimal sums agree with the twin's integers
            und = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
            assert row.m_edges == len(und)

    def test_self_loops_and_duplicates_collapsed(self, spark):
        a = degree_assortativity(
            _edges(spark, [(0, 1), (1, 0), (0, 0), (0, 1), (0, 2), (0, 3)])
        ).collect()[0]
        b = degree_assortativity(
            _edges(spark, [(0, 1), (0, 2), (0, 3)])
        ).collect()[0]
        assert a == b

    def test_empty_graph(self, spark):
        row = degree_assortativity(_edges(spark, [(5, 5)])).collect()[0]
        assert (row.m_edges, row.r_ppm) == (0, 0)
