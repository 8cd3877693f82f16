"""Newman modularity decomposition (operators/graph.py:modularity_report):
hand-computed fixtures, exact-Fraction floor parity for q_ppm, membership
contract, and the LPA composition behavior check. The driver query
`kg_modularity` is additionally bit-checked against its DuckDB oracle by
tests/test_oracle_crosscheck.py."""

from fractions import Fraction

from pyspark.sql import functions as F

from nlp_series_relation_extraction_spark.operators.graph import (
    label_propagation_communities,
    modularity_report,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        pairs, "subj_entity_id long, obj_entity_id long"
    )


def _comms(spark, mapping):
    return spark.createDataFrame(
        list(mapping.items()), "entity_id long, community_id long"
    )


def _rows(df):
    return {r.community_id: r for r in df.collect()}


class TestModularityReport:
    def test_two_triangles_bridge_hand_computed(self, spark):
        # classic fixture: triangles {1,2,3} and {4,5,6} joined by (3,4).
        # m=7; each triangle community: e_c=3, d_c=7 ->
        # Q_c = 3/7 - (7/14)^2 = 3/7 - 1/4; Q = 2*(3/7 - 1/4) = 5/14
        edges = _edges(
            spark,
            [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        )
        comms = _comms(spark, {1: 10, 2: 10, 3: 10, 4: 20, 5: 20, 6: 20})
        got = _rows(modularity_report(edges, comms))
        assert set(got) == {10, 20}
        for c in (10, 20):
            r = got[c]
            assert (r.n_nodes, r.intra_edges, r.degree_sum, r.m_edges) == (
                3, 3, 7, 7,
            )
            # q_num = 4*7*3 - 49 = 35; Q_c = 35/196 = 5/28
            assert int(r.q_num) == 35
            assert r.q_ppm == (Fraction(35, 196) * 10**6).__floor__()
        total_q = sum(int(r.q_num) for r in got.values())
        assert Fraction(total_q, 4 * 7 * 7) == Fraction(5, 14)

    def test_negative_q_floor_matches_fraction(self, spark):
        # a community holding no intra edges gets a NEGATIVE Q_c whose
        # ppm floor must round toward -inf (the shifted-division path)
        edges = _edges(spark, [(1, 2), (3, 4), (1, 3)])
        comms = _comms(spark, {1: 0, 2: 1, 3: 0, 4: 1})
        got = _rows(modularity_report(edges, comms))
        for c, r in got.items():
            want = (
                Fraction(int(r.q_num), 4 * r.m_edges * r.m_edges) * 10**6
            ).__floor__()
            assert r.q_ppm == want, (c, r.q_ppm, want)
        assert any(r.q_ppm < 0 for r in got.values())

    def test_unmapped_endpoints_dropped_before_m(self, spark):
        # node 9 has no community: its edge must not count toward m,
        # degrees, or intra — the metric is over the induced subgraph
        edges = _edges(spark, [(1, 2), (2, 9)])
        comms = _comms(spark, {1: 0, 2: 0})
        got = _rows(modularity_report(edges, comms))
        assert set(got) == {0}
        r = got[0]
        assert (r.m_edges, r.intra_edges, r.degree_sum) == (1, 1, 2)
        # one community holding the whole graph: Q = 0
        assert int(r.q_num) == 0 and r.q_ppm == 0

    def test_member_with_no_edges_still_counted(self, spark):
        edges = _edges(spark, [(1, 2)])
        comms = _comms(spark, {1: 0, 2: 0, 3: 7})
        got = _rows(modularity_report(edges, comms))
        r = got[7]
        assert (r.n_nodes, r.intra_edges, r.degree_sum, r.q_ppm) == (
            1, 0, 0, 0,
        )

    def test_self_loops_and_duplicates_collapsed(self, spark):
        edges = _edges(spark, [(1, 2), (2, 1), (1, 2), (1, 1)])
        comms = _comms(spark, {1: 0, 2: 0})
        got = _rows(modularity_report(edges, comms))
        assert got[0].m_edges == 1 and got[0].intra_edges == 1

    def test_empty_induced_graph_defines_zero(self, spark):
        # all edges touch unmapped nodes -> m = 0 -> q_ppm defined as 0
        edges = _edges(spark, [(8, 9)])
        comms = _comms(spark, {1: 0})
        got = _rows(modularity_report(edges, comms))
        assert got[0].m_edges == 0 and got[0].q_ppm == 0

    def test_lpa_partition_beats_hash_partition(self, spark):
        # two planted 5-cliques + one bridge: LPA's communities must
        # score strictly higher total modularity than a parity split
        pairs = []
        for base in (0, 10):
            ids = [base + i for i in range(5)]
            pairs += [(a, b) for a in ids for b in ids if a < b]
        pairs.append((0, 10))
        edges = _edges(spark, pairs)
        lpa = label_propagation_communities(edges, rounds=5).select(
            "entity_id", "community_id"
        )
        nodes = [r for base in (0, 10) for r in range(base, base + 5)]
        parity = _comms(spark, {n: n % 2 for n in nodes})

        def total_q(comms):
            rows = modularity_report(edges, comms).collect()
            m = rows[0].m_edges
            return Fraction(sum(int(r.q_num) for r in rows), 4 * m * m)

        assert total_q(lpa) > total_q(parity)
        assert total_q(lpa) > 0
