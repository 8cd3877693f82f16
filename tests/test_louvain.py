"""Deterministic synchronous Louvain local moving (operators/graph.py:
louvain_local_move): identical-recursion python twin, planted-structure
behavior, coverage conventions, and partition invariance. The driver
query kg_louvain is rows-only (iterative); this twin is its oracle."""

from pyspark.sql import functions as F

from nlp_series_relation_extraction_spark.operators.graph import (
    label_propagation_communities,
    louvain_local_move,
    modularity_report,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        pairs, "subj_entity_id long, obj_entity_id long"
    )


def _mover(v, r):
    import hashlib

    h = int(hashlib.md5(str(v).encode()).hexdigest()[:7], 16)
    return h % 2 == r % 2


def _python_twin(pairs, rounds):
    """Same alternating-color strict-gain move recursion in python."""
    und = {
        (min(a, b), max(a, b)) for a, b in pairs if a != b
    }
    verts = sorted({x for a, b in pairs for x in (a, b)})
    adj = {v: [] for v in verts}
    for a, b in und:
        adj[a].append(b)
        adj[b].append(a)
    deg = {v: len(adj[v]) for v in verts}
    labels = {v: v for v in verts}
    m = len(und)
    if m == 0:
        return labels
    for r in range(rounds):
        tot = {}
        for v in verts:
            tot[labels[v]] = tot.get(labels[v], 0) + deg[v]
        new = {}
        for v in verts:
            kvd = {}
            for w in adj[v]:
                kvd[labels[w]] = kvd.get(labels[w], 0) + 1
            kvd.setdefault(labels[v], 0)
            best_d, best_gain, stay_gain = None, None, None
            for d in sorted(kvd):
                gain = 2 * m * kvd[d] - deg[v] * (
                    tot.get(d, 0) - (deg[v] if d == labels[v] else 0)
                )
                if d == labels[v]:
                    stay_gain = gain
                if best_gain is None or gain > best_gain:
                    best_d, best_gain = d, gain
            if _mover(v, r) and best_gain > stay_gain:
                new[v] = best_d
            else:
                new[v] = labels[v]
        labels = new
    return labels


def _spark_labels(spark, pairs, rounds):
    lab = louvain_local_move(_edges(spark, pairs), rounds=rounds)
    return {r.entity_id: r.community_id for r in lab.collect()}


def _two_cliques(n=5, bridge=True):
    pairs = []
    for base in (0, 100):
        ids = [base + i for i in range(n)]
        pairs += [(a, b) for a in ids for b in ids if a < b]
    if bridge:
        pairs.append((0, 100))
    return pairs


class TestLouvainLocalMove:
    def test_matches_python_twin_cliques(self, spark):
        pairs = _two_cliques()
        for rounds in (1, 3, 5):
            assert _spark_labels(spark, pairs, rounds) == _python_twin(
                pairs, rounds
            ), rounds

    def test_matches_python_twin_irregular(self, spark):
        # deterministic messy graph: path + chords + a star
        pairs = (
            [(i, i + 1) for i in range(10)]
            + [(0, 5), (2, 7), (3, 9)]
            + [(20, t) for t in (21, 22, 23, 24)]
            + [(9, 20)]
        )
        for rounds in (2, 4):
            assert _spark_labels(spark, pairs, rounds) == _python_twin(
                pairs, rounds
            ), rounds

    def test_finds_planted_cliques(self, spark):
        got = _spark_labels(spark, _two_cliques(), rounds=6)
        left = {got[i] for i in range(5)}
        right = {got[100 + i] for i in range(5)}
        assert len(left) == 1 and len(right) == 1
        assert left != right

    def test_beats_or_ties_lpa_on_modularity(self, spark):
        # the gain-driven mover must reach at least LPA's modularity on
        # the planted structure (both find it exactly here)
        edges = _edges(spark, _two_cliques())

        def q(labels):
            rows = modularity_report(edges, labels).collect()
            m = rows[0].m_edges
            return sum(int(r.q_num) for r in rows) / (4 * m * m)

        lv = q(louvain_local_move(edges, rounds=6))
        lpa = q(label_propagation_communities(edges, rounds=4))
        assert lv >= lpa
        assert lv > 0.4

    def test_self_loop_only_vertex_keeps_own_community(self, spark):
        # node 7 has only a self-loop (degree 0 in the simple graph):
        # it must stay covered, in its own community. The 1-2 pair
        # MERGES under the alternating-color schedule (exactly one of
        # them is the mover in any round — no symmetric swap).
        pairs = [(1, 2), (7, 7)]
        got = _spark_labels(spark, pairs, rounds=2)
        assert got[7] == 7
        assert got[1] == got[2]
        assert got == _python_twin(pairs, 2)

    def test_empty_graph_all_own_labels(self, spark):
        got = _spark_labels(spark, [(3, 3), (4, 4)], rounds=2)
        assert got == {3: 3, 4: 4}

    def test_partitioning_invariant(self, spark):
        pairs = _two_cliques(n=4)
        e = _edges(spark, pairs)
        a = louvain_local_move(e.repartition(9), rounds=3).collect()
        b = louvain_local_move(e.coalesce(1), rounds=3).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
