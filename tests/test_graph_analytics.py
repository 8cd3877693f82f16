"""Graph analytics over the canonical edge table: degree stats (relational,
also driver-oracled) and PageRank (iterative — pinned here against a numpy
power-iteration twin, since float ranks carry no SQL oracle)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from nlp_series_relation_extraction_spark.operators.graph import (
    degree_stats,
    pagerank,
)


def _edges(spark, rows):
    return spark.createDataFrame(
        [(s, "p", o, n, "c0", 0) for s, o, n in rows],
        "subj_entity_id long, predicate string, obj_entity_id long, "
        "n_evidence long, first_conv_id string, first_turn_idx int",
    )


def test_degree_stats_full_outer_zeros(spark):
    # 1 -> 2 (3 evidence), 1 -> 3 (1), 2 -> 3 (2): 3 is sink, 1 is source
    out = {
        r.entity_id: (r.out_degree, r.in_degree, r.out_evidence, r.in_evidence)
        for r in degree_stats(
            _edges(spark, [(1, 2, 3), (1, 3, 1), (2, 3, 2)])
        ).collect()
    }
    assert out[1] == (2, 0, 4, 0)  # pure source: in side zero-filled
    assert out[2] == (1, 1, 2, 3)
    assert out[3] == (0, 2, 0, 3)  # pure sink: out side zero-filled


def _numpy_pagerank(edges, damping=0.85, iters=10):
    nodes = sorted({s for s, _ in edges} | {o for _, o in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = {v: 0 for v in nodes}
    for s, _ in set(edges):
        out[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dang = sum(r[idx[v]] for v in nodes if out[v] == 0)
        contrib = np.zeros(n)
        for s, o in set(edges):
            contrib[idx[o]] += r[idx[s]] / out[s]
        r = (1.0 - damping) / n + damping * (contrib + dang / n)
    return {v: r[idx[v]] for v in nodes}


@pytest.mark.parametrize(
    "edge_list",
    [
        # chain + hub: 4 receives from everyone, 5 dangles
        [(1, 4), (2, 4), (3, 4), (4, 5), (1, 2), (2, 3)],
        # cycle with a dangling spur
        [(1, 2), (2, 3), (3, 1), (3, 4)],
    ],
)
def test_pagerank_matches_numpy_twin(spark, edge_list):
    got = {
        r.entity_id: r.rank
        for r in pagerank(
            _edges(spark, [(s, o, 1) for s, o in edge_list]), iters=10
        ).collect()
    }
    want = _numpy_pagerank(edge_list, iters=10)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12), v
    # teleport + dangling redistribution conserve total mass
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_hub_ranks_highest(spark):
    star = [(s, 9, 1) for s in range(1, 9)]  # everyone links to 9
    got = {
        r.entity_id: r.rank for r in pagerank(_edges(spark, star)).collect()
    }
    assert got[9] == max(got.values())
    assert got[9] > 5 * got[1]


def test_pagerank_duplicate_predicate_edges_collapse(spark):
    # the same (s, o) via two predicates must count once (distinct graph)
    e = spark.createDataFrame(
        [(1, "a", 2, 1, "c", 0), (1, "b", 2, 1, "c", 0), (2, "a", 1, 1, "c", 0)],
        "subj_entity_id long, predicate string, obj_entity_id long, "
        "n_evidence long, first_conv_id string, first_turn_idx int",
    )
    got = {r.entity_id: r.rank for r in pagerank(e, iters=10).collect()}
    want = _numpy_pagerank([(1, 2), (2, 1)], iters=10)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)


def test_pagerank_empty_graph(spark):
    empty = _edges(spark, []).where(F.lit(False))
    assert pagerank(empty).count() == 0


def test_two_hop_paths_planted(spark):
    from nlp_series_relation_extraction_spark.operators.graph import (
        two_hop_paths,
    )

    e = spark.createDataFrame(
        [(1, "p", 2, 1, "c", 0), (2, "q", 3, 1, "c", 0), (2, "q", 4, 1, "c", 0),
         (5, "r", 6, 1, "c", 0)],
        "subj_entity_id long, predicate string, obj_entity_id long, "
        "n_evidence long, first_conv_id string, first_turn_idx int",
    )
    got = sorted(
        (r.a, r.p1, r.b, r.p2, r.c) for r in two_hop_paths(e).collect()
    )
    assert got == [(1, "p", 2, "q", 3), (1, "p", 2, "q", 4)]


def _tri_edges(spark, pairs):
    return spark.createDataFrame(
        [(u, "p", v, 1, "c", 0) for u, v in pairs],
        "subj_entity_id long, predicate string, obj_entity_id long, "
        "n_evidence long, first_conv_id string, first_turn_idx int",
    )


def test_triangle_count_planted(spark):
    from itertools import combinations

    from nlp_series_relation_extraction_spark.operators.graph import (
        triangle_count,
    )

    k4 = list(combinations(range(4), 2))  # complete graph on 4: C(4,3)=4
    assert triangle_count(_tri_edges(spark, k4)).collect()[0].n_triangles == 4
    square = [(1, 2), (2, 3), (3, 4), (4, 1)]  # cycle, no chord
    assert (
        triangle_count(_tri_edges(spark, square)).collect()[0].n_triangles
        == 0
    )
    # direction / duplicates / self-loops must not change the count
    messy = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (2, 3)]
    assert (
        triangle_count(_tri_edges(spark, messy)).collect()[0].n_triangles
        == 1
    )


def test_triangle_count_matches_brute_force_random(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    n = 30
    pairs = {
        (int(a), int(b))
        for a, b in rng.integers(0, n, size=(160, 2))
        if a != b
    }
    und = {(min(a, b), max(a, b)) for a, b in pairs}
    brute = sum(
        1
        for u, v in und
        for w in range(n)
        if w > v and (v, w) in und and (u, w) in und
    )
    from nlp_series_relation_extraction_spark.operators.graph import (
        triangle_count,
    )

    got = triangle_count(_tri_edges(spark, sorted(pairs)))
    assert got.collect()[0].n_triangles == brute


def test_dense_index_is_global_sorted_rank_any_partitioning(spark):
    from nlp_series_relation_extraction_spark.operators.graph import (
        dense_index,
    )

    vals = [9, 3, 77, 41, 5, 100, 2, 64, 8, 13]
    df = spark.createDataFrame([(v,) for v in vals], "eid long")
    want = {v: i for i, v in enumerate(sorted(vals))}
    for nparts in (1, 3, 8):
        got = {
            r.eid: r.ent_idx
            for r in dense_index(df, "eid", num_partitions=nparts).collect()
        }
        assert got == want  # independent of partition boundaries


def test_predicate_schema_functionality(spark):
    from nlp_series_relation_extraction_spark.operators.graph import (
        predicate_schema,
    )

    edges = spark.createDataFrame(
        [
            # born_in: one object per subject -> functionality 1e6
            (1, "born_in", 10, 1),
            (2, "born_in", 11, 1),
            (3, "born_in", 10, 1),
            # works_for: subject 1 has two employers
            (1, "works_for", 20, 1),
            (1, "works_for", 21, 1),
        ],
        "subj_entity_id long, predicate string, obj_entity_id long,"
        " n_evidence long",
    )
    got = {r.predicate: r for r in predicate_schema(edges).collect()}
    b = got["born_in"]
    assert (b.n_triples, b.n_subjects, b.n_objects) == (3, 3, 2)
    assert b.functionality_ppm == 1_000_000
    assert b.inverse_functionality_ppm == 666_666
    w = got["works_for"]
    assert w.functionality_ppm == 500_000


def test_corrupt_triples_shape_and_determinism(spark):
    from nlp_series_relation_extraction_spark.operators.graph import (
        corrupt_triples,
    )

    edges = spark.createDataFrame(
        [(s, "p", o, 1) for s, o in [(1, 2), (1, 3), (4, 2), (5, 6)]],
        "subj_entity_id long, predicate string, obj_entity_id long,"
        " n_evidence long",
    )
    out = corrupt_triples(edges, n_neg=3)
    rows = out.collect()
    assert len(rows) == 4 * 3  # exactly n_pos * n_neg, collisions kept
    ents = {1, 2, 3, 4, 5, 6}
    for r in rows:
        assert r.neg_obj in ents
        assert r.is_false_negative == (r.neg_obj == r.true_obj)
    again = corrupt_triples(edges, n_neg=3).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def _lpa_twin(edge_list, rounds=5):
    # exact python twin of label_propagation_communities: synchronous,
    # most-frequent neighbor label, ties -> smallest label
    from collections import Counter, defaultdict

    adj = defaultdict(set)
    for a, b in edge_list:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    labels = {v: v for v in adj}
    for _ in range(rounds):
        new = {}
        for v in adj:
            c = Counter(labels[n] for n in adj[v])
            top = max(c.values())
            new[v] = min(l for l, k in c.items() if k == top)
        labels = new
    return labels


def _two_cluster_edges():
    # two 5-cliques joined by a single bridge edge
    left = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    right = [(a, b) for a in range(10, 15) for b in range(a + 1, 15)]
    return left + right + [(4, 10)]


def test_lpa_matches_python_twin_and_splits_clusters(spark):
    from nlp_series_relation_extraction_spark.operators.graph import (
        label_propagation_communities,
    )

    edges = _two_cluster_edges()
    df = spark.createDataFrame(
        [(a, "p", b, 1) for a, b in edges],
        "subj_entity_id long, predicate string, obj_entity_id long,"
        " n_evidence long",
    )
    got = {
        r.entity_id: r.community_id
        for r in label_propagation_communities(df, rounds=5).collect()
    }
    assert got == _lpa_twin(edges, rounds=5)
    # density clustering: the bridge does NOT merge the cliques (connected
    # components would assign one id to all 10 vertices)
    left_labels = {got[v] for v in range(5)}
    right_labels = {got[v] for v in range(10, 15)}
    assert len(left_labels) == 1 and len(right_labels) == 1
    assert left_labels != right_labels


def test_lpa_covers_self_loop_only_vertices(spark):
    # a vertex whose only edges are self-loops must still get a community
    # row (its own id), consistent with pagerank/connected_components
    from nlp_series_relation_extraction_spark.operators.graph import (
        label_propagation_communities,
    )

    edges = _two_cluster_edges()
    rows = [(a, "p", b, 1) for a, b in edges] + [(99, "p", 99, 1)]
    df = spark.createDataFrame(
        rows,
        "subj_entity_id long, predicate string, obj_entity_id long,"
        " n_evidence long",
    )
    got = {
        r.entity_id: r.community_id
        for r in label_propagation_communities(df, rounds=3).collect()
    }
    assert got[99] == 99
    # connected vertices unchanged by the lone self-loop vertex
    expected = _lpa_twin(edges, rounds=3)
    assert {v: got[v] for v in expected} == expected


def test_lpa_deterministic_across_partitionings(spark):
    from nlp_series_relation_extraction_spark.operators.graph import (
        label_propagation_communities,
    )

    edges = _two_cluster_edges()
    base = [(a, "p", b, 1) for a, b in edges]
    schema = (
        "subj_entity_id long, predicate string, obj_entity_id long,"
        " n_evidence long"
    )
    one = {
        (r.entity_id, r.community_id)
        for r in label_propagation_communities(
            spark.createDataFrame(base, schema).repartition(1), rounds=4
        ).collect()
    }
    many = {
        (r.entity_id, r.community_id)
        for r in label_propagation_communities(
            spark.createDataFrame(base, schema).repartition(16), rounds=4
        ).collect()
    }
    assert one == many


class TestConstraintViolations:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows,
            "subj_entity_id long, subj_type string, predicate string,"
            " obj_entity_id long, obj_type string",
        )

    def test_modal_induction_and_counts(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            constraint_violations,
        )

        rows = (
            # 'born_in': 3 person subjects, 1 org (violation); ranges
            # 3 city, 1 country (violation)
            [(1, "person", "born_in", 10, "city"),
             (2, "person", "born_in", 11, "city"),
             (3, "person", "born_in", 12, "city"),
             (4, "org", "born_in", 13, "country")]
            # 'owns': clean — zero violations
            + [(5, "org", "owns", 20, "asset"),
               (6, "org", "owns", 21, "asset")]
        )
        out = {
            r.predicate: r
            for r in constraint_violations(self._df(spark, rows)).collect()
        }
        b = out["born_in"]
        assert (b.domain_type, b.range_type) == ("person", "city")
        assert (b.n_triples, b.n_domain_violations, b.n_range_violations) == (
            4, 1, 1,
        )
        assert b.domain_violation_ppm == 250000
        o = out["owns"]
        assert (o.n_domain_violations, o.n_range_violations) == (0, 0)
        assert o.domain_violation_ppm == 0 and o.range_violation_ppm == 0

    def test_modal_tie_breaks_lexicographic(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            constraint_violations,
        )

        rows = [
            (1, "b_type", "p", 10, "z_type"),
            (2, "a_type", "p", 11, "y_type"),
        ]
        r = constraint_violations(self._df(spark, rows)).collect()[0]
        # 1-1 tie on both sides -> lexicographically smallest type wins
        assert r.domain_type == "a_type"
        assert r.range_type == "y_type"
        assert r.n_domain_violations == 1 and r.n_range_violations == 1


class TestKCoreAndBFS:
    def _edges(self, spark, pairs):
        return spark.createDataFrame(
            [(a, "r", b) for a, b in pairs],
            "subj_entity_id long, predicate string, obj_entity_id long",
        )

    # a 5-clique (core deg 4), a 4-cycle hanging off it (deg 2), and a
    # pendant chain (deg 1) — three distinct peeling depths
    PAIRS = (
        [(i, j) for i in range(5) for j in range(5) if i < j]
        + [(4, 10), (10, 11), (11, 12), (12, 4)]
        + [(0, 20), (20, 21), (21, 22)]
    )

    def test_k_core_matches_python_twin(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            k_core,
            k_core_python,
        )

        df = self._edges(spark, self.PAIRS)
        for k in (1, 2, 3, 4, 5):
            got = {
                r.entity_id: r.degree for r in k_core(df, k).collect()
            }
            assert got == k_core_python(self.PAIRS, k), f"k={k}"
        # semantic spot checks: 3-core is exactly the clique; 5-core empty
        core3 = k_core_python(self.PAIRS, 3)
        assert set(core3) == {0, 1, 2, 3, 4}
        assert all(d == 4 for d in core3.values())
        assert k_core_python(self.PAIRS, 5) == {}
        # 2-core keeps clique + cycle, drops the pendant chain
        assert set(k_core_python(self.PAIRS, 2)) == {0, 1, 2, 3, 4, 10, 11, 12}

    def test_k_core_cascading_peel(self, spark):
        """A chain peels one layer per round — the iterative part must
        actually iterate (a single degree filter would keep 1-2-3)."""
        from nlp_series_relation_extraction_spark.operators.graph import (
            k_core,
            k_core_python,
        )

        chain = [(0, 1), (1, 2), (2, 3), (3, 4)]
        assert k_core_python(chain, 2) == {}
        assert k_core(self._edges(spark, chain), 2).count() == 0

    def test_k_core_rejects_bad_k(self, spark):
        import pytest as _pytest

        from nlp_series_relation_extraction_spark.operators.graph import (
            k_core,
        )

        with _pytest.raises(ValueError, match="k must be"):
            k_core(self._edges(spark, self.PAIRS), 0)

    def test_bfs_distances(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            bfs_distances,
        )

        df = self._edges(spark, self.PAIRS)
        seeds = spark.createDataFrame([(22,)], "entity_id long")
        got = {
            r.entity_id: r.dist
            for r in bfs_distances(df, seeds, max_depth=3).collect()
        }
        # 22-21-20-0, then depth cap: clique members beyond 0 are cut
        assert got == {22: 0, 21: 1, 20: 2, 0: 3}
        # deeper cap reaches the whole connected component
        far = bfs_distances(df, seeds, max_depth=10)
        verts = {v for p in self.PAIRS for v in p}
        assert {r.entity_id for r in far.collect()} == verts

    def test_bfs_multi_source_takes_min(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            bfs_distances,
        )

        df = self._edges(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
        seeds = spark.createDataFrame([(0,), (4,)], "entity_id long")
        got = {
            r.entity_id: r.dist
            for r in bfs_distances(df, seeds, max_depth=4).collect()
        }
        assert got == {0: 0, 4: 0, 1: 1, 3: 1, 2: 2}


class TestRandomWalks:
    def _edges(self, spark, pairs):
        return spark.createDataFrame(
            [(a, "r", b) for a, b in pairs],
            "subj_entity_id long, predicate string, obj_entity_id long",
        )

    PAIRS = [(0, 1), (1, 2), (2, 3), (3, 0), (1, 3), (2, 7)]

    def test_walks_are_valid_paths(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            random_walks,
        )

        df = self._edges(spark, self.PAIRS)
        out = random_walks(df, walk_len=4, n_walks=3).collect()
        und = {(a, b) for a, b in self.PAIRS} | {
            (b, a) for a, b in self.PAIRS
        }
        walks: dict = {}
        for r in out:
            walks.setdefault(r.walk_id, {})[r.step] = r.vertex
        verts = {v for p in self.PAIRS for v in p}
        assert len(walks) == len(verts) * 3
        for wid, path in walks.items():
            assert sorted(path) == list(range(5)), wid
            start = int(wid.split("_")[0])
            assert path[0] == start
            for t in range(4):
                assert (path[t], path[t + 1]) in und, (wid, t)

    def test_walks_deterministic_and_partition_invariant(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            random_walks,
        )

        df1 = self._edges(spark, self.PAIRS)
        df2 = self._edges(spark, self.PAIRS).repartition(17)
        a = sorted(map(tuple, random_walks(df1, 3, 2).collect()))
        b = sorted(map(tuple, random_walks(df2, 3, 2).collect()))
        assert a == b
        # salt redraws the corpus
        c = sorted(map(tuple, random_walks(df1, 3, 2, salt="v2").collect()))
        assert a != c

    def test_walk_shape_validation(self, spark):
        import pytest as _pytest

        from nlp_series_relation_extraction_spark.operators.graph import (
            random_walks,
        )

        with _pytest.raises(ValueError, match="bad walk shape"):
            random_walks(self._edges(spark, self.PAIRS), -1, 1)
        with _pytest.raises(ValueError, match="bad walk shape"):
            random_walks(self._edges(spark, self.PAIRS), 3, 0)


class TestNode2VecWalks:
    def _edges(self, spark, pairs):
        return spark.createDataFrame(
            [(a, "r", b) for a, b in pairs],
            "subj_entity_id long, predicate string, obj_entity_id long",
        )

    # triangle 0-1-2 with tails 2-3 and 1-4: has both distance-1
    # (stay) and distance-2 (explore) candidates at step >= 2
    PAIRS = [(0, 1), (1, 2), (0, 2), (2, 3), (1, 4)]

    def test_walks_are_valid_paths_from_every_vertex(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            node2vec_walks,
        )

        df = self._edges(spark, self.PAIRS)
        out = node2vec_walks(df, walk_len=4, n_walks=2).collect()
        und = {(a, b) for a, b in self.PAIRS} | {
            (b, a) for a, b in self.PAIRS
        }
        walks: dict = {}
        for r in out:
            walks.setdefault(r.walk_id, {})[r.step] = r.vertex
        assert len(walks) == 5 * 2
        for wid, path in walks.items():
            assert sorted(path) == list(range(5)), wid
            assert path[0] == int(wid.split("_")[0])
            for t in range(4):
                assert (path[t], path[t + 1]) in und, (wid, t)

    def test_deterministic_partition_invariant_and_salted(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            node2vec_walks,
        )

        a = sorted(map(tuple, node2vec_walks(
            self._edges(spark, self.PAIRS), 3, 2).collect()))
        b = sorted(map(tuple, node2vec_walks(
            self._edges(spark, self.PAIRS).repartition(17), 3, 2
        ).collect()))
        assert a == b
        c = sorted(map(tuple, node2vec_walks(
            self._edges(spark, self.PAIRS), 3, 2, salt="v2").collect()))
        assert a != c

    def test_return_bias_dominates_on_extreme_weights(self, spark):
        # w_ret >> others: from any step-2 position the walk must bounce
        # straight back to its predecessor whenever the predecessor is a
        # candidate (it always is on an undirected graph) — total weight
        # is w_ret + (deg-1)*small, and the hash draw can only escape the
        # return interval with probability (deg-1)*small/total. With
        # w_ret=10^6 and small=1 on degree<=3 vertices, escape needs a
        # draw in a <3/10^6 sliver; the fixed salt's draws never hit it.
        from nlp_series_relation_extraction_spark.operators.graph import (
            node2vec_walks,
        )

        df = self._edges(spark, self.PAIRS)
        out = node2vec_walks(
            df, walk_len=4, n_walks=2, w_ret=1_000_000, w_stay=1, w_far=1
        ).collect()
        walks: dict = {}
        for r in out:
            walks.setdefault(r.walk_id, {})[r.step] = r.vertex
        for wid, path in walks.items():
            for t in range(2, 5):
                assert path[t] == path[t - 2], (wid, t, path)

    def test_explore_bias_never_returns_when_escape_exists(self, spark):
        # w_far >> w_ret on the path graph 0-1-2-3-4: at every interior
        # vertex the distance-2 candidate exists (stay never does on a
        # path), so the walk must always move AWAY from the predecessor.
        from nlp_series_relation_extraction_spark.operators.graph import (
            node2vec_walks,
        )

        df = self._edges(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
        out = node2vec_walks(
            df, walk_len=3, n_walks=2, w_ret=1, w_stay=1, w_far=1_000_000
        ).collect()
        walks: dict = {}
        for r in out:
            walks.setdefault(r.walk_id, {})[r.step] = r.vertex
        for wid, path in walks.items():
            for t in range(2, 4):
                if t not in path:  # walked off the path's end
                    continue
                # returning is only forced at the path's endpoints
                if path[t] == path[t - 2]:
                    assert path[t - 1] in (0, 4), (wid, path)

    def test_weight_and_shape_validation(self, spark):
        import pytest as _pytest

        from nlp_series_relation_extraction_spark.operators.graph import (
            node2vec_walks,
        )

        df = self._edges(spark, self.PAIRS)
        with _pytest.raises(ValueError, match="bad walk shape"):
            node2vec_walks(df, -1, 1)
        with _pytest.raises(ValueError, match="positive integers"):
            node2vec_walks(df, 3, 1, w_ret=0)


class TestMatchBGP:
    EDGES = [
        (1, "likes", 2), (1, "likes", 3), (2, "likes", 3),
        (1, "in", 10), (2, "in", 10), (3, "in", 11),
        (10, "part_of", 100), (11, "part_of", 100),
        (7, "self", 7), (8, "self", 9),
    ]

    def _df(self, spark):
        return spark.createDataFrame(
            [(a, p, b) for a, p, b in self.EDGES],
            "subj_entity_id long, predicate string, obj_entity_id long",
        )

    def test_chain_and_constants(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            match_bgp,
        )

        # ?x likes ?y . ?x in 10 . ?y in ?w
        out = match_bgp(
            self._df(spark),
            [("?x", "likes", "?y"), ("?x", "in", "10"), ("?y", "in", "?w")],
        )
        assert sorted(out.columns) == ["w", "x", "y"]
        got = {(r.x, r.y, r.w) for r in out.collect()}
        assert got == {(1, 2, 10), (1, 3, 11), (2, 3, 11)}

    def test_predicate_variable(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            match_bgp,
        )

        out = match_bgp(self._df(spark), [("1", "?p", "?y")])
        got = {(r.p, r.y) for r in out.collect()}
        assert got == {("likes", 2), ("likes", 3), ("in", 10)}

    def test_repeated_variable_in_one_pattern(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            match_bgp,
        )

        out = match_bgp(self._df(spark), [("?x", "self", "?x")])
        assert {r.x for r in out.collect()} == {7}

    def test_existence_assertion_gates_results(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            match_bgp,
        )

        hit = match_bgp(
            self._df(spark), [("10", "part_of", "100"), ("?x", "in", "10")]
        )
        assert {r.x for r in hit.collect()} == {1, 2}
        miss = match_bgp(
            self._df(spark), [("10", "part_of", "999"), ("?x", "in", "10")]
        )
        assert miss.count() == 0

    def test_cross_product_rejected(self, spark):
        import pytest as _pytest

        from nlp_series_relation_extraction_spark.operators.graph import (
            match_bgp,
        )

        with _pytest.raises(ValueError, match="cross product"):
            match_bgp(
                self._df(spark),
                [("?x", "likes", "?y"), ("?a", "in", "?b")],
            )
        with _pytest.raises(ValueError, match="empty pattern"):
            match_bgp(self._df(spark), [])

    def test_predicate_filter_pushed_to_scan(self, spark, tmp_path):
        """The per-pattern constant must reach the parquet scan as a
        pushed filter — BGP matching costs |patterns| filtered scans,
        not |patterns| full scans."""
        from nlp_series_relation_extraction_spark.operators.graph import (
            match_bgp,
        )

        p = str(tmp_path / "edges")
        self._df(spark).write.mode("overwrite").parquet(p)
        edges = spark.read.parquet(p)
        plan = (
            match_bgp(edges, [("?x", "likes", "?y"), ("?y", "in", "?w")])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "PushedFilters: [IsNotNull(predicate), EqualTo(predicate,likes)" in plan

    def test_optional_left_join_semantics(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            match_bgp,
        )

        # every ?x in a place, OPTIONAL who ?x likes: 3 has no likes
        out = match_bgp(
            self._df(spark),
            [("?x", "in", "?place")],
            optional=[("?x", "likes", "?fr")],
        )
        got = {(r.x, r.place, r.fr) for r in out.collect()}
        assert got == {
            (1, 10, 2), (1, 10, 3), (2, 10, 3), (3, 11, None),
        }
        with pytest.raises(ValueError, match="shares no variable"):
            match_bgp(
                self._df(spark),
                [("?x", "in", "?place")],
                optional=[("?a", "likes", "?b")],
            )


class TestMatchPath:
    # a 6-chain, a 3-cycle, and a decoy predicate
    EDGES = (
        [(i, "next", i + 1) for i in range(6)]
        + [(10, "next", 11), (11, "next", 12), (12, "next", 10)]
        + [(0, "other", 99)]
    )

    def _df(self, spark):
        return spark.createDataFrame(
            self.EDGES,
            "subj_entity_id long, predicate string, obj_entity_id long",
        )

    def test_minimal_hops_on_chain(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            match_path,
        )

        out = match_path(self._df(spark), "next", max_hops=3)
        got = {(r.src, r.dst): r.hops for r in out.collect()}
        for s in range(6):
            for h in range(1, 4):
                if s + h <= 6:
                    assert got[(s, s + h)] == h
        assert (0, 4) not in got  # beyond max_hops
        assert (0, 99) not in got  # other predicate filtered

    def test_cycle_terminates_and_min_hop_wins(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            match_path,
        )

        out = match_path(self._df(spark), "next", max_hops=10)
        got = {(r.src, r.dst): r.hops for r in out.collect()}
        # 3-cycle closure: every ordered pair (incl. self at hop 3)
        assert got[(10, 11)] == 1 and got[(10, 12)] == 2
        assert got[(10, 10)] == 3 and got[(11, 11)] == 3
        # chain pairs found at their MINIMAL depth even with high cap
        assert got[(0, 1)] == 1 and got[(0, 6)] == 6

    def test_min_hops_filter_and_validation(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            match_path,
        )

        out = match_path(self._df(spark), "next", max_hops=3, min_hops=2)
        assert all(r.hops >= 2 for r in out.collect())
        with pytest.raises(ValueError, match="bad hop bounds"):
            match_path(self._df(spark), "next", max_hops=0)
        with pytest.raises(ValueError, match="bad hop bounds"):
            match_path(self._df(spark), "next", max_hops=2, min_hops=3)


class TestRuleMining:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows,
            "subj_entity_id long, predicate string, obj_entity_id long",
        )

    def test_planted_rule_confidence(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            mine_composition_rules,
        )

        # in(x, y) ^ part_of(y, z); head located_in(x, z) holds for
        # 3 of 4 body pairs -> confidence 750000 ppm
        rows = (
            [(i, "in", 100 + i % 2) for i in range(4)]
            + [(100, "part_of", 200), (101, "part_of", 200)]
            + [(i, "located_in", 200) for i in range(3)]
        )
        out = mine_composition_rules(
            self._df(spark, rows), min_support=2, min_confidence_ppm=1
        ).collect()
        rules = {(r.p1, r.p2, r.p3): r for r in out}
        r = rules[("in", "part_of", "located_in")]
        assert r.n_body == 4 and r.support == 3
        assert r.confidence_ppm == 750000

    def test_pairs_not_paths(self, spark):
        """Two distinct mid-vertices connecting the same (x, z) count as
        ONE body pair — support is over pairs, per AMIE."""
        from nlp_series_relation_extraction_spark.operators.graph import (
            mine_composition_rules,
        )

        rows = [
            (1, "a", 10), (1, "a", 11),
            (10, "b", 5), (11, "b", 5),
            (1, "c", 5),
        ]
        out = mine_composition_rules(
            self._df(spark, rows), min_support=1, min_confidence_ppm=1
        ).collect()
        r = {(x.p1, x.p2, x.p3): x for x in out}[("a", "b", "c")]
        assert r.n_body == 1 and r.support == 1
        assert r.confidence_ppm == 1000000

    def test_thresholds_filter_and_validate(self, spark):
        import pytest as _pytest

        from nlp_series_relation_extraction_spark.operators.graph import (
            mine_composition_rules,
        )

        rows = [(1, "a", 2), (2, "b", 3), (1, "c", 3)]
        high = mine_composition_rules(
            self._df(spark, rows), min_support=2, min_confidence_ppm=1
        )
        assert high.count() == 0  # support 1 < 2
        with _pytest.raises(ValueError, match="bad thresholds"):
            mine_composition_rules(self._df(spark, rows), min_support=0)


class TestSkipgrams:
    def test_window_pairs_hand_computed(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            skipgram_pairs,
        )

        walks = spark.createDataFrame(
            [("w0", 0, 10), ("w0", 1, 20), ("w0", 2, 10), ("w0", 3, 30),
             ("w1", 0, 20), ("w1", 1, 10)],
            "walk_id string, step int, vertex long",
        )
        got = {
            (r.src, r.dst): r.cnt
            for r in skipgram_pairs(walks, window=1).collect()
        }
        # w0 adjacent: (10,20),(20,10),(20,10),(10,20),(10,30),(30,10)
        # w1 adjacent: (20,10),(10,20)
        assert got == {
            (10, 20): 3, (20, 10): 3, (10, 30): 1, (30, 10): 1,
        }
        wide = {
            (r.src, r.dst): r.cnt
            for r in skipgram_pairs(walks, window=3).collect()
        }
        assert wide[(10, 10)] == 2  # step 0 <-> step 2 in w0, both orders
        assert wide[(20, 30)] == 1 and wide[(30, 20)] == 1
        import pytest as _pytest

        with _pytest.raises(ValueError, match="window must be"):
            skipgram_pairs(walks, window=0)

    def test_walks_restricted_to_given_starts(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            random_walks,
        )

        df = spark.createDataFrame(
            [(a, "r", b) for a, b in [(0, 1), (1, 2), (2, 3), (3, 0)]],
            "subj_entity_id long, predicate string, obj_entity_id long",
        )
        starts = spark.createDataFrame([(0,), (2,)], "vertex long")
        out = random_walks(df, 3, 2, starts=starts).collect()
        step0 = {r.vertex for r in out if r.step == 0}
        assert step0 == {0, 2}
        assert {int(r.walk_id.split("_")[0]) for r in out} == {0, 2}


class TestEntityCooccurrencePMI:
    def _ce(self, spark, rows):
        return spark.createDataFrame(
            rows, "conv_id string, entity_id long"
        )

    def test_counts_and_pmi_match_hand_math(self, spark):
        import math

        from nlp_series_relation_extraction_spark.operators.graph import (
            entity_cooccurrence_pmi,
        )

        # 4 convs: {1,2} together twice, {1,3} once, 2 alone once
        rows = [
            ("c1", 1), ("c1", 2),
            ("c2", 1), ("c2", 2), ("c2", 2),  # dup mention dedupes
            ("c3", 1), ("c3", 3),
            ("c4", 2),
        ]
        got = {
            (r.entity_a, r.entity_b): r
            for r in entity_cooccurrence_pmi(self._ce(spark, rows)).collect()
        }
        assert set(got) == {(1, 2), (1, 3)}
        r12 = got[(1, 2)]
        assert (r12.n_joint, r12.n_a, r12.n_b, r12.n_convs) == (2, 3, 3, 4)
        assert abs(r12.pmi - math.log(2 * 4 / (3 * 3))) < 1e-12
        assert got[(1, 3)].n_joint == 1

    def test_conv_cap_drops_whole_conversations(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            entity_cooccurrence_pmi,
        )

        rows = [("big", e) for e in range(10)] + [("small", 1), ("small", 2)]
        out = entity_cooccurrence_pmi(
            self._ce(spark, rows), max_entities_per_conv=5
        ).collect()
        # the 10-entity conv is dropped entirely: only the small pair
        # remains, and n_convs counts only KEPT conversations
        assert len(out) == 1
        assert (out[0].entity_a, out[0].entity_b, out[0].n_convs) == (1, 2, 1)


class TestNeighborhoodSimilarity:
    EDGES = [
        # star: 0 connects 1,2,3; plus 1-2 edge -> pairs share neighbors
        (0, 1), (0, 2), (0, 3), (1, 2),
    ]

    def _edges(self, spark):
        return spark.createDataFrame(
            [(a, "r", b) for a, b in self.EDGES],
            "subj_entity_id long, predicate string, obj_entity_id long",
        )

    def test_matches_python_twin_including_adamic_adar(self, spark):
        import math

        from nlp_series_relation_extraction_spark.operators.graph import (
            neighborhood_similarity,
        )

        nbrs: dict = {}
        for a, b in self.EDGES:
            nbrs.setdefault(a, set()).add(b)
            nbrs.setdefault(b, set()).add(a)
        want = {}
        verts = sorted(nbrs)
        for i, x in enumerate(verts):
            for y in verts[i + 1:]:
                common = nbrs[x] & nbrs[y]
                if not common:
                    continue
                n = len(common)
                want[(x, y)] = (
                    n,
                    len(nbrs[x]),
                    len(nbrs[y]),
                    n / (len(nbrs[x]) + len(nbrs[y]) - n),
                    n / min(len(nbrs[x]), len(nbrs[y])),
                    sum(1 / math.log(len(nbrs[c])) for c in common),
                )
        got = {
            (r.entity_a, r.entity_b): (
                r.n_common, r.degree_a, r.degree_b,
                r.jaccard, r.overlap, r.adamic_adar,
            )
            for r in neighborhood_similarity(self._edges(spark)).collect()
        }
        assert set(got) == set(want)
        for k, w in want.items():
            g = got[k]
            assert g[:3] == w[:3], k
            for gv, wv in zip(g[3:], w[3:]):
                assert abs(gv - wv) < 1e-12, k

    def test_pivot_cap_excludes_hub_wedges(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            neighborhood_similarity,
        )

        # capping at degree 2 excludes vertex 0 (degree 3) as a pivot:
        # only wedges through 1 and 2 remain
        got = {
            (r.entity_a, r.entity_b): r.n_common
            for r in neighborhood_similarity(
                self._edges(spark), max_pivot_degree=2
            ).collect()
        }
        assert (1, 2) not in got or got[(1, 2)] == 1  # 0-pivot wedge gone
        assert (0, 2) in got and (0, 1) in got


class TestShortestPaths:
    def _edges(self, spark, rows):
        # rows: (a, b, w)
        return spark.createDataFrame(
            [(a, "r", b, w) for a, b, w in rows],
            "subj_entity_id long, predicate string, obj_entity_id long,"
            " toll long",
        )

    def _seeds(self, spark, ids):
        return spark.createDataFrame(
            [(i,) for i in ids], "entity_id long"
        )

    def _twin(self, rows, seeds, max_hops):
        und: dict = {}
        for a, b, w in rows:
            if a == b:
                continue
            und[(a, b)] = min(und.get((a, b), w), w)
            und[(b, a)] = min(und.get((b, a), w), w)
        best = {s: 0 for s in seeds}
        frontier = dict(best)
        for _ in range(max_hops):
            cand: dict = {}
            for v, c in frontier.items():
                for (x, y), w in und.items():
                    if x == v:
                        nc = c + w
                        if nc < cand.get(y, nc + 1):
                            cand[y] = nc
            frontier = {
                v: c for v, c in cand.items()
                if c < best.get(v, c + 1)
            }
            if not frontier:
                break
            best.update(frontier)
        return best

    def test_matches_python_twin_weighted(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            shortest_paths,
        )

        # weighted diamond: direct edge costs MORE than the 2-hop detour
        rows = [
            (1, 2, 10), (1, 3, 1), (3, 2, 1),  # 1->2 best via 3 (cost 2)
            (2, 4, 5), (4, 5, 1), (1, 1, 99),  # self-loop ignored
            (7, 8, 2),  # island unreachable from seed 1
        ]
        got = {
            r.entity_id: r.cost
            for r in shortest_paths(
                self._edges(spark, rows),
                self._seeds(spark, [1]),
                weight="toll",
                max_hops=4,
            ).collect()
        }
        want = self._twin(rows, [1], 4)
        assert got == want
        assert got[2] == 2 and 7 not in got and 8 not in got

    def test_hop_cap_and_multi_source_min(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            shortest_paths,
        )

        rows = [(1, 2, 1), (2, 3, 1), (3, 4, 1), (4, 5, 1)]
        for hops in (1, 2, 3):
            got = {
                r.entity_id: r.cost
                for r in shortest_paths(
                    self._edges(spark, rows),
                    self._seeds(spark, [1, 5]),
                    weight="toll",
                    max_hops=hops,
                ).collect()
            }
            assert got == self._twin(rows, [1, 5], hops), hops

    def test_unit_weights_equal_bfs(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            bfs_distances,
            shortest_paths,
        )

        rows = [(1, 2, 9), (2, 3, 9), (1, 3, 9), (3, 4, 9)]
        e = self._edges(spark, rows)
        seeds = self._seeds(spark, [1])
        sp = {
            r.entity_id: r.cost
            for r in shortest_paths(e, seeds, weight=None, max_hops=3).collect()
        }
        bfs = {
            r.entity_id: r.dist
            for r in bfs_distances(e, seeds, max_depth=3).collect()
        }
        assert sp == bfs


class TestHITS:
    def _edges(self, spark, pairs):
        return spark.createDataFrame(
            [(a, "r", b) for a, b in pairs],
            "subj_entity_id long, predicate string, obj_entity_id long",
        )

    def _twin(self, pairs, iters):
        import numpy as np

        pairs = sorted(set(pairs))
        nodes = sorted({v for p in pairs for v in p})
        idx = {v: i for i, v in enumerate(nodes)}
        n = len(nodes)
        A = np.zeros((n, n))
        for s, o in pairs:
            A[idx[s], idx[o]] = 1.0
        h = np.ones(n)
        a = np.ones(n)
        for _ in range(iters):
            a = A.T @ h
            h = A @ a
        h = h / np.linalg.norm(h)
        a = a / np.linalg.norm(a)
        return {v: (h[idx[v]], a[idx[v]]) for v in nodes}

    def test_matches_numpy_twin(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import hits

        pairs = [
            (1, 10), (2, 10), (3, 10),  # 10 is the authority
            (1, 11), (2, 11),
            (10, 1),  # a back edge so hubs/auths mix
            (4, 12),
        ]
        got = {
            r.entity_id: (r.hub, r.authority)
            for r in hits(self._edges(spark, pairs), iters=8).collect()
        }
        want = self._twin(pairs, 8)
        assert set(got) == set(want)
        for v, (wh, wa) in want.items():
            assert got[v][0] == pytest.approx(wh, abs=1e-9), v
            assert got[v][1] == pytest.approx(wa, abs=1e-9), v

    def test_pure_authority_has_zero_hub(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import hits

        got = {
            r.entity_id: (r.hub, r.authority)
            for r in hits(
                self._edges(spark, [(1, 9), (2, 9)]), iters=4
            ).collect()
        }
        assert got[9][0] == 0.0  # no out-edges -> zero hub
        assert got[9][1] == pytest.approx(1.0)  # the only authority
        assert got[1][1] == 0.0


class TestPersonalizedPageRank:
    def _twin(self, edge_list, seeds, damping=0.85, iters=10):
        nodes = sorted({v for p in edge_list for v in p})
        idx = {v: i for i, v in enumerate(nodes)}
        n = len(nodes)
        seeds = [s for s in seeds if s in idx]
        reset = np.zeros(n)
        for s in seeds:
            reset[idx[s]] = 1.0 / len(seeds)
        out = {v: 0 for v in nodes}
        for s, _ in set(edge_list):
            out[s] += 1
        r = reset.copy()
        for _ in range(iters):
            dang = sum(r[idx[v]] for v in nodes if out[v] == 0)
            contrib = np.zeros(n)
            for s, o in set(edge_list):
                contrib[idx[o]] += r[idx[s]] / out[s]
            r = (1 - damping) * reset + damping * (contrib + dang * reset)
        return {v: r[idx[v]] for v in nodes}

    def test_matches_numpy_twin_and_conserves_mass(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            personalized_pagerank,
        )

        edge_list = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 3), (6, 1)]
        seeds = spark.createDataFrame([(1,), (99,)], "entity_id long")
        got = {
            r.entity_id: r.rank
            for r in personalized_pagerank(
                _edges(spark, [(s, o, 1) for s, o in edge_list]),
                seeds,
                iters=10,
            ).collect()
        }
        want = self._twin(edge_list, [1, 99], iters=10)  # 99 not in graph
        assert set(got) == set(want)
        for v in want:
            assert got[v] == pytest.approx(want[v], abs=1e-12), v
        assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)

    def test_locality_seeded_side_outranks_far_side(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            personalized_pagerank,
        )

        # two symmetric BIDIRECTIONAL 3-cycles bridged both ways; seed
        # in cycle A (a one-way bridge would make B a rank trap — mass
        # drains in and only teleport leaves, inverting locality)
        a = [(1, 2), (2, 3), (3, 1), (2, 1), (3, 2), (1, 3)]
        b = [(11, 12), (12, 13), (13, 11), (12, 11), (13, 12), (11, 13)]
        bridge = [(3, 11), (11, 3)]
        seeds = spark.createDataFrame([(1,)], "entity_id long")
        got = {
            r.entity_id: r.rank
            for r in personalized_pagerank(
                _edges(spark, [(s, o, 1) for s, o in a + b + bridge]),
                seeds,
                iters=12,
            ).collect()
        }
        assert min(got[v] for v in (1, 2, 3)) > max(got[v] for v in (11, 12, 13))

    def test_empty_seed_set(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            personalized_pagerank,
        )

        seeds = spark.createDataFrame([], "entity_id long")
        assert (
            personalized_pagerank(
                _edges(spark, [(1, 2, 1)]), seeds
            ).count()
            == 0
        )


def test_gapped_pair_support_exists_semantics(spark):
    from nlp_series_relation_extraction_spark.operators.conversation import (
        gapped_pair_support,
    )

    t = spark.createDataFrame(
        [
            # u1: search .. kb .. search  (search->kb, kb->search,
            #     search->search via repeat)
            ("u1", 0, "search"), ("u1", 1, "kb"), ("u1", 2, "search"),
            # u2: search then MUCH later kb (gap) — still counts once
            ("u2", 0, "search"), ("u2", 1, "x"), ("u2", 2, "x"),
            ("u2", 3, "kb"),
            # u3: kb only
            ("u3", 0, "kb"),
        ],
        "key string, pos int, tok string",
    )
    got = {
        (r.token_a, r.token_b): r.support
        for r in gapped_pair_support(t, "key", ["pos"], "tok").collect()
    }
    assert got[("search", "kb")] == 2  # u1 and u2 (gapped)
    assert got[("kb", "search")] == 1  # u1 only
    assert got[("search", "search")] == 1  # repeat in u1
    assert ("kb", "kb") not in got  # never repeats
    assert got[("x", "kb")] == 1 and got[("x", "x")] == 1


class TestConstructAndForwardChain:
    def _t(self, spark, triples):
        return spark.createDataFrame(
            list(triples),
            "subj_entity_id long, predicate string, obj_entity_id long",
        )

    def test_construct_with_filter_and_constants(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            construct_triples,
        )

        # suppliers 1,2 in nation 10; supplier 3 in nation 11
        e = self._t(spark, [(1, "in_nation", 10), (2, "in_nation", 10),
                            (3, "in_nation", 11)])
        got = {
            (r.subj_entity_id, r.predicate, r.obj_entity_id)
            for r in construct_triples(
                e,
                [("?a", "in_nation", "?n"), ("?b", "in_nation", "?n")],
                ("?a", "colocated", "?b"),
                where="a < b",
            ).collect()
        }
        assert got == {(1, "colocated", 2)}
        # constant subject + derived-object template, dedup across bindings
        got2 = {
            (r.subj_entity_id, r.predicate, r.obj_entity_id)
            for r in construct_triples(
                e,
                [("?a", "in_nation", "?n")],
                (99, "has_member_nation", "?n"),
            ).collect()
        }
        assert got2 == {(99, "has_member_nation", 10),
                        (99, "has_member_nation", 11)}

    def _twin_chain(self, facts, rules, max_rounds=12):
        """Naive-iteration python twin: round r derives from all facts
        known through round r-1; returns {(s,p,o): first_round}."""
        def is_var(t):
            return isinstance(t, str) and t.startswith("?")

        known = {f: 0 for f in facts}
        for rnd in range(1, max_rounds + 1):
            new = set()
            for body, head in rules:
                bindings = [{}]
                for s, p, o in body:
                    nxt = []
                    for env in bindings:
                        for fs, fp, fo in known:
                            e2 = dict(env)
                            ok = True
                            for term, val in ((s, fs), (p, fp), (o, fo)):
                                if is_var(term):
                                    if term in e2 and e2[term] != val:
                                        ok = False
                                    e2[term] = val
                                elif term != val:
                                    ok = False
                            if ok:
                                nxt.append(e2)
                    bindings = nxt
                hs, hp, ho = head
                for env in bindings:
                    new.add((
                        env[hs] if is_var(hs) else hs,
                        env[hp] if is_var(hp) else hp,
                        env[ho] if is_var(ho) else ho,
                    ))
            delta = {f for f in new if f not in known}
            if not delta:
                break
            for f in delta:
                known[f] = rnd
        return known

    def test_transitive_closure_matches_twin_with_rounds(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            forward_chain,
        )

        # chain 1->2->...->9 plus a side branch: closure has 36+ pairs,
        # semi-naive doubling finds depth-8 paths in ceil(log2(8)) = 3+
        # rounds (naive-round semantics: round r joins anything known)
        facts = [(i, "within", i + 1) for i in range(1, 9)] + [
            (100, "within", 3)
        ]
        rule = ([("?a", "within", "?b"), ("?b", "within", "?c")],
                ("?a", "within", "?c"))
        got = {
            (r.subj_entity_id, r.predicate, r.obj_entity_id):
                r.derived_round
            for r in forward_chain(
                self._t(spark, facts), [rule]
            ).collect()
        }
        want = self._twin_chain(set(facts), [rule])
        assert got == want
        assert max(got.values()) >= 2  # genuinely multi-round

    def test_multi_rule_interaction_and_cycles(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            forward_chain,
        )

        # a 3-cycle under transitivity (must terminate: closure is the
        # full cycle square) + an inverse rule FEEDING off derived facts
        facts = [(1, "within", 2), (2, "within", 3), (3, "within", 1)]
        rules = [
            ([("?a", "within", "?b"), ("?b", "within", "?c")],
             ("?a", "within", "?c")),
            ([("?a", "within", "?b")], ("?b", "contains", "?a")),
        ]
        got = {
            (r.subj_entity_id, r.predicate, r.obj_entity_id):
                r.derived_round
            for r in forward_chain(self._t(spark, facts), rules).collect()
        }
        want = self._twin_chain(set(facts), rules)
        assert got == want
        # every within pair (incl. self-loops from the cycle) has its
        # inverse — derived-from-derived across rules
        within = {(s, o) for (s, p, o) in got if p == "within"}
        contains = {(s, o) for (s, p, o) in got if p == "contains"}
        assert contains == {(o, s) for (s, o) in within}
        assert (1, 1) in within  # cycle closure reaches self-loops

    def test_max_rounds_cap_returns_partial_closure(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            forward_chain,
        )

        facts = [(i, "within", i + 1) for i in range(1, 9)]
        rule = ([("?a", "within", "?b"), ("?b", "within", "?c")],
                ("?a", "within", "?c"))
        capped = forward_chain(self._t(spark, facts), [rule], max_rounds=1)
        uncapped = forward_chain(self._t(spark, facts), [rule])
        assert capped.count() == len(facts) + 7  # depth-2 pairs only
        assert uncapped.count() == 36  # 8+7+...+1

    def test_head_variable_must_be_bound(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            forward_chain,
        )

        with pytest.raises(ValueError, match="not bound"):
            forward_chain(
                self._t(spark, [(1, "p", 2)]),
                [([("?a", "p", "?b")], ("?a", "q", "?z"))],
            )


class TestCardinalityProfile:
    """SHACL-style functional / inverse-functional induction
    (operators/graph.py:cardinality_profile)."""

    def _facts(self, spark, rows):
        return spark.createDataFrame(
            rows, "subj string, predicate string, obj string"
        )

    def test_hand_computed_profile(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            cardinality_profile,
        )

        rows = [
            # functional except s3 (two objects); o1 has two subjects
            ("s1", "p", "o1"),
            ("s2", "p", "o1"),
            ("s3", "p", "o2"),
            ("s3", "p", "o3"),
            # duplicate asserted fact must NOT create a violation
            ("s1", "p", "o1"),
        ]
        out = cardinality_profile(
            self._facts(spark, rows), functional_ppm=600_000
        ).collect()
        assert len(out) == 1
        r = out[0]
        assert r.n_triples == 4  # dedup first
        assert r.n_subjects == 3
        # 2 of 3 subjects single-valued -> floor(2e6/3)
        assert r.functional_share_ppm == 666_666
        assert r.is_functional  # >= 600000
        assert r.n_violating_subjects == 1
        assert r.max_objects_per_subject == 2
        assert r.n_objects == 3
        # o2,o3 single; o1 has 2 subjects -> floor(2e6/3)
        assert r.inverse_share_ppm == 666_666
        assert r.n_violating_objects == 1
        assert r.max_subjects_per_object == 2

    def test_threshold_boundary_is_inclusive(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            cardinality_profile,
        )

        rows = [("s1", "p", "o1"), ("s2", "p", "o2"), ("s2", "p", "o3")]
        # 1 of 2 subjects single -> 500000 ppm exactly
        got = cardinality_profile(
            self._facts(spark, rows), functional_ppm=500_000
        ).collect()[0]
        assert got.functional_share_ppm == 500_000
        assert got.is_functional
        got2 = cardinality_profile(
            self._facts(spark, rows), functional_ppm=500_001
        ).collect()[0]
        assert not got2.is_functional

    def test_multiple_predicates_independent(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            cardinality_profile,
        )

        rows = [
            ("s1", "fn", "o1"),
            ("s2", "fn", "o2"),
            ("s1", "multi", "o1"),
            ("s1", "multi", "o2"),
        ]
        got = {
            r.predicate: r
            for r in cardinality_profile(
                self._facts(spark, rows)
            ).collect()
        }
        assert got["fn"].is_functional
        assert got["fn"].n_violating_subjects == 0
        assert not got["multi"].is_functional
        assert got["multi"].max_objects_per_subject == 2


class TestSparqlFilterUnionValues:
    """FILTER / VALUES / UNION over the BGP matcher (SPARQL 1.1 §17,
    §10.2, §6.2)."""

    EDGES = TestMatchBGP.EDGES

    def _df(self, spark):
        return spark.createDataFrame(
            [(a, p, b) for a, p, b in self.EDGES],
            "subj_entity_id long, predicate string, obj_entity_id long",
        )

    def test_filter_on_first_pattern_variable(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            match_bgp,
        )

        out = match_bgp(
            self._df(spark), [("?x", "likes", "?y")], filters=["x = 1"]
        )
        assert {(r.x, r.y) for r in out.collect()} == {(1, 2), (1, 3)}

    def test_filter_spanning_two_patterns(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            match_bgp,
        )

        out = match_bgp(
            self._df(spark),
            [("?x", "likes", "?y"), ("?y", "in", "?w")],
            filters=["x != 2", "w = 11"],
        )
        assert {(r.x, r.y, r.w) for r in out.collect()} == {(1, 3, 11)}

    def test_filter_on_unbound_optional_var_is_false(self, spark):
        # SPARQL error-is-false: w is NULL for the self-pairs (no `in`
        # edge), so the filter drops every row
        from nlp_series_relation_extraction_spark.operators.graph import (
            match_bgp,
        )

        out = match_bgp(
            self._df(spark),
            [("?x", "self", "?y")],
            optional=[("?y", "in", "?w")],
            filters=["w = 10"],
        )
        assert out.count() == 0

    def test_values_restricts_bindings(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            match_bgp,
        )

        out = match_bgp(
            self._df(spark),
            [("?x", "likes", "?y")],
            values=(["x"], [(1,)]),
        )
        assert {(r.x, r.y) for r in out.collect()} == {(1, 2), (1, 3)}

    def test_values_can_introduce_new_columns(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            match_bgp,
        )

        out = match_bgp(
            self._df(spark),
            [("?x", "likes", "?y")],
            values=(["x", "lbl"], [(1, "one"), (2, "two")]),
        )
        got = {(r.x, r.y, r.lbl) for r in out.collect()}
        assert got == {(1, 2, "one"), (1, 3, "one"), (2, 3, "two")}

    def test_values_cross_product_rejected(self, spark):
        import pytest

        from nlp_series_relation_extraction_spark.operators.graph import (
            match_bgp,
        )

        with pytest.raises(ValueError, match="cross product"):
            match_bgp(
                self._df(spark),
                [("?x", "likes", "?y")],
                values=(["z"], [(1,)]),
            ).collect()

    def test_values_arg_validation(self, spark):
        import pytest

        from nlp_series_relation_extraction_spark.operators.graph import (
            match_bgp,
        )

        with pytest.raises(ValueError, match="no '\\?'"):
            match_bgp(
                self._df(spark), [("?x", "likes", "?y")],
                values=(["?x"], [(1,)]),
            )
        with pytest.raises(ValueError, match="arity"):
            match_bgp(
                self._df(spark), [("?x", "likes", "?y")],
                values=(["x"], [(1, 2)]),
            )

    def test_union_fills_unbound_vars_with_null(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            union_bgp,
        )

        out = union_bgp(
            self._df(spark),
            [
                [("?x", "likes", "?y")],
                [("?x", "in", "?w")],
            ],
        )
        rows = out.collect()
        assert sorted(out.columns) == ["w", "x", "y"]
        likes = {(r.x, r.y) for r in rows if r.w is None}
        ins = {(r.x, r.w) for r in rows if r.y is None}
        assert likes == {(1, 2), (1, 3), (2, 3)}
        assert ins == {(1, 10), (2, 10), (3, 11)}

    def test_union_branch_with_filter_dict_form(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            union_bgp,
        )

        out = union_bgp(
            self._df(spark),
            [
                {"patterns": [("?x", "likes", "?y")],
                 "filters": ["x = 1"]},
                {"patterns": [("?x", "in", "?y")],
                 "values": (["y"], [(11,)])},
            ],
        )
        got = {(r.x, r.y) for r in out.collect()}
        assert got == {(1, 2), (1, 3), (3, 11)}

    def test_union_keeps_duplicate_solutions(self, spark):
        # bag semantics: the same binding arriving from both branches
        # appears twice (SPARQL UNION has no implicit DISTINCT)
        from nlp_series_relation_extraction_spark.operators.graph import (
            union_bgp,
        )

        out = union_bgp(
            self._df(spark),
            [[("?x", "likes", "?y")], [("?x", "likes", "?y")]],
        )
        assert out.count() == 6

    def test_union_type_conflict_rejected(self, spark):
        import pytest

        from nlp_series_relation_extraction_spark.operators.graph import (
            union_bgp,
        )

        with pytest.raises(ValueError, match="conflicting"):
            union_bgp(
                self._df(spark),
                [
                    [("?x", "likes", "?v")],   # v: entity (long)
                    [("?x", "?v", "10")],      # v: predicate (string)
                ],
            )

    def test_empty_groups_rejected(self, spark):
        import pytest

        from nlp_series_relation_extraction_spark.operators.graph import (
            union_bgp,
        )

        with pytest.raises(ValueError, match="empty group"):
            union_bgp(self._df(spark), [])


class TestMinusBGP:
    EDGES = [
        (1, "likes", 2), (1, "likes", 3), (2, "likes", 3),
        (1, "in", 10), (2, "in", 10), (3, "in", 11),
    ]

    def _df(self, spark):
        return spark.createDataFrame(
            [(a, p, b) for a, p, b in self.EDGES],
            "subj_entity_id long, predicate string, obj_entity_id long",
        )

    def test_shared_variable_removes_compatible(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            minus_bgp,
        )

        # every likes-subject is in 10 except x=3 (which never likes)
        out = minus_bgp(
            self._df(spark), [("?x", "likes", "?y")], [("?x", "in", "10")]
        )
        assert out.count() == 0
        kept = minus_bgp(
            self._df(spark), [("?x", "likes", "?y")], [("?x", "in", "11")]
        )
        assert {(r.x, r.y) for r in kept.collect()} == {(1, 2), (1, 3), (2, 3)}

    def test_disjoint_domains_remove_nothing(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            minus_bgp,
        )

        # SPARQL 1.1 §8.3.2: no shared variable -> MINUS is a no-op
        out = minus_bgp(
            self._df(spark), [("?x", "likes", "?y")], [("?a", "in", "?b")]
        )
        assert out.count() == 3

    def test_minus_filters_prune_minus_group(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            minus_bgp,
        )

        out = minus_bgp(
            self._df(spark),
            [("?x", "likes", "?y")],
            [("?x", "in", "?n")],
            minus_filters=["n = 11"],
        )
        # only x=3 is in 11, and 3 never likes: nothing removed
        assert out.count() == 3
        out2 = minus_bgp(
            self._df(spark),
            [("?x", "likes", "?y")],
            [("?x", "in", "?n")],
            minus_filters=["n = 10"],
        )
        assert out2.count() == 0


class TestLocalClustering:
    def test_triangle_plus_pendant(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            local_clustering,
        )

        # triangle 1-2-3, pendant 4 hanging off 1 (directions arbitrary:
        # the operator works on the undirected distinct graph)
        edges = _edges(spark, [(1, 2, 1), (3, 1, 1), (2, 3, 1), (4, 1, 1)])
        got = {
            r.entity_id: (r.degree, r.n_triangles, r.lcc_ppm)
            for r in local_clustering(edges).collect()
        }
        assert got == {
            1: (3, 1, 333333),   # 2e6 * 1 div (3*2)
            2: (2, 1, 1000000),
            3: (2, 1, 1000000),
            4: (1, 0, 0),        # degree < 2: coefficient undefined -> 0
        }

    def test_duplicate_and_reverse_edges_collapse(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            local_clustering,
        )

        # same triangle stated redundantly in both directions
        edges = _edges(
            spark,
            [(1, 2, 1), (2, 1, 1), (2, 3, 1), (3, 2, 1), (1, 3, 1)],
        )
        got = {
            r.entity_id: (r.degree, r.n_triangles)
            for r in local_clustering(edges).collect()
        }
        assert got == {1: (2, 1), 2: (2, 1), 3: (2, 1)}


class TestLabeledBFSAndHarmonic:
    def _df(self, spark, pairs):
        return spark.createDataFrame(
            [(a, "p", b) for a, b in pairs],
            "subj_entity_id long, predicate string, obj_entity_id long",
        )

    def _seeds(self, spark, ids):
        return spark.createDataFrame([(i,) for i in ids], "entity_id long")

    def test_path_graph_per_source_distances(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            labeled_bfs_distances,
        )

        edges = self._df(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
        got = {
            (r.src, r.entity_id): r.dist
            for r in labeled_bfs_distances(
                edges, self._seeds(spark, [1, 4]), max_depth=2
            ).collect()
        }
        assert got == {
            (1, 1): 0, (1, 2): 1, (1, 3): 2,
            (4, 4): 0, (4, 3): 1, (4, 5): 1, (4, 2): 2,
        }

    def test_harmonic_centrality_integer_ppm(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            harmonic_centrality,
        )

        edges = self._df(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
        got = {
            r.src: (r.n_reached, r.harmonic_ppm)
            for r in harmonic_centrality(
                edges, self._seeds(spark, [1, 4]), max_depth=2
            ).collect()
        }
        # src 1 reaches 2@1, 3@2 -> 1e6 + 5e5; src 4 reaches 3@1, 5@1, 2@2
        assert got == {1: (2, 1500000), 4: (3, 2500000)}

    def test_isolated_seed_contributes_zero(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            harmonic_centrality,
        )

        edges = self._df(spark, [(1, 2)])
        out = harmonic_centrality(
            edges, self._seeds(spark, [1, 99]), max_depth=3
        ).collect()
        # seed 99 touches no edge: reaches nothing, so it has NO row
        # (dist>=1 filter) -- unreachable mass is never materialized
        assert {r.src: r.n_reached for r in out} == {1: 1}


class TestEntityFactSummary:
    def test_rarity_ranked_topk(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            entity_fact_summary,
        )

        edges = spark.createDataFrame(
            [
                (1, "common", 10), (1, "common", 11), (1, "rare", 12),
                (2, "common", 10), (2, "mid", 13),
                (3, "mid", 14),
            ],
            "subj_entity_id long, predicate string, obj_entity_id long",
        )
        got = {
            (r.subj_entity_id, r.rank): (r.predicate, r.obj_entity_id,
                                         r.pred_count)
            for r in entity_fact_summary(edges, k=2).collect()
        }
        assert got == {
            (1, 1): ("rare", 12, 1),
            (1, 2): ("common", 10, 3),  # tie on pred broken by obj asc
            (2, 1): ("mid", 13, 2),
            (2, 2): ("common", 10, 3),
            (3, 1): ("mid", 14, 2),
        }

    def test_k_validation(self, spark):
        import pytest as _pytest

        from nlp_series_relation_extraction_spark.operators.graph import (
            entity_fact_summary,
        )

        edges = spark.createDataFrame(
            [(1, "p", 2)],
            "subj_entity_id long, predicate string, obj_entity_id long",
        )
        with _pytest.raises(ValueError, match="k must be"):
            entity_fact_summary(edges, k=0)


class TestHyperANF:
    """HyperANF neighborhood function: exact python twin (same md5
    register placement, same sparse max-merge, same HLL estimator) and
    accuracy/diameter sanity on known graphs."""

    def _df(self, spark, pairs):
        return spark.createDataFrame(
            [(a, "p", b) for a, b in pairs],
            "subj_entity_id long, predicate string, obj_entity_id long",
        )

    @staticmethod
    def _twin(pairs, p, max_t):
        import hashlib
        import math

        m = 1 << p
        adj: dict[int, set[int]] = {}
        for a, b in pairs:
            if a == b:
                continue
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        verts = sorted(adj)
        w_bits = 60 - p

        def reg(v):
            h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
            w = h >> p
            rho = (w_bits + 1) if w == 0 else (w_bits + 1 - w.bit_length())
            return h % m, rho

        def estimate(cnts):
            alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(
                m, 0.7213 / (1 + 1.079 / m)
            )
            total = 0.0
            for regs in cnts.values():
                zeros = float(m - len(regs))
                ssum = sum(2.0 ** -r for r in regs.values())
                raw = alpha * m * m / (zeros + ssum)
                if raw <= 2.5 * m and zeros > 0:
                    total += m * math.log(m / zeros)
                else:
                    total += raw
            return total

        cnts = {v: dict([reg(v)]) for v in verts}
        curve = [(0, estimate(cnts))]
        for t in range(1, max_t + 1):
            nxt = {v: dict(r) for v, r in cnts.items()}
            for v in verts:
                for w in adj[v]:
                    for ridx, rho in cnts[w].items():
                        if nxt[v].get(ridx, 0) < rho:
                            nxt[v][ridx] = rho
            cnts = nxt
            est = estimate(cnts)
            curve.append((t, est))
            if est <= curve[-2][1]:
                break
        return curve

    PAIRS = [(i, i + 1) for i in range(20)] + [(5, 50), (50, 51), (3, 17)]

    def test_spark_curve_equals_python_twin(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            hyper_anf,
        )

        got = hyper_anf(self._df(spark, self.PAIRS), p=4, max_t=5)
        want = self._twin(self.PAIRS, p=4, max_t=5)
        assert [t for t, _ in got] == [t for t, _ in want]
        for (_, a), (_, b) in zip(got, want):
            assert abs(a - b) <= 1e-9 * max(abs(b), 1.0), (got, want)

    def test_curve_is_monotone_and_t0_estimates_vertices(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            hyper_anf,
        )

        curve = hyper_anf(self._df(spark, self.PAIRS), p=6, max_t=6)
        ests = [e for _, e in curve]
        assert all(b >= a - 1e-9 for a, b in zip(ests, ests[1:]))
        n_v = len({x for pr in self.PAIRS for x in pr})
        assert abs(ests[0] - n_v) / n_v < 0.35  # HLL error at m=64

    def test_complete_graph_saturates_at_one_hop(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            effective_diameter,
            hyper_anf,
        )

        pairs = [(i, j) for i in range(12) for j in range(i + 1, 12)]
        curve = hyper_anf(self._df(spark, pairs), p=6, max_t=4)
        # ball(v, 1) is already everything: the curve stops early
        assert curve[-1][0] <= 2
        assert effective_diameter(curve) <= 1
        # and the saturated estimate is near the true 12*12 pairs
        assert abs(curve[-1][1] - 144) / 144 < 0.35

    def test_path_graph_effective_diameter_tracks_length(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            effective_diameter,
            hyper_anf,
        )

        short = hyper_anf(self._df(spark, [(0, 1), (1, 2)]), p=6, max_t=8)
        long_ = hyper_anf(
            self._df(spark, [(i, i + 1) for i in range(9)]), p=6, max_t=12
        )
        assert effective_diameter(short) < effective_diameter(long_)

    def test_p_validation(self, spark):
        import pytest as _pytest

        from nlp_series_relation_extraction_spark.operators.graph import (
            hyper_anf,
        )

        with _pytest.raises(ValueError, match="p must be"):
            hyper_anf(self._df(spark, [(1, 2)]), p=0)


class TestDescribeAndAsk:
    EDGES = [
        (1, "likes", 2), (2, "likes", 3), (3, "likes", 1),
        (1, "in", 10), (4, "in", 10), (2, "self", 2),
    ]

    def _df(self, spark):
        return spark.createDataFrame(
            [(a, p, b) for a, p, b in self.EDGES],
            "subj_entity_id long, predicate string, obj_entity_id long",
        )

    def _seeds(self, spark, ids):
        return spark.createDataFrame([(i,) for i in ids], "entity_id long")

    def test_describe_roles(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            describe_entities,
        )

        out = {
            (r.subj_entity_id, r.predicate, r.obj_entity_id): r.role
            for r in describe_entities(
                self._df(spark), self._seeds(spark, [2])
            ).collect()
        }
        assert out == {
            (2, "likes", 3): "subject",
            (1, "likes", 2): "object",
            (2, "self", 2): "both",
        }

    def test_describe_multi_seed_dedups_edges(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            describe_entities,
        )

        # edge (1, likes, 2) is incident to BOTH seeds: one row, role
        # 'both' (subject seed 1, object seed 2)
        out = describe_entities(self._df(spark), self._seeds(spark, [1, 2]))
        rows = {
            (r.subj_entity_id, r.predicate, r.obj_entity_id): r.role
            for r in out.collect()
        }
        assert rows[(1, "likes", 2)] == "both"
        assert rows[(1, "in", 10)] == "subject"
        assert out.count() == len(rows)  # no duplicate edge rows

    def test_ask_existence_and_absence(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            ask_bgp,
        )

        df = self._df(spark)
        # a likes-cycle through 3 exists
        assert ask_bgp(
            df,
            [("?x", "likes", "?y"), ("?y", "likes", "?z"),
             ("?z", "likes", "?x")],
        )
        # nothing likes 10
        assert not ask_bgp(df, [("?x", "likes", "10")])
        # filters participate
        assert ask_bgp(df, [("?x", "in", "?n")], filters=["x % 2 = 0"])
        assert not ask_bgp(df, [("?x", "in", "?n")], filters=["x > 100"])


class TestPredicateInverses:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows,
            "subj_entity_id long, predicate string, obj_entity_id long",
        )

    def test_inverse_pair_and_symmetric_detection(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            predicate_inverses,
        )

        rows = [
            # parent/child: perfect inverses (2 of 2)
            (1, "parent_of", 2), (3, "parent_of", 4),
            (2, "child_of", 1), (4, "child_of", 3),
            # sibling: symmetric, one mutual pair + one one-way claim
            (5, "sibling", 6), (6, "sibling", 5), (7, "sibling", 8),
            # likes: unrelated, no reciprocity with anything
            (1, "likes", 9),
        ]
        got = {
            (r.pred_a, r.pred_b): (r.n_a, r.n_b, r.n_overlap, r.overlap_ppm)
            for r in predicate_inverses(self._df(spark, rows)).collect()
        }
        assert got == {
            ("child_of", "parent_of"): (2, 2, 2, 1000000),
            ("sibling", "sibling"): (3, 3, 1, 333333),
        }

    def test_self_loops_carry_no_symmetry_evidence(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            predicate_inverses,
        )

        rows = [(1, "same_as", 1), (2, "same_as", 2), (3, "same_as", 4)]
        assert predicate_inverses(self._df(spark, rows)).count() == 0

    def test_min_overlap_filters(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            predicate_inverses,
        )

        rows = [(1, "a", 2), (2, "b", 1), (5, "a", 6), (7, "b", 8)]
        assert predicate_inverses(self._df(spark, rows)).count() == 1
        assert (
            predicate_inverses(self._df(spark, rows), min_overlap=2).count()
            == 0
        )


class TestAggregateBindings:
    EDGES = [
        (1, "likes", 2), (1, "likes", 3), (2, "likes", 3),
        (4, "likes", 2),
        (1, "in", 10), (2, "in", 10), (3, "in", 11), (4, "in", 11),
    ]

    def _df(self, spark):
        return spark.createDataFrame(
            [(a, p, b) for a, p, b in self.EDGES],
            "subj_entity_id long, predicate string, obj_entity_id long",
        )

    def test_group_by_counts(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            aggregate_bindings,
        )

        # solutions (x, n): (1,10)x2, (2,10), (4,11) -> per-nation counts
        out = aggregate_bindings(
            self._df(spark),
            [("?x", "likes", "?y"), ("?x", "in", "?n")],
            group_by=["?n"],
            aggs={"n_links": "count(y)", "n_likers": "count(distinct x)"},
        )
        got = {r.n: (r.n_links, r.n_likers) for r in out.collect()}
        assert got == {10: (3, 2), 11: (1, 1)}

    def test_implicit_single_group_and_empty_solutions(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            aggregate_bindings,
        )

        out = aggregate_bindings(
            self._df(spark), [("?x", "likes", "?y")],
            group_by=[], aggs={"n": "count(x)", "mx": "max(y)"},
        ).collect()
        assert len(out) == 1 and out[0].n == 4 and out[0].mx == 3
        # SPARQL §11.1: aggregates over ZERO solutions still yield one
        # row (the implicit group), COUNT = 0 — same as SQL global agg
        empty = aggregate_bindings(
            self._df(spark), [("?x", "nosuch", "?y")],
            group_by=[], aggs={"n": "count(x)"},
        ).collect()
        assert len(empty) == 1 and empty[0].n == 0

    def test_having_applies_after_aggregation(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            aggregate_bindings,
        )

        out = aggregate_bindings(
            self._df(spark),
            [("?x", "likes", "?y"), ("?x", "in", "?n")],
            group_by=["n"],  # '?' optional
            aggs={"n_links": "count(y)"},
            having=["n_links >= 2"],
        ).collect()
        assert [(r.n, r.n_links) for r in out] == [(10, 3)]

    def test_bgp_keywords_pass_through(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            aggregate_bindings,
        )

        out = aggregate_bindings(
            self._df(spark),
            [("?x", "likes", "?y"), ("?x", "in", "?n")],
            group_by=["n"],
            aggs={"n_links": "count(y)"},
            filters=["y != 3"],  # pre-aggregation FILTER, earliest fold
        ).collect()
        assert {(r.n, r.n_links) for r in out} == {(10, 1), (11, 1)}

    def test_contract_errors(self, spark):
        import pytest

        from nlp_series_relation_extraction_spark.operators.graph import (
            aggregate_bindings,
        )

        with pytest.raises(ValueError, match="not bound"):
            aggregate_bindings(
                self._df(spark), [("?x", "likes", "?y")],
                group_by=["?zz"], aggs={"n": "count(x)"},
            )
        with pytest.raises(ValueError, match="at least one aggregate"):
            aggregate_bindings(
                self._df(spark), [("?x", "likes", "?y")],
                group_by=["?x"], aggs={},
            )


class TestFilterExistsBGP:
    EDGES = [
        (1, "likes", 2), (1, "likes", 3), (2, "likes", 3),
        (1, "in", 10), (2, "in", 10), (3, "in", 11),
    ]

    def _df(self, spark):
        return spark.createDataFrame(
            [(a, p, b) for a, p, b in self.EDGES],
            "subj_entity_id long, predicate string, obj_entity_id long",
        )

    def test_exists_shared_variable(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            filter_exists_bgp,
        )

        out = filter_exists_bgp(
            self._df(spark), [("?x", "likes", "?y")],
            exists=[("?x", "in", "10")],
        )
        assert {(r.x, r.y) for r in out.collect()} == {(1, 2), (1, 3), (2, 3)}

    def test_not_exists_is_complement_on_shared_vars(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            filter_exists_bgp,
        )

        req = [("?x", "likes", "?y")]
        inner = [("?x", "in", "10")]
        keep = filter_exists_bgp(self._df(spark), req, exists=inner)
        drop = filter_exists_bgp(self._df(spark), req, not_exists=inner)
        all_sol = {(1, 2), (1, 3), (2, 3)}
        got_keep = {(r.x, r.y) for r in keep.collect()}
        got_drop = {(r.x, r.y) for r in drop.collect()}
        assert got_keep | got_drop == all_sol
        assert got_keep & got_drop == set()

    def test_semi_join_never_multiplies_solutions(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            filter_exists_bgp,
        )

        # x=1 has TWO inner matches (in 10 via ?n binding both edges):
        # the solution must still appear exactly once (EXISTS is a
        # test, not a join)
        extra = self._df(spark).unionByName(
            spark.createDataFrame(
                [(1, "in", 12)],
                "subj_entity_id long, predicate string, obj_entity_id long",
            )
        )
        out = filter_exists_bgp(
            extra, [("?x", "likes", "?y")], exists=[("?x", "in", "?n")]
        )
        assert out.count() == 3  # not 4+: no multiplication for x=1

    def test_spec_divergence_vs_minus_on_disjoint_domains(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            filter_exists_bgp,
            minus_bgp,
        )

        # W3C SPARQL 1.1 §8.3.3: with NO shared variable, MINUS removes
        # nothing, but NOT EXISTS substitutes trivially and removes
        # EVERYTHING when the inner pattern matches at all.
        req = [("?x", "likes", "?y")]
        disjoint = [("?a", "in", "?b")]
        assert minus_bgp(self._df(spark), req, disjoint).count() == 3
        assert filter_exists_bgp(
            self._df(spark), req, not_exists=disjoint
        ).count() == 0
        # and EXISTS keeps everything in that case...
        assert filter_exists_bgp(
            self._df(spark), req, exists=disjoint
        ).count() == 3
        # ...while an inner pattern matching NOTHING flips both
        nomatch = [("?a", "nosuch", "?b")]
        assert filter_exists_bgp(
            self._df(spark), req, exists=nomatch
        ).count() == 0
        assert filter_exists_bgp(
            self._df(spark), req, not_exists=nomatch
        ).count() == 3

    def test_inner_group_as_dict_with_filters(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            filter_exists_bgp,
        )

        out = filter_exists_bgp(
            self._df(spark),
            [("?x", "likes", "?y")],
            exists={"patterns": [("?x", "in", "?n")], "filters": ["n = 11"]},
        )
        assert out.count() == 0  # only x=3 is in 11 and 3 never likes

    def test_exists_and_not_exists_compose(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            filter_exists_bgp,
        )

        out = filter_exists_bgp(
            self._df(spark),
            [("?x", "likes", "?y")],
            exists=[("?x", "in", "?n")],       # x located somewhere
            not_exists=[("?z", "likes", "?x")],  # nobody likes x back
        )
        # solutions: x in {1,2}; x=2 is liked by 1 -> only x=1 survives
        assert {(r.x, r.y) for r in out.collect()} == {(1, 2), (1, 3)}


class TestPathExpressions:
    # a two-level org: people -works_in-> teams -part_of-> orgs,
    # plus a 'knows' social layer and a mgr chain for repetition
    EDGES = [
        (1, "works_in", 20), (2, "works_in", 20), (3, "works_in", 21),
        (20, "part_of", 30), (21, "part_of", 30),
        (1, "knows", 2), (2, "knows", 3),
        (40, "mgr", 41), (41, "mgr", 42), (42, "mgr", 43),
    ]

    def _df(self, spark):
        return spark.createDataFrame(
            [(a, p, b) for a, p, b in self.EDGES],
            "subj_entity_id long, predicate string, obj_entity_id long",
        )

    def _pairs(self, df):
        return {(r.src, r.dst) for r in df.collect()}

    def test_sequence_composes(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            match_path_expr,
        )

        got = self._pairs(
            match_path_expr(self._df(spark), ("seq", "works_in", "part_of"))
        )
        assert got == {(1, 30), (2, 30), (3, 30)}

    def test_inverse_swaps(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            match_path_expr,
        )

        got = self._pairs(
            match_path_expr(self._df(spark), ("inv", "works_in"))
        )
        assert got == {(20, 1), (20, 2), (21, 3)}

    def test_alternative_unions_and_dedups(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            match_path_expr,
        )

        got = self._pairs(
            match_path_expr(self._df(spark), ("alt", "works_in", "knows"))
        )
        assert got == {(1, 20), (2, 20), (3, 21), (1, 2), (2, 3)}

    def test_negated_property_set(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            match_path_expr,
        )

        # !(works_in|part_of|mgr) leaves exactly the knows layer
        got = self._pairs(
            match_path_expr(
                self._df(spark), ("neg", ["works_in", "part_of", "mgr"])
            )
        )
        assert got == {(1, 2), (2, 3)}

    def test_colleagues_via_seq_inv(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            match_path_expr,
        )

        # works_in/^works_in = same-team pairs (incl. self)
        got = self._pairs(
            match_path_expr(
                self._df(spark), ("seq", "works_in", ("inv", "works_in"))
            )
        )
        assert got == {(1, 1), (1, 2), (2, 1), (2, 2), (3, 3)}

    def test_repetition_of_composite_step(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            match_path_expr,
        )

        # (mgr|knows){1,3}: chains inside each layer, minimal hops
        out = match_path_expr(
            self._df(spark), ("alt", "mgr", "knows"), max_hops=3
        )
        got = {(r.src, r.dst): r.hops for r in out.collect()}
        assert got[(40, 41)] == 1 and got[(40, 42)] == 2
        assert got[(40, 43)] == 3 and got[(1, 3)] == 2
        # min_hops trims the short chains
        trimmed = match_path_expr(
            self._df(spark), ("alt", "mgr", "knows"),
            max_hops=3, min_hops=2,
        )
        assert all(r.hops >= 2 for r in trimmed.collect())

    def test_single_predicate_expr_equals_match_path(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            match_path,
            match_path_expr,
        )

        a = match_path(self._df(spark), "mgr", max_hops=3)
        b = match_path_expr(self._df(spark), "mgr", max_hops=3)
        assert {(r.src, r.dst, r.hops) for r in a.collect()} == {
            (r.src, r.dst, r.hops) for r in b.collect()
        }

    def test_contract_errors(self, spark):
        import pytest

        from nlp_series_relation_extraction_spark.operators.graph import (
            compile_path_step,
            match_path_expr,
        )

        df = self._df(spark)
        with pytest.raises(ValueError, match="unknown operator"):
            compile_path_step(df, ("star", "mgr"))
        with pytest.raises(ValueError, match="variable"):
            compile_path_step(df, "?p")
        with pytest.raises(ValueError, match="non-empty predicate list"):
            compile_path_step(df, ("neg", []))
        with pytest.raises(ValueError, match="predicate IRIs only"):
            compile_path_step(df, ("neg", [("inv", "mgr")]))
        with pytest.raises(ValueError, match="bad hop bounds"):
            match_path_expr(df, "mgr", max_hops=0)


class TestBind:
    EDGES = [(1, "likes", 2), (2, "likes", 3), (1, "in", 10)]

    def _df(self, spark):
        return spark.createDataFrame(
            [(a, p, b) for a, p, b in self.EDGES],
            "subj_entity_id long, predicate string, obj_entity_id long",
        )

    def test_bind_extends_solutions(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            match_bgp,
        )

        out = match_bgp(
            self._df(spark), [("?x", "likes", "?y")],
            bind={"?total": "x + y", "flag": "total > 4"},
        )
        got = {(r.x, r.y, r.total, r.flag) for r in out.collect()}
        assert got == {(1, 2, 3, False), (2, 3, 5, True)}

    def test_bind_target_must_be_fresh(self, spark):
        import pytest

        from nlp_series_relation_extraction_spark.operators.graph import (
            match_bgp,
        )

        with pytest.raises(ValueError, match="already bound"):
            match_bgp(
                self._df(spark), [("?x", "likes", "?y")],
                bind={"y": "x + 1"},
            )

    def test_bind_composes_with_aggregates(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            aggregate_bindings,
        )

        # GROUP BY a BOUND expression: bucket = y % 2
        out = aggregate_bindings(
            self._df(spark), [("?x", "likes", "?y")],
            group_by=["bucket"], aggs={"n": "count(x)"},
            bind={"bucket": "y % 2"},
        )
        assert {(r.bucket, r.n) for r in out.collect()} == {(0, 1), (1, 1)}


class TestSparqlUpdate:
    """sparql_update: DELETE/INSERT WHERE over the triple-key graph.
    Pinned semantics (W3C SPARQL 1.1 Update section 3.1.3): templates
    instantiate against ONE pre-update solution set; result =
    (graph MINUS delete) UNION insert as a SET."""

    EDGES = [
        (1, "in_nation", 10), (2, "in_nation", 10), (3, "in_nation", 11),
        (10, "in_region", 100), (11, "in_region", 101),
        (5, "vip", 1),
    ]

    def _df(self, spark, edges=None):
        return spark.createDataFrame(
            [(a, p, b) for a, p, b in (edges or self.EDGES)],
            "subj_entity_id long, predicate string, obj_entity_id long",
        )

    def _run(self, spark, **kw):
        from nlp_series_relation_extraction_spark.operators.graph import (
            sparql_update,
        )

        out = sparql_update(self._df(spark, kw.pop("edges", None)), **kw)
        return {
            (r.subj_entity_id, r.predicate, r.obj_entity_id)
            for r in out.collect()
        }

    def test_delete_insert_rewires_matched_edges_only(self, spark):
        # customers of region-100 nations move to the region directly
        got = self._run(
            spark,
            where=[("?c", "in_nation", "?n"), ("?n", "in_region", "100")],
            delete=[("?c", "in_nation", "?n")],
            insert=[("?c", "in_region_direct", "100")],
        )
        assert got == {
            (3, "in_nation", 11),          # different region: untouched
            (10, "in_region", 100), (11, "in_region", 101),
            (5, "vip", 1),
            (1, "in_region_direct", 100), (2, "in_region_direct", 100),
        }

    def test_templates_see_pre_update_graph(self, spark):
        # DELETE the very triples the WHERE matched while INSERT re-derives
        # from the same solutions: insert still fires for every match.
        got = self._run(
            spark,
            where=[("?n", "in_region", "?r")],
            delete=[("?n", "in_region", "?r")],
            insert=[("?r", "has_nation", "?n")],
        )
        assert (100, "has_nation", 10) in got
        assert (101, "has_nation", 11) in got
        assert not any(p == "in_region" for _, p, _ in got)

    def test_delete_and_reinsert_same_triple_survives(self, spark):
        got = self._run(
            spark,
            where=[("?c", "in_nation", "10")],
            delete=[("?c", "in_nation", "10")],
            insert=[("?c", "in_nation", "10")],
        )
        assert {(1, "in_nation", 10), (2, "in_nation", 10)} <= got

    def test_unbound_optional_var_instantiates_no_triple(self, spark):
        # nation 11 has no vip customer: optional leaves ?v unbound, so
        # the ?v template row drops while the bound one fires.
        got = self._run(
            spark,
            where=[("?n", "in_region", "?r")],
            optional=[("?v", "vip", "?n")],
            insert=[("?v", "vip_region", "?r")],
        )
        # ids: vip edge is (5, vip, 1) -> nation var must match obj; no
        # nation is object of vip here, so nothing inserts, nothing lost
        assert got == set(self.EDGES)

    def test_unbound_optional_partial_binding(self, spark):
        edges = self.EDGES + [(5, "vip", 10)]
        got = self._run(
            spark,
            edges=edges,
            where=[("?n", "in_region", "?r")],
            optional=[("?v", "vip", "?n")],
            insert=[("?v", "vip_region", "?r")],
        )
        assert got == set(edges) | {(5, "vip_region", 100)}

    def test_set_semantics_on_duplicate_input(self, spark):
        edges = self.EDGES + [(1, "in_nation", 10)] * 3
        got_rows = self._run(
            spark,
            edges=edges,
            where=[("?c", "vip", "?x")],
            delete=[("?c", "vip", "?x")],
        )
        assert got_rows == set(self.EDGES) - {(5, "vip", 1)}

    def test_requires_some_template(self, spark):
        with pytest.raises(ValueError, match="delete/insert"):
            self._run(spark, where=[("?c", "vip", "?x")])

    def test_insert_only_equals_construct_union(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            construct_triples,
        )

        where = [("?c", "in_nation", "?n"), ("?n", "in_region", "?r")]
        got = self._run(
            spark, where=where, insert=[("?c", "cust_region", "?r")]
        )
        built = construct_triples(
            self._df(spark), where, ("?c", "cust_region", "?r")
        )
        expect = set(self.EDGES) | {
            (r.subj_entity_id, r.predicate, r.obj_entity_id)
            for r in built.collect()
        }
        assert got == expect


# --- betweenness centrality (Brandes, pivot-sampled) ----------------------


class TestBetweenness:
    def _run(self, spark, rows, **kw):
        from nlp_series_relation_extraction_spark.operators.graph import (
            betweenness_centrality,
        )

        out = betweenness_centrality(
            _edges(spark, [(a, b, 1) for a, b in rows]), **kw
        )
        return {r.entity_id: (r.delta_sum, r.bc_est) for r in out.collect()}

    def test_path_graph_exact_hand_values(self, spark):
        # path 1-2-3-4-5, all pivots, no truncation: classic betweenness
        # (pairs counted twice, once per direction): b(3)=8, b(2)=b(4)=6
        rows = [(1, 2), (2, 3), (3, 4), (4, 5)]
        got = self._run(spark, rows, n_pivots=5, max_depth=10)
        want = {1: 0.0, 2: 6.0, 3: 8.0, 4: 6.0, 5: 0.0}
        for v, b in want.items():
            assert abs(got.get(v, (0.0, 0.0))[0] - b) < 1e-9, v
        # with n_pivots == |V| the estimator scale is 1: bc_est == delta
        for v, (d, e) in got.items():
            assert abs(d - e) < 1e-9

    def test_star_and_diamond_multiplicity(self, spark):
        # star: center carries ALL pairwise dependencies; leaves none.
        star = [(0, i) for i in range(1, 6)]
        got = self._run(spark, star, n_pivots=6, max_depth=4)
        assert abs(got[0][0] - 2 * (5 * 4 / 2)) < 1e-9  # 20 ordered pairs
        for leaf in range(1, 6):
            assert abs(got.get(leaf, (0.0, 0.0))[0]) < 1e-9
        # diamond 1-2-4, 1-3-4: two equal shortest paths split sigma
        diamond = [(1, 2), (1, 3), (2, 4), (3, 4)]
        got = self._run(spark, diamond, n_pivots=4, max_depth=4)
        assert abs(got[2][0] - 1.0) < 1e-9  # half of each 1<->4 pair
        assert abs(got[3][0] - 1.0) < 1e-9

    def test_matches_python_twin_sampled_and_truncated(self, spark):
        from nlp_series_relation_extraction_spark.operators.graph import (
            betweenness_python,
        )

        rng = np.random.default_rng(5)
        rows = sorted(
            {
                (int(a), int(b))
                for a, b in rng.integers(0, 40, size=(120, 2))
                if a != b
            }
        )
        for kw in (
            {"n_pivots": 40, "max_depth": 10},
            {"n_pivots": 7, "max_depth": 10},
            {"n_pivots": 40, "max_depth": 2},
        ):
            got = self._run(spark, rows, **kw)
            want = betweenness_python(rows, **kw)
            keys = set(got) | set(want)
            for v in keys:
                g = got.get(v, (0.0, 0.0))[0]
                w = want.get(v, 0.0)
                assert abs(g - w) < 1e-9, (kw, v, g, w)

    def test_estimator_scale(self, spark):
        # k pivots over n vertices: bc_est = delta_sum * n / k
        rows = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)]
        got = self._run(spark, rows, n_pivots=3, max_depth=10)
        for v, (d, e) in got.items():
            assert abs(e - d * 6.0 / 3.0) < 1e-9


# --- graph-heuristic link prediction scores --------------------------------


class TestLinkScores:
    def _run(self, spark, rows, **kw):
        from nlp_series_relation_extraction_spark.operators.graph import (
            link_scores,
        )

        out = link_scores(_edges(spark, [(a, b, 1) for a, b in rows]), **kw)
        return {
            (r.entity_a, r.entity_b): (r.cn, r.jaccard_ppm, r.ra_ppm)
            for r in out.collect()
        }

    def test_hand_computed_square(self, spark):
        # square 1-2-3-4-1: each diagonal pair shares exactly its two
        # adjacent corners; all degrees are 2
        rows = [(1, 2), (2, 3), (3, 4), (4, 1)]
        got = self._run(spark, rows, min_common=2)
        # (1,3): cn=2 via {2,4}; jaccard = 2/(2+2-2) = 1.0; ra = 2*(1e6//2)
        assert got == {
            (1, 3): (2, 1_000_000, 1_000_000),
            (2, 4): (2, 1_000_000, 1_000_000),
        }

    def test_existing_edges_excluded_and_min_common(self, spark):
        # triangle + pendant: every two-hop pair is already an edge
        rows = [(1, 2), (2, 3), (1, 3), (3, 4)]
        # via witness 3 (deg 3): ra = 1e6//3; jaccard = 1/(2+1-1) = 1/2
        assert self._run(spark, rows, min_common=1) == {
            (1, 4): (1, 500_000, 333_333),
            (2, 4): (1, 500_000, 333_333),
        }
        assert self._run(spark, rows, min_common=2) == {}

    def test_hub_cap_drops_witness_role_only(self, spark):
        # star center 0 (deg 4) + edge 1-2: pairs through 0 vanish when
        # the cap excludes it as witness, but 0 still appears as an
        # ENDPOINT of pairs witnessed by small-degree vertices
        rows = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2)]
        full = self._run(spark, rows, min_common=1)
        assert (3, 4) in full and (1, 3) in full
        # 0 as endpoint: pair (0, ...) witnessed by 1 or 2? 0-1-2 and
        # 0-2-1 lead back to adjacent (0,2)/(0,1) — excluded as edges
        # cap at 3 excludes the center (deg 4) as witness; remaining
        # witnesses 1 and 2 (deg 2) only reach pairs that are already
        # edges, so nothing survives
        capped = self._run(spark, rows, min_common=1, max_hub_degree=3)
        assert capped == {}

    def test_ra_uses_witness_degree(self, spark):
        # path 1-2-3 plus 2-4: pair (1,3),(1,4),(3,4) via witness 2 (deg 3)
        rows = [(1, 2), (2, 3), (2, 4)]
        got = self._run(spark, rows, min_common=1)
        assert got[(1, 3)] == (1, 1_000_000, 333_333)
        assert got[(1, 4)] == (1, 1_000_000, 333_333)
        assert got[(3, 4)] == (1, 1_000_000, 333_333)
