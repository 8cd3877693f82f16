"""CEAF optimal-alignment clustering scores (evaluation/clustering.py:
ceaf_eval, Luo EMNLP 2005): the integer Hungarian against brute-force
permutations, hand-computed phi3/phi4 fixtures, a global-matrix python
twin validating the per-component decomposition, and the loud component
cap. `kg_ceaf_eval` is the rows-only driver query over a planted split
assignment."""

from itertools import permutations

import pytest
from pyspark.sql import functions as F

from nlp_series_relation_extraction_spark.evaluation.clustering import (
    _hungarian_max,
    ceaf_eval,
)

_PPM = 1_000_000


def _brute_max(w):
    if not w or not w[0]:
        return 0
    r, c = len(w), len(w[0])
    if r > c:
        w = [[w[i][j] for i in range(r)] for j in range(c)]
        r, c = c, r
    return max(
        sum(w[i][p[i]] for i in range(r))
        for p in permutations(range(c), r)
    )


def _assign(spark, triples):
    return spark.createDataFrame(
        triples, "item_id long, pred_cluster string, gold_cluster string"
    )


class TestHungarian:
    def test_matches_bruteforce_on_seeded_matrices(self):
        # deterministic xorshift-ish generator (no random module state)
        x = 88172645463325252
        def nxt():
            nonlocal x
            x ^= (x << 13) & (2**64 - 1)
            x ^= x >> 7
            x ^= (x << 17) & (2**64 - 1)
            return x % 1000
        for r, c in [(1, 1), (2, 3), (3, 2), (4, 4), (5, 7), (7, 5), (6, 6)]:
            w = [[nxt() for _ in range(c)] for _ in range(r)]
            assert _hungarian_max(w) == _brute_max(w), (r, c, w)

    def test_zero_and_empty(self):
        assert _hungarian_max([]) == 0
        assert _hungarian_max([[0, 0], [0, 0]]) == 0

    def test_prefers_total_over_greedy(self):
        # greedy takes 10 then 1 (=11); optimum is 9 + 8 (=17)
        assert _hungarian_max([[10, 9], [8, 1]]) == 17


def _python_twin(triples):
    """Global (non-decomposed) CEAF over the full contingency matrix —
    the decomposition-free reference for the per-component Spark path."""
    dedup = {}
    for it, pc, gc in triples:
        dedup.setdefault(it, (pc, gc))
    cells = {}
    for pc, gc in dedup.values():
        cells[(pc, gc)] = cells.get((pc, gc), 0) + 1
    preds = sorted({pc for pc, _ in cells})
    golds = sorted({gc for _, gc in cells})
    m = [[cells.get((p, g), 0) for g in golds] for p in preds]
    n_i = [sum(row) for row in m]
    n_j = [sum(m[i][j] for i in range(len(preds)))
           for j in range(len(golds))]
    w_e = [
        [(2 * m[i][j] * _PPM) // (n_i[i] + n_j[j])
         for j in range(len(golds))]
        for i in range(len(preds))
    ]
    n = len(dedup)
    phi_m, phi_e = _hungarian_max(m), _hungarian_max(w_e)
    r, k = len(preds), len(golds)
    prec = _PPM if r == 0 else phi_e // r
    rec = _PPM if k == 0 else phi_e // k
    return {
        "n_items": n,
        "n_pred_clusters": r,
        "n_gold_clusters": k,
        "ceaf_m_ppm": _PPM if n == 0 else (_PPM * phi_m) // n,
        "ceaf_e_precision_ppm": prec,
        "ceaf_e_recall_ppm": rec,
        "ceaf_e_f1_ppm": 0 if prec + rec == 0
        else (2 * prec * rec) // (prec + rec),
    }


class TestCeafEval:
    def test_perfect_clustering_scores_one(self, spark):
        triples = [(i, f"c{i % 3}", f"c{i % 3}") for i in range(12)]
        row = ceaf_eval(_assign(spark, triples)).collect()[0]
        assert row.ceaf_m_ppm == _PPM
        assert row.ceaf_e_precision_ppm == _PPM
        assert row.ceaf_e_recall_ppm == _PPM
        assert row.ceaf_e_f1_ppm == _PPM

    def test_singletons_vs_one_cluster_hand_computed(self, spark):
        # pred: 4 singletons; gold: one 4-cluster. phi3* = 1 ->
        # ceaf_m = 250000. phi4 per pair = (2*1e6)//5 = 400000 ->
        # P = 400000//4 = 100000, R = 400000//1 = 400000, F1 = 160000
        triples = [(i, f"s{i}", "g") for i in range(4)]
        row = ceaf_eval(_assign(spark, triples)).collect()[0]
        assert (row.n_pred_clusters, row.n_gold_clusters) == (4, 1)
        assert row.ceaf_m_ppm == 250_000
        assert row.ceaf_e_precision_ppm == 100_000
        assert row.ceaf_e_recall_ppm == 400_000
        assert row.ceaf_e_f1_ppm == 160_000

    def test_matches_global_twin_across_components(self, spark):
        # several disjoint overlap neighborhoods + one 3-cluster tangle:
        # the per-component decomposition must equal the global matrix
        triples = []
        it = 0
        for blk in range(4):
            for i in range(6):
                pred = f"p{blk}_{i // 3}"
                gold = f"g{blk}_{i // 2}"
                triples.append((it, pred, gold))
                it += 1
        # the tangle: one pred spanning two golds of different blocks
        triples += [(it, "px", "g0_0"), (it + 1, "px", "g1_0")]
        got = ceaf_eval(_assign(spark, triples)).collect()[0].asDict()
        assert got == _python_twin(triples)

    def test_partitioning_invariant(self, spark):
        triples = [
            (i, f"p{i % 5}", f"g{(i * 7) % 4}") for i in range(40)
        ]
        df = _assign(spark, triples)
        a = ceaf_eval(df.repartition(13)).collect()[0]
        b = ceaf_eval(df.coalesce(1)).collect()[0]
        assert a == b
        assert a.asDict() == _python_twin(triples)

    def test_component_cap_fails_loud(self, spark):
        # a RECTANGULAR tangle (2 preds x 4 golds in one component),
        # cap at 3 — must fail loud before the Hungarian
        triples = [(i, "ab"[i % 2], f"g{i // 2}") for i in range(8)]
        with pytest.raises(Exception, match="max_component_clusters"):
            ceaf_eval(
                _assign(spark, triples), max_component_clusters=3
            ).collect()

    def test_catch_all_cluster_is_trivial_not_capped(self, spark):
        # 1xN components bypass the Hungarian AND the cap: a catch-all
        # pred over 60 golds (way past the cap) evaluates cheaply via
        # the JVM max path, and matches the global twin
        triples = [(i, "all", f"g{i % 60}") for i in range(60)]
        got = ceaf_eval(
            _assign(spark, triples), max_component_clusters=3
        ).collect()[0]
        assert got.asDict() == _python_twin(triples)

    def test_multi_assignment_deduped_min(self, spark):
        # duplicate item rows: deterministic min-per-side dedup (same
        # convention as clustering_eval/muc_eval)
        triples = [(1, "b", "g"), (1, "a", "g"), (2, "a", "g")]
        row = ceaf_eval(_assign(spark, triples)).collect()[0]
        assert row.n_items == 2
        assert row.n_pred_clusters == 1  # both items land in 'a'
        assert row.ceaf_m_ppm == _PPM


def test_conll_score_is_member_mean(spark):
    """kg_conll_score: member columns equal the standalone evaluators on
    the same assignment; the CoNLL value is their truncating ppm mean."""
    from nlp_series_relation_extraction_spark.evaluation.clustering import (
        clustering_eval,
        muc_eval,
    )
    from nlp_series_relation_extraction_spark.plans.queries import (
        q_kg_conll_score,
    )

    SF = "/root/testdata/sf0.001"
    row = q_kg_conll_score(spark, SF).collect()[0]
    assert row.conll_f1_ppm == (
        row.muc_f1_ppm + row.b3_f1_ppm + row.ceaf_e_f1_ppm
    ) // 3

    import pyspark.sql.functions as F

    o = spark.read.parquet(f"{SF}/orders.parquet")
    gold = F.concat(F.lit("c"), F.col("o_custkey").cast("string"))
    assign = o.select(
        F.col("o_orderkey").alias("item_id"),
        F.when(
            F.col("o_orderkey") % 97 == 0, F.concat(gold, F.lit("_b"))
        ).otherwise(gold).alias("pred_cluster"),
        gold.alias("gold_cluster"),
    )
    muc = muc_eval(assign).collect()[0]
    b3 = clustering_eval(assign).collect()[0]
    ceaf = ceaf_eval(assign).collect()[0]
    assert row.muc_f1_ppm == muc.muc_f1_ppm
    assert row.b3_f1_ppm == b3.b3_f1_ppm
    assert row.ceaf_e_f1_ppm == ceaf.ceaf_e_f1_ppm
    assert 0 < row.conll_f1_ppm < _PPM  # the split plant costs something
