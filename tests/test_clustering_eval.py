"""Clustering-quality metrics (evaluation/clustering.py): hand-computed
contingency example, boundary conventions, invariances, and the
composition with the linking operator. The driver query's DuckDB twin
(kg_clustering_eval) runs under tests/test_oracle_crosscheck.py."""

from pyspark.sql import functions as F

from nlp_series_relation_extraction_spark.evaluation.clustering import (
    clustering_eval,
)


def _assign(spark, rows):
    return spark.createDataFrame(
        rows, "item_id string, pred_cluster string, gold_cluster string"
    )


def _row(df):
    return df.collect()[0].asDict()


def test_hand_computed_contingency_values(spark):
    """pred {a,b,c}{d} vs gold {a,b}{c,d}: tp=1, pred_pairs=3,
    gold_pairs=2 -> pairwise P=1/3 R=1/2 F1=0.4; B3 P=2/3 R=3/4 (all in
    truncating ppm, the exact numbers the integer arithmetic yields)."""
    r = _row(
        clustering_eval(
            _assign(
                spark,
                [
                    ("a", "P1", "G1"),
                    ("b", "P1", "G1"),
                    ("c", "P1", "G2"),
                    ("d", "P2", "G2"),
                ],
            )
        )
    )
    assert r["n_items"] == 4
    assert (r["tp_pairs"], r["pred_pairs"], r["gold_pairs"]) == (1, 3, 2)
    assert r["pair_precision_ppm"] == 333333
    assert r["pair_recall_ppm"] == 500000
    # ~0.4; F1 is computed FROM the truncated ppm p/r, so the integer
    # arithmetic lands one ppm under the rational value
    assert r["pair_f1_ppm"] == (2 * 333333 * 500000) // (333333 + 500000)
    # B3 sums: P: 4/3 + 1/3 + 1 = 8/3 -> (1333333+333333+1000000)//4
    assert r["b3_precision_ppm"] == 666666
    # R: 4/2 + 1/2 + 1/2 = 3 -> 3000000 // 4
    assert r["b3_recall_ppm"] == 750000
    assert r["b3_f1_ppm"] == (2 * 666666 * 750000) // (666666 + 750000)


def test_perfect_clustering_is_unity(spark):
    rows = [(f"i{k}", f"c{k % 3}", f"g{k % 3}") for k in range(12)]
    r = _row(clustering_eval(_assign(spark, rows)))
    for col in (
        "pair_precision_ppm", "pair_recall_ppm", "pair_f1_ppm",
        "b3_precision_ppm", "b3_recall_ppm", "b3_f1_ppm",
    ):
        assert r[col] == 1_000_000, col


def test_all_singletons_convention(spark):
    """No predicted pairs: pairwise precision defined as 1.0 (an empty
    claim set makes no errors), recall 0, F1 0."""
    rows = [(f"i{k}", f"solo{k}", "g0") for k in range(5)]
    r = _row(clustering_eval(_assign(spark, rows)))
    assert r["pred_pairs"] == 0 and r["tp_pairs"] == 0
    assert r["pair_precision_ppm"] == 1_000_000
    assert r["pair_recall_ppm"] == 0 and r["pair_f1_ppm"] == 0
    # B3 precision of singletons is exactly 1; recall 1/5 per item
    assert r["b3_precision_ppm"] == 1_000_000
    assert r["b3_recall_ppm"] == 200_000


def test_cluster_id_relabeling_invariance(spark):
    rows = [
        ("a", "x", "g1"), ("b", "x", "g1"), ("c", "y", "g2"),
        ("d", "y", "g1"), ("e", "z", "g2"),
    ]
    relabeled = [(i, "PRED_" + p * 2, "GOLD~" + g) for i, p, g in rows]
    r1 = _row(clustering_eval(_assign(spark, rows)))
    r2 = _row(clustering_eval(_assign(spark, relabeled)))
    assert r1 == r2


def test_over_merge_hurts_pairwise_more_than_b3(spark):
    """One giant wrong merge: pairwise precision collapses quadratically
    (all cross pairs are fp), B3 degrades linearly in items — the reason
    both metrics are reported."""
    rows = [(f"i{k}", "merged", f"g{k // 2}") for k in range(20)]
    r = _row(clustering_eval(_assign(spark, rows)))
    assert r["pair_precision_ppm"] < 100_000  # 10/C(20,2) ~ 5.3%
    assert r["b3_precision_ppm"] == 100_000  # 2/20 exactly per item


def test_linking_composition_scores_planted_typo_families(spark):
    """End-to-end ER eval: link_mentions over planted typo families,
    scored against the generating gold — near-perfect F1, via the
    contingency path only (no pair enumeration anywhere)."""
    from nlp_series_relation_extraction_spark.operators.linking import (
        link_mentions,
    )

    base = ["knowledge graph", "entity resolution", "spark pipeline",
            "record linkage"]
    variants = []
    for g, name in enumerate(base):
        variants += [
            (f"{g}:0", name, g), (f"{g}:1", name + "s", g),
            (f"{g}:2", name.replace(" ", "  "), g),
        ]
    mentions = spark.createDataFrame(
        [(mid, 0, m) for mid, m, _ in variants],
        "conv_id string, turn_idx int, mention string",
    )
    aliases = link_mentions(mentions, threshold=0.35)["aliases"]
    gold = spark.createDataFrame(
        [(m.lower().strip(), str(g)) for _, m, g in variants],
        "mention_norm string, gold_cluster string",
    ).dropDuplicates(["mention_norm"])
    assign = aliases.join(gold, "mention_norm").select(
        F.col("mention_norm").alias("item_id"),
        F.col("entity_id").cast("string").alias("pred_cluster"),
        "gold_cluster",
    )
    r = _row(clustering_eval(assign))
    assert r["n_items"] >= 10
    assert r["pair_f1_ppm"] >= 800_000
    assert r["b3_f1_ppm"] >= 800_000
