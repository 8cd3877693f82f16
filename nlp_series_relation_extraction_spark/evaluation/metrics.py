"""DuIE-style exact-match evaluation as distributed DataFrame jobs.

Semantics replicate the reference exactly (``run_evaluation.py:179-255``):

* a predicted triple is a tp iff SOME gold triple in the same turn has equal
  ``predicate``, equal ``subject`` string, and equal whole ``object`` map;
  duplicate predictions each count (the reference loops over predictions,
  each `break`ing on its own match);
* fn = total gold - total tp (the reference computes per-turn
  ``len(gold) - tp`` and sums, which telescopes to the same corpus number);
* micro p = tp/(tp+fp), r = tp/(tp+fn), f = 2pr/(p+r), 0-guarded;
* entity EM: per-turn ``|set(pred) ∩ set(gold)|`` summed, precision/recall
  against set sizes, x100 (``run_evaluation.py:191-208``).

The object map is canonicalized to a sorted-entry JSON string before joining
(maps have no deterministic serialization order otherwise). All joins are
plain equi-joins on (conv_id, turn_idx, predicate, subject, object_json) —
Catalyst picks sort-merge with AQE skew splitting; the gold side of a
fixed-eval-set comparison is typically small enough to broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TRIPLE_KEY = ["conv_id", "turn_idx", "predicate", "subject", "object_json"]


def with_object_json(df: DataFrame, map_col: str = "object") -> DataFrame:
    """Add a deterministic JSON form of the object map (sorted by key)."""
    return df.withColumn(
        "object_json",
        F.to_json(F.map_from_entries(F.array_sort(F.map_entries(map_col)))),
    )


def triple_prf(pred: DataFrame, gold: DataFrame) -> DataFrame:
    """One-row DataFrame: tp/fp/fn + micro precision/recall/f1.

    ``pred``/``gold``: triple tables with (conv_id, turn_idx, predicate,
    subject, object map). A LEFT SEMI join keeps each prediction at most
    once regardless of duplicate gold rows, so no gold-side dedup shuffle
    is needed for correct tp counting.
    """
    p = with_object_json(pred).select(*TRIPLE_KEY)
    g = with_object_json(gold).select(*TRIPLE_KEY)

    counts = (
        p.join(g, on=TRIPLE_KEY, how="left_semi")
        .agg(F.count("*").alias("tp"))
        .crossJoin(p.agg(F.count("*").alias("pred_total")))
        .crossJoin(
            with_object_json(gold)
            .select(*TRIPLE_KEY)
            .agg(F.count("*").alias("gold_total"))
        )
    )
    return counts.select(
        F.col("tp"),
        (F.col("pred_total") - F.col("tp")).alias("fp"),
        (F.col("gold_total") - F.col("tp")).alias("fn"),
    ).select(
        "tp",
        "fp",
        "fn",
        F.when(F.col("tp") + F.col("fp") != 0, F.col("tp") / (F.col("tp") + F.col("fp")))
        .otherwise(F.lit(0.0))
        .alias("precision"),
        F.when(F.col("tp") + F.col("fn") != 0, F.col("tp") / (F.col("tp") + F.col("fn")))
        .otherwise(F.lit(0.0))
        .alias("recall"),
    ).select(
        "tp",
        "fp",
        "fn",
        "precision",
        "recall",
        F.when(
            F.col("precision") + F.col("recall") != 0,
            2 * F.col("precision") * F.col("recall")
            / (F.col("precision") + F.col("recall")),
        )
        .otherwise(F.lit(0.0))
        .alias("f1"),
    )


def entity_em(pred_entities: DataFrame, gold_entities: DataFrame) -> DataFrame:
    """Entity exact-match micro metrics (x100, reference scaling).

    Inputs: (conv_id, turn_idx, mention) tables; mentions are set-deduped
    per turn before intersection, exactly like ``set(pred) & set(gold)``.
    """
    key = ["conv_id", "turn_idx", "mention"]
    p = pred_entities.select(*key).distinct()
    g = gold_entities.select(*key).distinct()
    em = p.join(g, on=key, how="left_semi").agg(F.count("*").alias("em"))
    totals = em.crossJoin(p.agg(F.count("*").alias("pred_num"))).crossJoin(
        g.agg(F.count("*").alias("gold_num"))
    )
    return totals.select(
        "em",
        "pred_num",
        "gold_num",
        F.when(F.col("pred_num") > 0, 100.0 * F.col("em") / F.col("pred_num"))
        .otherwise(F.lit(0.0))
        .alias("entity_precision"),
        F.when(F.col("gold_num") > 0, 100.0 * F.col("em") / F.col("gold_num"))
        .otherwise(F.lit(0.0))
        .alias("entity_recall"),
    ).select(
        "em",
        "pred_num",
        "gold_num",
        "entity_precision",
        "entity_recall",
        F.when(
            F.col("entity_precision") + F.col("entity_recall") != 0,
            2.0
            * F.col("entity_precision")
            * F.col("entity_recall")
            / (F.col("entity_precision") + F.col("entity_recall")),
        )
        .otherwise(F.lit(0.0))
        .alias("entity_f1"),
    )
