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


def calibration_report(
    scored: DataFrame,
    score_col: str = "score_ppm",
    label_col: str = "label",
    n_bins: int = 10,
) -> DataFrame:
    """Reliability table + expected-calibration-error decomposition
    (Naeini et al. 2015's ECE / DeGroot-Fienberg reliability diagram)
    for a binary scorer — the standard audit for the quality-classifier
    stage: a corpus filter whose scores are over/under-confident keeps
    the wrong documents at any threshold even when its ranking (AUC) is
    fine. The reference never calibrates (its eval is threshold-free
    P/R/F1, run_evaluation.py); a 100-TB curation pipeline gating on
    score > t needs this table before picking t.

    Input: one row per example with an integer-ppm score in [0, 1e6]
    (``score_col``) and a 0/1 ``label_col``. Returns one row per
    non-empty equal-width bin (bin = score * n_bins div 1e6, capped to
    the last bin so score = 1e6 lands in bin n_bins - 1):

      (bin, n, n_pos, mean_score_ppm, frac_pos_ppm, gap_ppm,
       ece_contrib_ppm)

    mean_score_ppm = sum(score) div n; frac_pos_ppm = n_pos * 1e6
    div n; gap_ppm = |mean_score - frac_pos| (per-bin confidence/
    accuracy gap, the reliability-diagram deviation); ece_contrib_ppm
    = n * gap_ppm div N (so sum(ece_contrib_ppm) ~ ECE in ppm, each
    term truncated). All truncating BIGINT ppm — bit-exact twin.

    Scale shape: ONE groupBy over at most n_bins keys (map-side
    combined into n_bins partial rows per task), then a broadcast
    crossJoin of the one-row total for the ECE weights. No per-example
    state leaves the scan."""
    if n_bins < 1:
        raise ValueError("calibration_report: n_bins must be >= 1")
    s = scored.select(
        F.col(score_col).cast("long").alias("s"),
        F.col(label_col).cast("long").alias("y"),
    )
    b = s.select(
        F.least(
            F.expr(f"s * {int(n_bins)}L div 1000000L"),
            F.lit(int(n_bins) - 1).cast("long"),
        )
        .cast("int")
        .alias("bin"),
        "s",
        "y",
    )
    bins = b.groupBy("bin").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("n_pos"),
        F.sum("s").cast("long").alias("sum_s"),
    )
    total = bins.agg(F.sum("n").cast("long").alias("n_total"))
    return (
        bins.crossJoin(F.broadcast(total))
        .select(
            "bin",
            "n",
            "n_pos",
            F.expr("sum_s div n").alias("mean_score_ppm"),
            F.expr("n_pos * 1000000L div n").alias("frac_pos_ppm"),
            F.expr(
                "abs(sum_s div n - n_pos * 1000000L div n)"
            ).alias("gap_ppm"),
            F.expr(
                "n * abs(sum_s div n - n_pos * 1000000L div n)"
                " div n_total"
            ).alias("ece_contrib_ppm"),
        )
    )


def capture_recapture_completeness(
    run_a: DataFrame,
    run_b: DataFrame,
    key_cols: tuple = ("subj_entity_id", "predicate", "obj_entity_id"),
    group_col: str = "predicate",
) -> DataFrame:
    """KG completeness estimation by capture-recapture (Lincoln-
    Petersen with Chapman's bias correction — the mark-recapture
    estimator Razniewski et al.'s completeness surveys apply to KGs):
    treat two INDEPENDENT extraction runs over the same corpus as two
    captures of the latent true fact population; the overlap rate
    estimates what fraction neither run is seeing. Per ``group_col``:

      (group, n_a, n_b, n_both, n_union,
       est_total   = (n_a+1)(n_b+1) div (n_both+1) - 1   [Chapman],
       est_missing = max(est_total - n_union, 0),
       coverage_union_ppm = n_union * 1e6 div max(est_total, 1))

    All integer arithmetic (truncating division — Chapman can land one
    below the observed union; est_missing clamps at 0). The estimator
    assumes run independence and per-group homogeneous capture
    probability — per-predicate grouping is exactly the
    stratification that makes the homogeneity assumption tenable.

    Scale shape: per-run distinct (one shuffle each, map-side
    combine), ONE full-outer join on the fact key (co-partitioned by
    the same key), then an alphabet-sized group aggregation. Output
    is predicate-count-sized."""
    keys = list(key_cols)
    a = run_a.select(*keys).distinct().withColumn(
        "_in_a", F.lit(1).cast("long")
    )
    b = run_b.select(*keys).distinct().withColumn(
        "_in_b", F.lit(1).cast("long")
    )
    facts = a.join(b, keys, "full_outer").select(
        F.col(group_col),
        F.coalesce(F.col("_in_a"), F.lit(0)).alias("_in_a"),
        F.coalesce(F.col("_in_b"), F.lit(0)).alias("_in_b"),
    )
    agg = facts.groupBy(group_col).agg(
        F.sum("_in_a").cast("long").alias("n_a"),
        F.sum("_in_b").cast("long").alias("n_b"),
        F.sum(F.col("_in_a") * F.col("_in_b")).cast("long").alias("n_both"),
        F.count("*").cast("long").alias("n_union"),
    )
    return agg.select(
        group_col,
        "n_a",
        "n_b",
        "n_both",
        "n_union",
        F.expr(
            "(n_a + 1) * (n_b + 1) div (n_both + 1) - 1"
        ).alias("est_total"),
        F.expr(
            "greatest((n_a + 1) * (n_b + 1) div (n_both + 1) - 1"
            " - n_union, 0)"
        ).alias("est_missing"),
        F.expr(
            "n_union * 1000000"
            " div greatest((n_a + 1) * (n_b + 1) div (n_both + 1) - 1, 1)"
        ).alias("coverage_union_ppm"),
    )


def generation_ngram_eval(
    pairs: DataFrame,
    id_col: str = "pair_id",
    cand_col: str = "candidate",
    ref_col: str = "reference",
    max_n: int = 4,
) -> DataFrame:
    """Corpus-level clipped n-gram precision (the BLEU numerators,
    Papineni 2002) for generation eval over (candidate, reference)
    pairs: for n = 1..max_n, matched_n = sum over pairs and grams of
    min(count_cand, count_ref) — each candidate n-gram credits at most
    its reference multiplicity (the 'clipping' that kills the
    the-the-the exploit — and total_n = all candidate n-grams.

    Output, one row per n:
      (n, n_matched, n_total, precision_ppm,
       cand_tokens, ref_tokens, len_ratio_ppm)
    precision_ppm = matched * 1e6 div total; len_ratio_ppm =
    cand_tokens * 1e6 div ref_tokens (corpus totals, repeated on every
    row — the brevity-penalty inputs, exp left to the consumer so the
    table stays integer-exact). Empty/NULL sides contribute no grams.

    Scale shape, per n: one (id, gram) count per side (map-side
    combine), one co-keyed full-outer join, one global sum — the big
    text never moves, only gram-count rows; max_n small-constant
    unions of that pipeline."""
    if max_n < 1:
        raise ValueError(f"generation_ngram_eval: max_n must be >= 1: {max_n}")

    def gram_counts(col: str, n: int, out: str) -> DataFrame:
        w = f"split({col}, ' ')"
        grams = F.expr(
            f"case when size({w}) >= {n} then "
            f"transform(sequence(1, size({w}) - {n} + 1),"
            f" i -> array_join(slice({w}, i, {n}), ' ')) "
            f"else array() end"
        )
        return (
            pairs.select(F.col(id_col).alias("id"), F.explode(grams).alias("gram"))
            .groupBy("id", "gram")
            .agg(F.count("*").cast("long").alias(out))
        )

    lens = pairs.agg(
        F.coalesce(
            F.sum(F.size(F.split(F.col(cand_col), " "))), F.lit(0)
        ).cast("long").alias("cand_tokens"),
        F.coalesce(
            F.sum(F.size(F.split(F.col(ref_col), " "))), F.lit(0)
        ).cast("long").alias("ref_tokens"),
    )
    per_n = []
    for n in range(1, max_n + 1):
        c = gram_counts(cand_col, n, "c_cand")
        r = gram_counts(ref_col, n, "c_ref")
        joined = c.join(r, ["id", "gram"], "left").select(
            F.col("c_cand"),
            F.least(F.col("c_cand"), F.coalesce(F.col("c_ref"), F.lit(0))).alias(
                "m"
            ),
        )
        per_n.append(
            joined.agg(
                F.lit(n).cast("int").alias("n"),
                F.coalesce(F.sum("m"), F.lit(0)).cast("long").alias("n_matched"),
                F.coalesce(F.sum("c_cand"), F.lit(0))
                .cast("long")
                .alias("n_total"),
            )
        )
    out = per_n[0]
    for nxt in per_n[1:]:
        out = out.unionByName(nxt)
    return out.crossJoin(F.broadcast(lens)).select(
        "n",
        "n_matched",
        "n_total",
        F.expr(
            "n_matched * 1000000 div greatest(n_total, 1)"
        ).alias("precision_ppm"),
        "cand_tokens",
        "ref_tokens",
        F.expr(
            "cand_tokens * 1000000 div greatest(ref_tokens, 1)"
        ).alias("len_ratio_ppm"),
    )
