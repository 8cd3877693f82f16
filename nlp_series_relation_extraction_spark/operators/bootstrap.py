"""Snowball/DIPRE pattern bootstrapping: grow a relation's pair set
from seeds by alternating pattern induction and pattern application.

The reference trains on a hand-labeled corpus (`dataset/data_utils.py`
reads `{text, spo_list}` JSONL); `operators/distant.py` replaces the
labels with a seed KB. This module is the OTHER classic no-label
bootstrap (Brin 1998 "Extracting patterns and relations from the WWW"
= DIPRE; Agichtein & Gravano 2000 "Snowball"): start from a handful of
known (subj, obj) pairs, find the textual contexts ("patterns") that
connect them, score each pattern by how selectively it hits known
pairs, then let the confident patterns nominate NEW pairs — and
iterate, so each round's discoveries become the next round's seeds.

Spark shaping — the loop is cheap because the corpus-sized work is
hoisted OUT of it:

* **Pair table once.** Candidate (subj, middle, obj) token pairs are
  generated JVM-side by one `flatten(transform(...))` explode per doc
  (no positional self-join), deduped to PAIR TYPES with the per-middle
  distinct-pair total attached. That table is corpus-sized, shuffles
  once (on the pair type), and is reused by EVERY round — the
  round-varying quantity is only which pairs are seeds.
* **Rounds touch seed-sized data.** Each round broadcast-joins the
  (small, grown-by-discovery) seed set against the pair-type table,
  aggregates per middle (seed-matched subset only), and broadcasts
  the accepted patterns back to nominate new pairs. No corpus rescan,
  no corpus-sized shuffle inside the loop.
* **Exact integers end-to-end.** Pattern confidence is integer ppm
  (floor(1e6 * seed_pairs / total_pairs)); a discovered pair's
  confidence is the MAX over its accepting patterns — no float
  accumulation order anywhere, so DuckDB replays round-for-round
  bit-exactly as chained CTEs (`plans/queries.py:_bootstrap_rounds_sql`).

At 10^12-turn scale the pair-type table is the only big artifact; its
size is bounded by (distinct middles x vocab^2) observed, and the
`max_mid` window keeps per-doc fan-out linear in doc length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.partitioning import checkpoint_nostats as _ckpt_nostats


def cooccurrence_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_mid: int = 3,
) -> DataFrame:
    """All (subj, middle, obj) windowed token co-occurrences: subj and
    obj are single tokens separated by 1..max_mid middle tokens, with
    subj != obj. One JVM-side nested transform + explode per doc —
    per-doc fan-out is len(tokens) * max_mid, linear in doc length.

    Returns (id_col, subj, middle, obj), one row per OCCURRENCE.
    """
    if max_mid < 1:
        raise ValueError(f"cooccurrence_pairs: max_mid must be >= 1, got {max_mid}")
    # two flat generator explodes + plain array expressions, NOT nested
    # transform/filter lambdas: higher-order functions run interpreted
    # (outside whole-stage codegen) and measured 14s for 5k docs at
    # sf0.1 where this shape takes ~2s — posexplode and the m explode
    # are codegen generators, slice/element_at are codegen expressions
    return (
        docs.select(
            id_col,
            F.split(F.col(text_col), " ").alias("_toks"),
        )
        .select(
            id_col,
            "_toks",
            F.posexplode("_toks").alias("_i0", "subj"),
        )
        .select(
            id_col,
            "_toks",
            "_i0",
            "subj",
            F.explode(
                F.array(*[F.lit(m) for m in range(1, max_mid + 1)])
            ).alias("_m"),
        )
        .where(F.col("_i0") + F.col("_m") + 2 <= F.size("_toks"))
        .select(
            id_col,
            "subj",
            F.array_join(
                F.expr("slice(_toks, _i0 + 2, _m)"), " "
            ).alias("middle"),
            F.expr("element_at(_toks, _i0 + _m + 2)").alias("obj"),
        )
        .where(F.col("subj") != F.col("obj"))
    )


def pair_types(pairs: DataFrame) -> DataFrame:
    """Distinct (subj, middle, obj) pair types with the per-middle
    distinct-pair total attached — the round-invariant denominator of
    Snowball confidence, computed ONCE before any looping.

    Plan: one distinct (hash aggregate on the full pair type) and one
    groupBy(middle) whose output is middle-vocabulary-sized, joined
    back. Returns (subj, middle, obj, total_pairs)."""
    types = pairs.select("subj", "middle", "obj").distinct()
    totals = types.groupBy("middle").agg(
        F.count("*").cast("long").alias("total_pairs")
    )
    # middle vocabulary << corpus: totals broadcasts
    return types.join(F.broadcast(totals), "middle").select(
        "subj", "middle", "obj", "total_pairs"
    )


def pattern_induction(
    ptypes: DataFrame,
    seeds: DataFrame,
    min_support: int = 2,
    min_conf_ppm: int = 200_000,
) -> DataFrame:
    """Score middles as Snowball patterns against the current seed set.

    ``ptypes``: output of :func:`pair_types`. ``seeds``: (subj, obj)
    distinct pairs. A middle's support is how many DISTINCT seed pairs
    it connects; its confidence is integer ppm of support over the
    middle's total distinct pairs (selectivity — a middle that connects
    everything to everything scores near 0 however many seeds it hits).

    Returns (middle, seed_pairs, total_pairs, conf_ppm) for middles
    passing both floors. Seed side broadcasts; one aggregation over the
    seed-matched subset only."""
    matched = ptypes.join(
        F.broadcast(seeds.select("subj", "obj").distinct()), ["subj", "obj"]
    )
    scored = (
        matched.groupBy("middle", "total_pairs")
        .agg(F.count("*").cast("long").alias("seed_pairs"))
        # integer floor division (`div`), NOT floor(a*1e6/b): the double
        # quotient can land an ulp above an exact boundary and floor up,
        # while DuckDB's `//` is exact — bit-parity requires both sides
        # to divide in integers
        .withColumn(
            "conf_ppm",
            F.expr("seed_pairs * 1000000L div total_pairs").cast("long"),
        )
    )
    return scored.where(
        (F.col("seed_pairs") >= min_support)
        & (F.col("conf_ppm") >= min_conf_ppm)
    ).select("middle", "seed_pairs", "total_pairs", "conf_ppm")


def pattern_apply(
    ptypes: DataFrame, patterns: DataFrame, seeds: DataFrame
) -> DataFrame:
    """Nominate new pairs: every pair type whose middle is an accepted
    pattern, minus pairs already in the seed set. A pair hit by several
    patterns takes the MAX pattern confidence (exact under any
    partitioning, unlike noisy-or float products).

    Returns (subj, obj, conf_ppm). Patterns and seeds both broadcast;
    the one shuffle is the (small) nominated-pair max-aggregation."""
    return (
        ptypes.join(
            F.broadcast(patterns.select("middle", "conf_ppm")), "middle"
        )
        .join(
            F.broadcast(seeds.select("subj", "obj").distinct()),
            ["subj", "obj"],
            "left_anti",
        )
        .groupBy("subj", "obj")
        .agg(F.max("conf_ppm").alias("conf_ppm"))
    )


def snowball_bootstrap(
    docs: DataFrame,
    seeds: DataFrame,
    rounds: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_mid: int = 3,
    min_support: int = 2,
    min_conf_ppm: int = 200_000,
) -> DataFrame:
    """Iterate induce -> apply for ``rounds`` rounds, growing the seed
    set with each round's discoveries. Returns the DISCOVERED pairs
    (seeds excluded): (subj, obj, round, conf_ppm), where round is the
    1-based round that first nominated the pair.

    The corpus is scanned once (pair_types, checkpointed with stats
    stripping so the loop cannot compound Catalyst estimates); each
    round is seed-broadcast joins + small aggregations. Discovered
    pairs keep their FIRST round's confidence — later rounds cannot
    re-nominate them (they are seeds by then), matching Snowball's
    monotone seed growth."""
    if rounds < 1:
        raise ValueError(f"snowball_bootstrap: rounds must be >= 1, got {rounds}")
    ptypes = _ckpt_nostats(
        pair_types(cooccurrence_pairs(docs, id_col, text_col, max_mid))
    )
    cur_seeds = seeds.select("subj", "obj").distinct()
    discovered = None
    for r in range(1, rounds + 1):
        pats = pattern_induction(
            ptypes, cur_seeds, min_support=min_support,
            min_conf_ppm=min_conf_ppm,
        )
        new = pattern_apply(ptypes, pats, cur_seeds).withColumn(
            "round", F.lit(r).cast("int")
        ).select("subj", "obj", "round", "conf_ppm")
        # break lineage: next round's seed set feeds two joins and the
        # induction aggregate; without the checkpoint the plan doubles
        # per round
        new = _ckpt_nostats(new)
        discovered = new if discovered is None else discovered.unionByName(new)
        cur_seeds = _ckpt_nostats(
            cur_seeds.unionByName(new.select("subj", "obj")).distinct()
        )
    return discovered
