"""Open-predicate canonicalization: DIRT/CESI-style paraphrase clustering.

The reference extracts against a CLOSED 55-predicate schema
(reference: utils/relation_union.py + dataset vocab; our
config/vocab.py byte-parity twin), so it never needs this stage. An
open-IE pipeline over transcripts does: the same relation surfaces as
``made_by`` / ``madeBy`` / ``manufactured_by`` depending on the
upstream prompt or model. Two surface forms are paraphrases when they
assert facts about the SAME argument pairs (Lin & Pantel 2001, DIRT;
Vashishth 2018, CESI): cluster predicates by argument-pair-set Jaccard
overlap and rewrite every triple onto one canonical form per cluster —
the predicate-side twin of operators/linking.py's entity
canonicalization.

Plan shape (the 100 TB contract):

- one distinct over (pred, subj, obj) — corpus-sized, one shuffle.
- stop-pair removal BEFORE the evidence join: argument pairs asserted
  under more than ``max_pair_preds`` distinct predicates (promiscuous
  pairs — every gazetteer relation holds between a city and its
  country) are dropped, capping the self-join's per-key fan-out at
  C(max_pair_preds, 2). This is DIRT's own mutual-information
  pruning in set form, and it is the skew firewall: without it one
  hot argument pair quadratically dominates a reducer.
- the evidence self-join is keyed on (subj, obj); per-predicate
  argument counts join in broadcast (the predicate vocabulary is
  schema-sized).
- the thresholded predicate-pair edge list is VOCABULARY-sized. Like
  operators/ontology.py's schema_closure, closing a KB-sized relation
  distributed only buys shuffles: collect it (bounded by
  ``max_predicates``, raising beyond — never a data-path collect) and
  union-find on the driver; the canonical member is the
  lexicographically smallest name, so the fixpoint is bit-stable and a
  DuckDB recursive CTE replays it exactly.
"""

from __future__ import annotations

from ..functions.smalldf import local_df

from pyspark.sql import DataFrame, functions as F


def _distinct_claims(
    triples: DataFrame, subj_col: str, pred_col: str, obj_col: str
) -> DataFrame:
    return triples.select(
        F.col(pred_col).cast("string").alias("pred"),
        F.col(subj_col).cast("string").alias("subj"),
        F.col(obj_col).cast("string").alias("obj"),
    ).where(
        F.col("pred").isNotNull()
        & F.col("subj").isNotNull()
        & F.col("obj").isNotNull()
    ).distinct()


def predicate_paraphrase_edges(
    triples: DataFrame,
    subj_col: str = "subject",
    pred_col: str = "predicate",
    obj_col: str = "object_val",
    min_shared: int = 2,
    threshold: float = 0.3,
    max_pair_preds: int = 8,
) -> DataFrame:
    """Thresholded paraphrase evidence between predicate surface forms.

    Returns (pred_a, pred_b, shared, n_args_a, n_args_b, jaccard_ppm)
    with pred_a < pred_b; ``shared`` counts distinct argument pairs
    asserted under both predicates (after stop-pair removal),
    ``jaccard_ppm`` is the integer-ppm Jaccard over the predicates'
    distinct-argument-pair sets — integers, so the statistic is
    bit-stable cross-engine.
    """
    if min_shared < 1:
        raise ValueError(f"min_shared must be >= 1, got {min_shared}")
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    d = _distinct_claims(triples, subj_col, pred_col, obj_col)
    # stop-pair removal: the promiscuity of an argument pair is its
    # distinct-predicate count; drop pairs over the cap before pairing
    keep = (
        d.groupBy("subj", "obj")
        .agg(F.count("*").alias("_np"))
        .where(F.col("_np") <= max_pair_preds)
        .select("subj", "obj")
    )
    dd = d.join(keep, ["subj", "obj"])
    sizes = dd.groupBy("pred").agg(F.count("*").cast("long").alias("n_args"))
    a = dd.alias("a")
    b = dd.alias("b")
    shared = (
        a.join(b, ["subj", "obj"])
        .where(F.col("a.pred") < F.col("b.pred"))
        .groupBy(
            F.col("a.pred").alias("pred_a"), F.col("b.pred").alias("pred_b")
        )
        .agg(F.count("*").cast("long").alias("shared"))
    )
    sa = sizes.select(
        F.col("pred").alias("pred_a"), F.col("n_args").alias("n_args_a")
    )
    sb = sizes.select(
        F.col("pred").alias("pred_b"), F.col("n_args").alias("n_args_b")
    )
    return (
        shared.join(F.broadcast(sa), "pred_a")
        .join(F.broadcast(sb), "pred_b")
        .withColumn(
            "jaccard_ppm",
            F.expr(
                "1000000 * shared div (n_args_a + n_args_b - shared)"
            ).cast("long"),
        )
        .where(
            (F.col("shared") >= F.lit(min_shared))
            & (F.col("jaccard_ppm") >= F.lit(int(threshold * 1_000_000)))
        )
        .select(
            "pred_a", "pred_b", "shared", "n_args_a", "n_args_b",
            "jaccard_ppm",
        )
    )


def canonicalize_predicates(
    triples: DataFrame,
    subj_col: str = "subject",
    pred_col: str = "predicate",
    obj_col: str = "object_val",
    min_shared: int = 2,
    threshold: float = 0.3,
    max_pair_preds: int = 8,
    max_predicates: int = 100_000,
) -> dict:
    """Cluster paraphrase predicates and rewrite triples onto canonicals.

    Returns ``{"mapping": DataFrame(predicate, canonical_predicate,
    n_args, cluster_size), "triples": DataFrame(original columns with
    pred_col rewritten), "n_clusters": int}``. ``n_args`` counts the
    predicate's distinct raw argument pairs (pre-cap — the user-facing
    fact count); clustering evidence uses the capped sets (see module
    docstring). Canonical = lexicographically smallest cluster member.

    ``max_predicates`` bounds the driver-side closure: the collect is
    vocabulary-sized by contract and raises rather than degrade if an
    upstream bug floods the predicate column with non-schema strings.
    """
    spark = triples.sparkSession
    d = _distinct_claims(triples, subj_col, pred_col, obj_col)
    raw_sizes = d.groupBy("pred").agg(
        F.count("*").cast("long").alias("n_args")
    )
    n_preds = raw_sizes.count()
    if n_preds > max_predicates:
        raise ValueError(
            f"{n_preds} distinct predicates exceeds max_predicates="
            f"{max_predicates} — the predicate column does not look "
            "schema-sized; raise the bound explicitly if intended"
        )
    edges = predicate_paraphrase_edges(
        triples, subj_col, pred_col, obj_col,
        min_shared=min_shared, threshold=threshold,
        max_pair_preds=max_pair_preds,
    )
    # vocabulary-sized by the bound above: C(n_preds, 2) worst case,
    # in practice ~n_preds (paraphrase families are small)
    edge_rows = edges.select("pred_a", "pred_b").collect()
    pred_rows = [r["pred"] for r in raw_sizes.select("pred").collect()]

    parent: dict[str, str] = {p: p for p in pred_rows}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    for r in edge_rows:
        ra, rb = find(r["pred_a"]), find(r["pred_b"])
        if ra != rb:
            # union by min name keeps find() deterministic mid-stream;
            # the final canonical is re-derived as the set min below
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    clusters: dict[str, list[str]] = {}
    for p in pred_rows:
        clusters.setdefault(find(p), []).append(p)
    mapping_rows = []
    for members in clusters.values():
        canon = min(members)
        for p in members:
            mapping_rows.append((p, canon, len(members)))
    mapping = local_df(
        spark,
        mapping_rows,
        "predicate string, canonical_predicate string, cluster_size int",
    ).join(
        raw_sizes.select(
            F.col("pred").alias("predicate"), "n_args"
        ),
        "predicate",
    ).select("predicate", "canonical_predicate", "n_args", "cluster_size")
    rewrite = F.broadcast(
        mapping.select(
            F.col("predicate").alias(pred_col),
            F.col("canonical_predicate").alias("__canon"),
        )
    )
    rewritten = (
        triples.join(rewrite, pred_col, "left")
        .withColumn(
            pred_col, F.coalesce(F.col("__canon"), F.col(pred_col))
        )
        .drop("__canon")
        # the equi-join hoists its key column to the front; hand back
        # the caller's schema unchanged
        .select(*triples.columns)
    )
    return {
        "mapping": mapping,
        "triples": rewritten,
        "n_clusters": len(clusters),
    }


def align_predicates(
    kg_a: DataFrame,
    kg_b: DataFrame,
    subj_col: str = "subject",
    pred_col: str = "predicate",
    obj_col: str = "object_val",
    min_joint: int = 1,
    max_pair_preds: int = 8,
) -> DataFrame:
    """Instance-based predicate alignment BETWEEN two KGs that share
    entity identifiers (PARIS, Suchanek et al. VLDB 2012 §5 — the
    subsumption estimates its relation-alignment stage is built on;
    also the schema-matching step of any cross-snapshot / cross-model
    KG merge): predicate r of KG A aligns with r' of KG B to the
    degree the same (subject, object) pairs are asserted under both.

    Returns one row per co-asserted predicate pair:

      (pred_a, pred_b, n_a, n_b, n_joint, sub_ppm, super_ppm,
       jaccard_ppm)

    n_a / n_b = distinct argument pairs of the predicate in its own
    KG; n_joint = distinct pairs asserted under both; sub_ppm =
    n_joint * 1e6 div n_a estimates P(r'(s,o) | r(s,o)) — near 1e6
    means r ⊑ r' (A's predicate is subsumed by B's); super_ppm the
    mirror; jaccard_ppm the symmetric equivalence score. Truncating
    integer ppm — bit-stable cross-engine.

    Unlike predicate_paraphrase_edges (same-KG paraphrases, pred_a <
    pred_b on one table), this keeps the two schemas apart: every
    (pred_a, pred_b) combination across the KGs is scored, including
    identically-named predicates.

    Plan shape: each side dedupes to distinct claims once; the
    evidence join is keyed on (subj, obj) AFTER the same stop-pair
    firewall as paraphrase mining, applied per side with the COMBINED
    promiscuity cap (a pair's fan-out across the join is #preds_A x
    #preds_B, so capping each side at max_pair_preds bounds the
    per-key work at max_pair_preds^2); per-predicate sizes are
    schema-sized and broadcast back."""
    if min_joint < 1:
        raise ValueError(f"min_joint must be >= 1, got {min_joint}")
    da = _distinct_claims(kg_a, subj_col, pred_col, obj_col)
    db = _distinct_claims(kg_b, subj_col, pred_col, obj_col)

    def _capped(d: DataFrame) -> DataFrame:
        keep = (
            d.groupBy("subj", "obj")
            .agg(F.count("*").alias("_np"))
            .where(F.col("_np") <= max_pair_preds)
            .select("subj", "obj")
        )
        return d.join(keep, ["subj", "obj"])

    # each capped side feeds its size agg AND the joint join — cut
    # lineage so the dedup + firewall subtree materializes once per side
    ca = _capped(da).localCheckpoint(eager=False)
    cb = _capped(db).localCheckpoint(eager=False)
    sizes_a = ca.groupBy("pred").agg(
        F.count("*").cast("long").alias("n_a")
    )
    sizes_b = cb.groupBy("pred").agg(
        F.count("*").cast("long").alias("n_b")
    )
    joint = (
        ca.select(F.col("pred").alias("pred_a"), "subj", "obj")
        .join(
            cb.select(F.col("pred").alias("pred_b"), "subj", "obj"),
            ["subj", "obj"],
        )
        .groupBy("pred_a", "pred_b")
        .agg(F.count("*").cast("long").alias("n_joint"))
        .where(F.col("n_joint") >= min_joint)
    )
    return (
        joint.join(
            F.broadcast(sizes_a.withColumnRenamed("pred", "pred_a")),
            "pred_a",
        )
        .join(
            F.broadcast(sizes_b.withColumnRenamed("pred", "pred_b")),
            "pred_b",
        )
        .select(
            "pred_a",
            "pred_b",
            "n_a",
            "n_b",
            "n_joint",
            F.expr("n_joint * 1000000L div n_a").alias("sub_ppm"),
            F.expr("n_joint * 1000000L div n_b").alias("super_ppm"),
            F.expr(
                "n_joint * 1000000L div (n_a + n_b - n_joint)"
            ).alias("jaccard_ppm"),
        )
    )
