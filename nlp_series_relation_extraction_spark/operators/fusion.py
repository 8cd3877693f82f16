"""Fact fusion / truth discovery over conflicting extracted claims.

The reference deduplicates predictions within one sentence
(run_evaluation.py:23-83 set-dedups per qid) but has no cross-sentence
conflict resolution: when conversation A says a part is made by supplier
17 and conversation B says supplier 92, its output simply contains both
triples. At 10^12-turn scale the same (subject, predicate) is asserted by
millions of sources with conflicting objects — extraction noise, stale
statements, adversarial text — and the canonical downstream stage is
*fusion*: pick one consistent object per data item, scored by how much
independent support it has.

Two fusers, both over a generic ``claims`` table
``(subject, predicate, object_val, source_id)``:

- :func:`majority_vote` — one-vote-per-source counting, the standard
  baseline (and the exact-SQL-expressible one: its driver query is
  hash-checked against DuckDB).
- :func:`iterative_trust` — TruthFinder-style (Yin et al., KDD'07)
  alternating source-trust / claim-confidence iteration: a claim is
  believable in proportion to the trust of the sources asserting it
  (normalized within its (subject, predicate) data item), and a source is
  trustworthy in proportion to the mean confidence of its claims. Floats
  from distributed sums are partition-order dependent, so this one is
  pytest-pinned against a numpy twin (1e-9) instead of hash-compared.

Scale shape: every stage is a key-prefix aggregation — distinct claims
shuffle once on (s, p, o, source), votes fold map-side onto (s, p, o),
the per-item denominator and the winner window both run on (s, p) — no
all-pairs anything, no driver collect on the data path. The trust loop
is 2 joins + 3 aggs per round with ``localCheckpoint`` lineage cuts, the
same pattern as operators/graph.py pagerank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

CLAIM_COLS = ("subject", "predicate", "object_val", "source_id")


def _distinct_claims(
    claims: DataFrame,
    subj_col: str,
    pred_col: str,
    obj_col: str,
    source_col: str,
) -> DataFrame:
    """One vote per (source, claim): a source repeating itself (the same
    conversation asserting a triple in five turns) still counts once —
    vote counting is over independent *sources*, not mentions."""
    return claims.select(
        F.col(subj_col).alias("subject"),
        F.col(pred_col).alias("predicate"),
        F.col(obj_col).alias("object_val"),
        F.col(source_col).alias("source_id"),
    ).distinct()


def majority_vote(
    claims: DataFrame,
    subj_col: str = "subject",
    pred_col: str = "predicate",
    obj_col: str = "object_val",
    source_col: str = "source_id",
) -> DataFrame:
    """Resolve each (subject, predicate) data item to the object asserted
    by the most distinct sources.

    Returns ``(subject, predicate, object_val, votes, n_sources,
    support)`` — one row per data item, where ``votes`` is the winner's
    distinct-source count, ``n_sources`` the distinct sources asserting
    *anything* for the item (>= votes; a source may assert several
    conflicting objects), and ``support = votes / n_sources`` the fused
    fact's confidence. Ties break to the lexicographically smallest
    object, so the output is deterministic and cross-engine hash-stable.
    """
    d = _distinct_claims(claims, subj_col, pred_col, obj_col, source_col)
    votes = d.groupBy("subject", "predicate", "object_val").agg(
        F.count("*").alias("votes")
    )
    # n_sources needs the DISTINCT source set per item, which is not
    # derivable from per-object counts (sources can back several
    # objects) — a second agg over the same distinct-claims scan.
    srcs = d.groupBy("subject", "predicate").agg(
        F.countDistinct("source_id").alias("n_sources")
    )
    w = Window.partitionBy("subject", "predicate").orderBy(
        F.col("votes").desc(), F.col("object_val").asc()
    )
    winner = (
        votes.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    # winner and srcs are both (subject, predicate)-partitioned by the
    # window / agg above them, so this equi-join adds no new exchange
    return winner.join(srcs, ["subject", "predicate"]).select(
        "subject",
        "predicate",
        "object_val",
        "votes",
        "n_sources",
        (F.col("votes").cast("double") / F.col("n_sources")).alias(
            "support"
        ),
    )


def iterative_trust(
    claims: DataFrame,
    subj_col: str = "subject",
    pred_col: str = "predicate",
    obj_col: str = "object_val",
    source_col: str = "source_id",
    iters: int = 8,
    prior: float = 0.8,
) -> tuple[DataFrame, DataFrame]:
    """TruthFinder-style alternating fixpoint.

    Per round, with ``trust(src)`` starting at ``prior``:

    - ``conf(s,p,o) = sum(trust of asserting sources)
      / sum(trust of ALL sources asserting (s,p))`` — claim confidence,
      normalized within its data item (confidences of competing objects
      sum to 1);
    - ``trust(src) = mean(conf of src's claims)`` — a source is as good
      as the claims it backs.

    Returns ``(facts, trust)``: ``facts(subject, predicate, object_val,
    confidence)`` — the argmax-confidence object per data item, ties to
    the smallest object — and ``trust(source_id, trust)``.

    Unlike :func:`majority_vote`, a prolific-but-contradicted source is
    down-weighted, so a minority object backed by otherwise-reliable
    sources can win. Driver-checked rows-only (float sums are
    partition-order dependent); exactness is pinned by the numpy twin in
    tests/test_fusion.py at 1e-9.
    """
    if iters < 1:
        raise ValueError(f"iterative_trust: iters must be >= 1, got {iters}")
    d = _distinct_claims(
        claims, subj_col, pred_col, obj_col, source_col
    ).localCheckpoint()
    trust = d.select("source_id").distinct().select(
        "source_id", F.lit(float(prior)).alias("trust")
    )
    conf = None
    for _ in range(iters):
        scored = d.join(trust, "source_id")
        claim_score = scored.groupBy(
            "subject", "predicate", "object_val"
        ).agg(F.sum("trust").alias("score"))
        denom = Window.partitionBy("subject", "predicate")
        conf = claim_score.select(
            "subject",
            "predicate",
            "object_val",
            (F.col("score") / F.sum("score").over(denom)).alias(
                "confidence"
            ),
        )
        trust = (
            d.join(conf, ["subject", "predicate", "object_val"])
            .groupBy("source_id")
            .agg(F.avg("confidence").alias("trust"))
            # cut lineage each round: without this the plan doubles per
            # iteration (same reason pagerank localCheckpoints); at real
            # scale swap for .persist() + explicit unpersist of round-1
            .localCheckpoint()
        )
    w = Window.partitionBy("subject", "predicate").orderBy(
        F.col("confidence").desc(), F.col("object_val").asc()
    )
    facts = (
        conf.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    return facts, trust


def iterative_trust_python(
    rows: list[tuple],
    iters: int = 8,
    prior: float = 0.8,
) -> tuple[dict, dict]:
    """Single-process twin of :func:`iterative_trust` over
    ``(subject, predicate, object_val, source_id)`` tuples — the same
    recursion in plain dict arithmetic, for the parity test. Returns
    ``({(s, p): (obj, conf)}, {src: trust})``."""
    d = sorted(set(rows))
    trust = {src: float(prior) for _, _, _, src in d}
    conf: dict = {}
    for _ in range(iters):
        score: dict = {}
        for s, p, o, src in d:
            score[(s, p, o)] = score.get((s, p, o), 0.0) + trust[src]
        denom: dict = {}
        for (s, p, o), v in score.items():
            denom[(s, p)] = denom.get((s, p), 0.0) + v
        conf = {k: v / denom[(k[0], k[1])] for k, v in score.items()}
        acc: dict = {}
        for s, p, o, src in d:
            tot, n = acc.get(src, (0.0, 0))
            acc[src] = (tot + conf[(s, p, o)], n + 1)
        trust = {src: tot / n for src, (tot, n) in acc.items()}
    best: dict = {}
    for (s, p, o), c in conf.items():
        cur = best.get((s, p))
        # argmax confidence, ties to smallest object (same as the window)
        if cur is None or (-c, o) < (-cur[1], cur[0]):
            best[(s, p)] = (o, c)
    return best, trust
