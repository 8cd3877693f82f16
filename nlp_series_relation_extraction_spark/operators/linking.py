"""Entity linking & canonicalization (north-rule stages beyond the reference).

The reference never canonicalizes — mentions are compared as raw strings
(``run_evaluation.py:222-255``) — so linking is additive: parity evaluation
runs on pre-linking triples; canonical tables are downstream.

Pipeline (all DataFrame ops, shuffle-conscious):

1. **mention normalization** — lower, \\xa0/whitespace strip (JVM-side).
2. **mention-level dedup FIRST** — the occurrences table is heavily skewed
   (hot entities appear in ~10% of turns); aggregating to distinct mentions
   with counts removes that skew from every later pairwise stage.
3. **blocking** — each distinct mention emits its character-2-gram block
   keys (explode); oversized blocks (stopword-like grams) are capped: a
   block bigger than ``max_block`` is dropped, the standard LSH-blocking
   guard that keeps candidate generation near-linear at 100TB.
4. **similarity join** — candidate pairs co-blocked at least once, deduped,
   scored with character-2-gram Jaccard computed JVM-side on array columns;
   pairs >= ``threshold`` become edges.
5. **connected components** — iterative min-label propagation over edges
   (alternating join + aggregate, lineage broken via localCheckpoint each
   round; O(component diameter) rounds, warned if the cap is hit).
6. **canonical entities** — per component: canonical name = highest
   occurrence count (ties: lexicographic min), stable canonical id =
   min mention hash. Alias table maps every mention to its canonical id.

Hot-key handling for the occurrence->canonical mapping join is explicit:
``salted_join`` spreads a skewed key across ``salt`` sub-keys (AQE skew-join
also covers this; salting is kept explicit per the north rule).
"""

from __future__ import annotations

from ..functions.smalldf import local_df

from pyspark.sql import DataFrame, functions as F
from ..functions.partitioning import checkpoint_nostats as _ckpt_nostats


def norm_expr(col):
    """Shared mention-normalization expression: lowercase, strip \\xa0,
    trim outer whitespace. Used by linking AND by the canonical-triple join
    (operators/graph.py) \u2014 they must stay identical or alias joins miss."""
    return F.trim(F.regexp_replace(F.lower(col), "\u00a0", ""))


def normalize_mentions(mentions: DataFrame, col: str = "mention") -> DataFrame:
    """Lowercase + strip \\xa0 and outer whitespace; drop empties."""
    return (
        mentions.withColumn("mention_norm", norm_expr(F.col(col)))
        .where(F.length("mention_norm") > 0)
    )


def distinct_mentions(mentions: DataFrame) -> DataFrame:
    """Aggregate occurrences -> (mention_norm, n_occurrences, mention_id).

    This is the skew firewall: hot entities collapse to one row each before
    any pairwise work. mention_id = xxhash64 (stable, no driver state).
    """
    return (
        mentions.groupBy("mention_norm")
        .agg(F.count("*").alias("n_occurrences"))
        .withColumn("mention_id", F.xxhash64("mention_norm"))
    )


def _grams(col: str, n: int = 2):
    """Character n-gram array (distinct), JVM-side via transform/substring."""
    return F.array_distinct(
        F.expr(
            f"transform(sequence(1, greatest(length({col}) - {n - 1}, 1)), "
            f"i -> substring({col}, i, {n}))"
        )
    )


def _with_grams(dmentions: DataFrame) -> DataFrame:
    return dmentions.select(
        "mention_id",
        "mention_norm",
        _grams("mention_norm").alias("grams"),
    )


def _capped_blocks(with_grams: DataFrame, max_block: int) -> DataFrame:
    """(mention_id, block_key) with pathological blocks (very common
    grams) dropped — candidate generation must stay near-linear; recall
    is preserved by the other grams."""
    blocks = with_grams.select(
        "mention_id", F.explode("grams").alias("block_key")
    )
    block_sizes = blocks.groupBy("block_key").agg(F.count("*").alias("bsz"))
    return blocks.join(
        F.broadcast(block_sizes.where(F.col("bsz") > max_block)),
        "block_key",
        "left_anti",
    )


def _score_pairs(
    with_grams: DataFrame, pairs: DataFrame, threshold: float
) -> DataFrame:
    ga = with_grams.select(
        F.col("mention_id").alias("a_id"),
        F.col("grams").alias("a_grams"),
        F.col("mention_norm").alias("a_mention"),
    )
    gb = with_grams.select(
        F.col("mention_id").alias("b_id"),
        F.col("grams").alias("b_grams"),
        F.col("mention_norm").alias("b_mention"),
    )
    scored = (
        pairs.join(ga, "a_id")
        .join(gb, "b_id")
        .withColumn(
            "inter", F.size(F.array_intersect("a_grams", "b_grams"))
        )
        .withColumn(
            "union_", F.size("a_grams") + F.size("b_grams") - F.col("inter")
        )
        .withColumn(
            "jaccard",
            F.when(F.col("union_") > 0, F.col("inter") / F.col("union_"))
            .otherwise(F.lit(0.0)),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return scored.select("a_id", "b_id", "a_mention", "b_mention", "jaccard")


def candidate_pairs(
    dmentions: DataFrame,
    max_block: int = 200,
    threshold: float = 0.5,
) -> DataFrame:
    """Similarity-joined mention pairs (a_id < b_id, jaccard >= threshold).

    Blocking on char-2-grams; a mention pair is a candidate if it co-occurs
    in any non-degenerate block. Jaccard over distinct 2-gram sets.
    """
    with_grams = _with_grams(dmentions)
    blocks = _capped_blocks(with_grams, max_block)
    a = blocks.alias("a")
    b = blocks.alias("b")
    pairs = (
        a.join(b, "block_key")
        .where(F.col("a.mention_id") < F.col("b.mention_id"))
        .select(
            F.col("a.mention_id").alias("a_id"),
            F.col("b.mention_id").alias("b_id"),
        )
        .distinct()
    )
    return _score_pairs(with_grams, pairs, threshold)


def propagate_neighbor_min(
    und: DataFrame, labels: DataFrame, salt: int = 8
) -> DataFrame:
    """One label-propagation round: per vertex, the min component label
    among its neighbors — (a_id, nbr_min).

    The skew point of min-label propagation is the edges->labels join: its
    shuffle key is the neighbor vertex id, so a HUB vertex (the center of a
    viral near-dup mega-component holding a large share of all edges) lands
    its entire adjacency on one reducer. ``salt > 1`` spreads it: each edge
    row gets a deterministic pseudo-random sub-key (xxhash64 of its OTHER
    endpoint — hub-neighbor edges differ there, so they scatter) and the
    label side is replicated once per sub-key, making the shuffle key
    (neighbor, salt). The label table is vertex-sized (not edge-sized), so
    the x``salt`` replication is the cheap side — the classic skew-join
    trade. The groupBy below needs no salting: Catalyst's partial (map-side)
    hash aggregation already combines each hub's rows before the exchange.
    Output is identical for any salt (pinned in tests)."""
    if salt <= 1:
        joined = und.join(labels, und["b_id"] == labels["mention_id"])
    else:
        und_s = und.withColumn(
            "_salt", F.pmod(F.xxhash64("a_id"), F.lit(salt))
        )
        lab_s = labels.select(
            F.col("mention_id").alias("_b"), "component_id"
        ).withColumn(
            "_salt", F.explode(F.array([F.lit(i) for i in range(salt)]))
        )
        joined = und_s.join(
            lab_s,
            (und_s["b_id"] == lab_s["_b"]) & (und_s["_salt"] == lab_s["_salt"]),
        )
    return joined.groupBy("a_id").agg(F.min("component_id").alias("nbr_min"))


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    max_iter: int = 15,
    num_partitions: int | None = None,
    salt: int | None = None,
) -> DataFrame:
    """Min-label propagation: (mention_id, component_id).

    ``vertices``: any df with mention_id; ``edges``: (a_id, b_id).
    Each round joins current labels over undirected edges and takes the min
    neighbor label; stops at fixpoint (count of changed labels == 0) or
    max_iter. Convergence needs O(component diameter) rounds — alias
    clusters are shallow in practice, but if max_iter is hit with labels
    still changing a warning is emitted (a split component would otherwise
    be silent). Lineage is broken every round (localCheckpoint) so plans
    stay flat — at cluster scale this would be a persisted table per round.

    ``salt`` spreads hub-vertex adjacency in the propagation join
    (propagate_neighbor_min); output is salt-invariant. ``None`` auto-sizes
    from the edge count: 1 below the scale where a straggler can exist
    (the xsalt label replication is pure overhead on tiny graphs), 8 once
    a single vertex's adjacency could dominate a reducer.
    """
    # iterate ONLY over vertices that touch an edge — isolated mentions (the
    # overwhelming majority of a deduped mention table) keep their own label
    # and never enter the propagation joins
    connected = (
        edges.select(F.col("a_id").alias("mention_id"))
        .union(edges.select(F.col("b_id").alias("mention_id")))
        .distinct()
    )
    isolated = vertices.select("mention_id").join(
        connected, "mention_id", "left_anti"
    ).select("mention_id", F.col("mention_id").alias("component_id"))
    labels = connected.select(
        "mention_id", F.col("mention_id").alias("component_id")
    )
    und = edges.select("a_id", "b_id").union(
        edges.select(F.col("b_id").alias("a_id"), F.col("a_id").alias("b_id"))
    )
    # size the iteration's shuffles to the (usually tiny) connected subgraph,
    # not the session default — each round is several jobs, and 32-partition
    # shuffles over a few thousand edges are pure scheduling latency. At real
    # scale pass num_partitions explicitly (or leave the session default).
    if num_partitions is None or salt is None:
        n_edges = und.count()
        if num_partitions is None:
            num_partitions = max(1, min(32, n_edges // 50_000 + 1))
        if salt is None:
            # below ~500k directed edge rows even a worst-case star fits one
            # reducer comfortably; above it, hub adjacency is a straggler
            salt = 1 if n_edges < 500_000 else 8
    # _ckpt_nostats, not plain localCheckpoint: in the iterated join
    # the leaf stats otherwise compound multiplicatively round over
    # round (see functions/partitioning.py — measured BigInteger
    # stats-math blow-up in the owl_equality cascade's nested CCs).
    labels = labels.repartition(num_partitions, "mention_id").transform(
        _ckpt_nostats
    )
    und = und.repartition(num_partitions, "b_id").transform(_ckpt_nostats)
    for _ in range(max_iter):
        neighbor_min = propagate_neighbor_min(und, labels, salt=salt)
        stepped = labels.join(
            neighbor_min, labels.mention_id == neighbor_min.a_id, "left"
        ).select(
            "mention_id",
            F.least(
                F.col("component_id"),
                F.coalesce(F.col("nbr_min"), F.col("component_id")),
            ).alias("component_id"),
            F.col("component_id").alias("_old"),
        )
        # path halving (pointer jumping): follow the label one more hop —
        # component_id := label(component_id). The label a vertex points at
        # is always itself a connected vertex (labels start as own ids and
        # only ever move to a neighbor's label), so the self-join is total.
        # This turns convergence from O(component diameter) rounds into
        # O(log diameter): a 1000-link near-dup chain resolves in ~10
        # rounds, not 1000. Each round stays monotone-decreasing and
        # bounded below by the component min, so the fixpoint (and the
        # min-reachable-id contract the oracles check) is unchanged.
        # The hop table is the PREVIOUS round's checkpointed labels, not
        # `stepped`: joining stepped against itself would re-derive the
        # whole propagate join on both sides of the self-join (doubling
        # the round's dominant shuffle), while the label lookup in the
        # already-materialized table is a cheap scan — and following a
        # one-round-stale pointer is still a monotone contraction with
        # the same fixpoint.
        hop = labels.select(
            F.col("mention_id").alias("_hm"),
            F.col("component_id").alias("_hc"),
        )
        new_labels = (
            stepped.join(hop, stepped.component_id == hop._hm, "left")
            .select(
                "mention_id",
                F.least(
                    F.col("component_id"),
                    F.coalesce(F.col("_hc"), F.col("component_id")),
                ).alias("component_id"),
                F.col("_old"),
            )
            # fused change detection: labels only ever decrease, so
            # "changed" is knowable in-row (new < old) — counting it on the
            # checkpointed result replaces the old-vs-new shuffle join with
            # a scan of already-materialized partitions.
            .withColumn("_changed", F.col("component_id") < F.col("_old"))
            .drop("_old")
        )
        # the changed-count rides the checkpoint as an observed metric
        # (round 6): one action per round instead of checkpoint + count
        from ..functions.partitioning import checkpoint_with_metrics

        new_labels, _m = checkpoint_with_metrics(
            new_labels,
            F.sum(F.col("_changed").cast("long")).alias("changed"),
        )
        changed = int(_m["changed"] or 0)
        labels = new_labels.drop("_changed")
        if changed == 0:
            break
    else:
        import warnings

        warnings.warn(
            f"connected_components hit max_iter={max_iter} with {changed} "
            "labels still changing — some components may be split; raise "
            "max_iter (component diameter bounds the rounds needed)",
            stacklevel=2,
        )
    return labels.unionByName(isolated)


def canonical_entities(
    dmentions: DataFrame, components: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """(entities, aliases).

    entities: (entity_id, canonical_name, n_mentions, n_occurrences)
    aliases:  (mention_norm, mention_id, entity_id)
    Canonical name: max occurrences, ties broken lexicographically (min).
    """
    labeled = dmentions.join(components, "mention_id")
    entities = (
        labeled.groupBy(F.col("component_id").alias("entity_id"))
        .agg(
            F.expr(
                "min_by(mention_norm, struct(-n_occurrences, mention_norm))"
            ).alias("canonical_name"),
            F.count("*").alias("n_mentions"),
            F.sum("n_occurrences").alias("n_occurrences"),
        )
    )
    aliases = labeled.select(
        "mention_norm", "mention_id", F.col("component_id").alias("entity_id")
    )
    return entities, aliases


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    salt: int = 16,
) -> DataFrame:
    """Skew-safe equi-join: spread hot fact keys over ``salt`` sub-keys and
    replicate the dimension side once per sub-key (explicit salting per the
    north rule; complements AQE skew-join)."""
    salted_facts = facts.withColumn(
        "_salt", F.pmod(F.xxhash64(*facts.columns), F.lit(salt))
    )
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.array([F.lit(i) for i in range(salt)]))
    )
    out = salted_facts.join(salted_dim, [key, "_salt"]).drop("_salt")
    return out


def link_mentions(
    mention_occurrences: DataFrame,
    threshold: float = 0.5,
    max_block: int = 200,
    max_iter: int = 15,
    num_partitions: int | None = None,
) -> dict[str, DataFrame]:
    """Full linking pipeline. Input: (conv_id, turn_idx, mention).

    Returns dict with distinct_mentions, edges, components, entities,
    aliases, and linked occurrences (occurrence -> entity_id via salted
    dimension join).

    ``num_partitions`` sizes the connected-components iteration shuffles;
    pass it explicitly at cluster scale (a pipeline-level constant) so the
    loop avoids the driver-side edge count used to auto-size locally.
    """
    norm = normalize_mentions(mention_occurrences)
    # materialize the deduped mention table and the edge set ONCE: linking
    # fans out into several consumers and an iterative loop, and without a
    # checkpoint every action would re-execute the (expensive) upstream
    # extraction UDF that produced the mentions (SURVEY §4 risk). At cluster
    # scale these become persisted stage tables (plans/pipeline.py does so);
    # localCheckpoint is the in-session equivalent.
    dm = distinct_mentions(norm).transform(_ckpt_nostats)
    edges = candidate_pairs(
        dm, max_block=max_block, threshold=threshold
    ).transform(_ckpt_nostats)
    comps = connected_components(
        dm, edges, max_iter=max_iter, num_partitions=num_partitions
    )
    entities, aliases = canonical_entities(dm, comps)
    linked = salted_join(
        norm.select("conv_id", "turn_idx", "mention_norm"),
        aliases.select("mention_norm", "entity_id"),
        key="mention_norm",
    )
    return {
        "distinct_mentions": dm,
        "edges": edges,
        "components": comps,
        "entities": entities,
        "aliases": aliases,
        "linked_occurrences": linked,
    }


def blocking_quality(
    blocks: DataFrame, gold_pairs: DataFrame
) -> DataFrame:
    """Blocking-scheme quality report (the standard ER diagnostics —
    Christen 2012 §7.5, the numbers Splink prints before a linkage
    run): how much comparison work the blocking keys save, and how
    many true matches they keep reachable. The meta-operator over
    candidate_pairs' blocking stage: linking quality is bounded by
    blocking recall, so this report is what a maintainer tunes block
    keys against.

    ``blocks``: (entity_id, block_key) — an entity may carry several
    keys (multi-pass blocking). ``gold_pairs``: (id_a, id_b) known
    true matches (any orientation). Returns ONE row:

      (n_entities, n_blocks, n_comparisons, max_block_size,
       reduction_ratio_ppm, completeness_ppm, quality_ppm)

    * n_comparisons = sum over blocks of C(size, 2) — comparisons a
      downstream verifier RUNS (a pair sharing two keys is compared
      twice; the multiset convention of the reduction-ratio
      literature, and what the join actually costs).
    * reduction_ratio_ppm = 1e6 - n_comparisons * 1e6 DIV C(n, 2)
      (share of the all-pairs work avoided).
    * completeness_ppm (pairs completeness / blocking recall) = share
      of gold pairs co-blocked under at least one key.
    * quality_ppm (pairs quality / precision proxy) = covered gold
      pairs * 1e6 DIV n_comparisons.

    Plan shape: block sizes are ONE groupBy over the key column —
    C(size,2) sums never materialize a pair; gold coverage joins the
    (small) gold table to the block keys of each side and distinct-
    counts covered pairs — cost scales with gold x keys-per-entity,
    never with block volume. All ratios truncating integer ppm,
    bit-exact vs the DuckDB twin."""
    b = blocks.select(
        F.col("entity_id").cast("long").alias("e"), F.col("block_key")
    ).localCheckpoint(eager=False)  # feeds sizes + n_ent + both coverage
    # legs: cut lineage so the block-key build runs once, not 4x
    sizes = b.groupBy("block_key").agg(F.count("*").cast("long").alias("nb"))
    stats = sizes.agg(
        F.count("*").cast("long").alias("n_blocks"),
        F.sum(F.expr("nb * (nb - 1L) div 2L")).cast("long").alias(
            "n_comparisons"
        ),
        F.max("nb").cast("long").alias("max_block_size"),
    )
    n_ent = b.select("e").distinct().agg(
        F.count("*").cast("long").alias("n_entities")
    )
    g = gold_pairs.select(
        F.least(F.col("id_a"), F.col("id_b")).cast("long").alias("a"),
        F.greatest(F.col("id_a"), F.col("id_b")).cast("long").alias("bb"),
    ).distinct()
    n_gold = g.agg(F.count("*").cast("long").alias("n_gold"))
    covered = (
        g.join(b.select(F.col("e").alias("a"), "block_key"), "a")
        .join(
            b.select(F.col("e").alias("bb"), "block_key"),
            ["bb", "block_key"],
        )
        .select("a", "bb")
        .distinct()
        .agg(F.count("*").cast("long").alias("n_covered"))
    )
    one = (
        stats.crossJoin(F.broadcast(n_ent))
        .crossJoin(F.broadcast(n_gold))
        .crossJoin(F.broadcast(covered))
    )
    return one.select(
        "n_entities",
        "n_blocks",
        "n_comparisons",
        "max_block_size",
        F.expr(
            "1000000L - (n_comparisons * 1000000L)"
            " div (n_entities * (n_entities - 1L) div 2L)"
        ).alias("reduction_ratio_ppm"),
        F.expr(
            "case when n_gold = 0 then null"
            " else (n_covered * 1000000L) div n_gold end"
        ).alias("completeness_ppm"),
        F.expr(
            "case when n_comparisons = 0 then null"
            " else (n_covered * 1000000L) div n_comparisons end"
        ).alias("quality_ppm"),
    )


def sorted_neighborhood(
    entities: DataFrame,
    key_col: str = "sn_key",
    id_col: str = "entity_id",
    window: int = 5,
    num_partitions: int | None = None,
) -> DataFrame:
    """Sorted-neighborhood candidate generation (Hernandez & Stolfo
    1995, the merge/purge method; the other classic ER blocking scheme
    next to standard blocking): sort all entities by a fuzzy key, slide
    a window of ``window`` rows, and emit every pair that co-occurs in
    some window — i.e. every pair at sort-rank distance 1..window-1.
    Complements key-equality blocking (candidate_pairs) where
    typo-perturbed keys land in DIFFERENT blocks but still sort
    adjacently; blocking_quality scores either scheme's output.

    Returns (id_a, id_b, sn_offset): id_a the earlier row in the
    global (key, id) order, sn_offset its rank distance (1-based).
    Ties in the key break by id, so output is deterministic under any
    partitioning. Exactly n - k pairs per offset k: pairs appear once.

    Scale shape — the textbook formulation is a GLOBAL sort + sliding
    window, which naively is a single-partition window (a scale-
    killer). Here the global rank is the same distributed prefix sum
    as pack_sequences: repartitionByRange keeps key ranges ordered by
    partition id, rank = per-partition row_number + a broadcast base
    from the (num-partitions-row) per-partition counts. The window
    itself never materializes: each row explodes offsets 1..window-1
    and equi-joins rank + k = rank — O(n * window) rows through one
    hash join, no range join, no single-task stage. At 100 TB both
    sides of that join are range-partitioned clones of the same
    ranked table, so AQE can plan it shuffle-local."""
    if window < 2:
        raise ValueError("sorted_neighborhood: window must be >= 2")
    from pyspark.sql.window import Window

    d = entities.select(
        F.col(key_col).alias("k"), F.col(id_col).alias("i")
    )
    if num_partitions:
        d = d.repartitionByRange(num_partitions, "k", "i")
    else:
        d = d.repartitionByRange("k", "i")
    d = d.withColumn("pid", F.spark_partition_id())
    w = Window.partitionBy("pid").orderBy("k", "i")
    # pids are physical: pin them before the two consumers (counts +
    # join) can replan the upstream differently (cf. pack_sequences)
    d = d.withColumn(
        "lr", F.row_number().over(w).cast("long")
    ).transform(_ckpt_nostats)
    counts = d.groupBy("pid").agg(F.count("*").alias("n")).collect()
    base, acc = [], 0
    for r in sorted(counts, key=lambda r: r.pid):
        base.append((r.pid, acc))
        acc += int(r.n)
    base_df = local_df(d.sparkSession, base, "pid int, base long")
    ranked = d.join(F.broadcast(base_df), "pid").select(
        (F.col("base") + F.col("lr")).alias("rank"), F.col("i")
    )
    left = ranked.select(
        "rank",
        F.col("i").alias("id_a"),
        F.explode(
            F.sequence(F.lit(1), F.lit(int(window) - 1))
        ).alias("sn_offset"),
    ).withColumn("rank_b", F.col("rank") + F.col("sn_offset"))
    return (
        left.join(
            ranked.select(
                F.col("rank").alias("rank_b"), F.col("i").alias("id_b")
            ),
            "rank_b",
        )
        .select("id_a", "id_b", F.col("sn_offset").cast("int").alias("sn_offset"))
    )


def link_increment(
    state: DataFrame | None,
    batch_occurrences: DataFrame,
    threshold: float = 0.5,
    max_block: int = 200,
    max_iter: int = 15,
    num_partitions: int | None = None,
) -> dict[str, DataFrame]:
    """Incremental entity linking: fold ONE new batch of mention
    occurrences into an existing linking state without re-running
    pairwise work over history — the shape a continuous 10^12-turn
    pipeline actually runs (full link_mentions re-blocks the whole
    corpus every time; this re-blocks only what the batch touches).

    ``state``: (mention_norm, mention_id, n_occurrences, entity_id) —
    the alias table with counts, i.e. exactly what this function (or a
    first-batch call with ``state=None``) returns as ``state``.
    ``batch_occurrences``: (conv_id, turn_idx, mention) like
    link_mentions' input. Returns {"state", "entities", "components"}.

    EXACT-EQUALITY contract, pinned in tests/test_link_increment.py:
    processing batches B1..Bk incrementally yields byte-identical
    aliases and entities to one link_mentions run over B1 ∪ .. ∪ Bk,
    PROVIDED no blocking key crosses the ``max_block`` cap between the
    batched and full views of the corpus. (A block that grows past the
    cap mid-stream stops yielding NEW edges either way, but merges its
    earlier edges already caused are never undone — incremental linking
    is monotone in merges, the standard streaming-ER semantics.)

    Why equality holds: the state's (mention_id -> entity_id) map is
    the connected-components contraction of all PAST similarity edges,
    and entity_id is the component's min mention_id — so running
    min-label CC over {new-new, new-old edges} with old mentions
    CONTRACTED to their entity super-node reaches exactly the full
    graph's min label for every merged component. Old-old pairs need
    never be re-scored: both endpoints' components are already in the
    contraction.

    Scale shape per batch: the batch's distinct mentions join the
    state's (broadcast-sized per-gram) block index — only blocks the
    batch TOUCHES produce pairs; the CC loop runs over the contracted
    graph (batch-sized + touched entities, not corpus-sized); the state
    rewrite is one join to remap entity ids. The full-corpus artifact
    written per batch is the state table itself — at cluster scale that
    is the Iceberg-style bucketed upsert the streaming KG sink
    implements (streaming/kg_sink.py), not a rewrite-the-world."""
    norm = normalize_mentions(batch_occurrences)
    db = distinct_mentions(norm)
    if state is None:
        dm = db.transform(_ckpt_nostats)
        edges = candidate_pairs(
            dm, max_block=max_block, threshold=threshold
        ).transform(_ckpt_nostats)
        comps = connected_components(
            dm, edges, max_iter=max_iter, num_partitions=num_partitions
        )
        entities, aliases = canonical_entities(dm, comps)
        new_state = dm.join(comps, "mention_id").select(
            "mention_norm",
            "mention_id",
            "n_occurrences",
            F.col("component_id").alias("entity_id"),
        )
        return {
            "state": new_state.transform(_ckpt_nostats),
            "entities": entities,
            "components": comps,
        }

    st = state.select(
        "mention_norm", "mention_id", "n_occurrences", "entity_id"
    )
    # merged distinct-mention view: counts add; mention_id is the stable
    # xxhash64 of the norm, identical between batched and full runs
    merged = (
        st.select("mention_norm", "n_occurrences")
        .unionByName(db.select("mention_norm", "n_occurrences"))
        .groupBy("mention_norm")
        .agg(F.sum("n_occurrences").alias("n_occurrences"))
        .withColumn("mention_id", F.xxhash64("mention_norm"))
        .transform(_ckpt_nostats)
    )
    new_dm = db.join(
        st.select("mention_norm"), "mention_norm", "left_anti"
    ).transform(_ckpt_nostats)
    # pairs where at least one side is NEW, blocked and capped on the
    # MERGED corpus view (cap parity with the full-batch run)
    with_grams = _with_grams(merged)
    blocks = _capped_blocks(with_grams, max_block)
    new_flag = new_dm.select("mention_id", F.lit(True).alias("is_new"))
    flagged = blocks.join(new_flag, "mention_id", "left").na.fill(
        {"is_new": False}
    )
    a = flagged.alias("a")
    b = flagged.alias("b")
    pairs = (
        a.join(b, "block_key")
        .where(F.col("a.mention_id") < F.col("b.mention_id"))
        .where(F.col("a.is_new") | F.col("b.is_new"))
        .select(
            F.col("a.mention_id").alias("a_id"),
            F.col("b.mention_id").alias("b_id"),
        )
        .distinct()
    )
    inc_edges = _score_pairs(with_grams, pairs, threshold)
    # contract old mentions to their entity super-node (entity_id IS the
    # component-min mention_id, so min-label CC over the contracted
    # graph reproduces the full graph's labels)
    contract = st.select("mention_id", "entity_id")
    ea = inc_edges.select("a_id", "b_id").join(
        contract.withColumnRenamed("mention_id", "a_id"), "a_id", "left"
    ).select(
        F.coalesce("entity_id", "a_id").alias("a_id"), "b_id"
    )
    eb = ea.join(
        contract.withColumnRenamed("mention_id", "b_id"), "b_id", "left"
    ).select(
        "a_id", F.coalesce("entity_id", "b_id").alias("b_id")
    )
    cc_edges = eb.where(F.col("a_id") != F.col("b_id")).transform(
        _ckpt_nostats
    )
    verts = (
        st.select(F.col("entity_id").alias("mention_id"))
        .unionByName(new_dm.select("mention_id"))
        .distinct()
    )
    comps = connected_components(
        verts, cc_edges, max_iter=max_iter, num_partitions=num_partitions
    )
    old_assign = st.join(
        comps.withColumnsRenamed(
            {"mention_id": "entity_id", "component_id": "new_entity_id"}
        ),
        "entity_id",
    ).select("mention_norm", "mention_id", F.col("new_entity_id"))
    new_assign = new_dm.join(comps, "mention_id").select(
        "mention_norm",
        "mention_id",
        F.col("component_id").alias("new_entity_id"),
    )
    assign = old_assign.unionByName(new_assign)
    new_state = (
        merged.join(assign, ["mention_norm", "mention_id"])
        .select(
            "mention_norm",
            "mention_id",
            "n_occurrences",
            F.col("new_entity_id").alias("entity_id"),
        )
        .transform(_ckpt_nostats)
    )
    entities = new_state.groupBy(F.col("entity_id")).agg(
        F.expr(
            "min_by(mention_norm, struct(-n_occurrences, mention_norm))"
        ).alias("canonical_name"),
        F.count("*").alias("n_mentions"),
        F.sum("n_occurrences").alias("n_occurrences"),
    )
    return {
        "state": new_state,
        "entities": entities,
        "components": new_state.select(
            "mention_id", F.col("entity_id").alias("component_id")
        ),
    }
