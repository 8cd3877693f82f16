"""Graph materialization: triples + canonical entities -> node/edge tables.

Produces the north-rule output tables:

* ``nodes(entity_id, canonical_name, n_mentions, n_occurrences)``
* ``edges(subj_entity_id, predicate, obj_entity_id, n_evidence,
  first_conv_id, first_turn_idx)`` — one row per distinct canonical edge,
  with provenance back to the earliest supporting turn.
* ``triples_canonical`` — per-occurrence triple rows with canonical ids.

Scale design: edges are written partitioned by ``predicate`` (55 predicates
-> natural partition pruning for per-relation queries); entity-id joins are
skew-safe because mention->entity mapping happens on the deduped alias
dimension (hot mentions are single dimension rows; see operators/linking.py).
"""

from __future__ import annotations

from ..functions.smalldf import local_df

import re

from pyspark.sql import DataFrame, Window, functions as F
from ..functions.partitioning import checkpoint_nostats as _ckpt_nostats
from ..functions.partitioning import checkpoint_with_metrics as _ckpt_metrics


def canonical_triples(
    triples: DataFrame, aliases: DataFrame
) -> DataFrame:
    """Attach canonical entity ids to subject and object-@value mentions.

    ``triples``: (conv_id, turn_idx, predicate, subject, object map, ...).
    ``aliases``: (mention_norm, entity_id) from linking. Mentions missing
    from the alias table (filtered/degenerate) keep a null id.
    """
    from .linking import norm_expr

    tr = triples.withColumn("subj_norm", norm_expr(F.col("subject"))).withColumn(
        "obj_norm", norm_expr(F.element_at(F.col("object"), "@value"))
    )
    subj_alias = aliases.select(
        F.col("mention_norm").alias("subj_norm"),
        F.col("entity_id").alias("subj_entity_id"),
    )
    obj_alias = aliases.select(
        F.col("mention_norm").alias("obj_norm"),
        F.col("entity_id").alias("obj_entity_id"),
    )
    # The alias dimension is mention-deduped, so it's small relative to the
    # fact side — but at 10^12-turn scale "small" can still be billions of
    # rows, so DON'T force a broadcast: under autoBroadcastJoinThreshold
    # Catalyst broadcasts it automatically, above it AQE picks sort-merge
    # with skew splitting (hot mentions are single dimension rows anyway).
    return tr.join(subj_alias, "subj_norm", "left").join(
        obj_alias, "obj_norm", "left"
    )


def edge_table(canonical: DataFrame) -> DataFrame:
    """Aggregate canonical triples to distinct edges with evidence counts."""
    return (
        canonical.where(
            F.col("subj_entity_id").isNotNull()
            & F.col("obj_entity_id").isNotNull()
        )
        .groupBy("subj_entity_id", "predicate", "obj_entity_id")
        .agg(
            F.count("*").alias("n_evidence"),
            F.min(F.struct("conv_id", "turn_idx")).alias("_first"),
        )
        .select(
            "subj_entity_id",
            "predicate",
            "obj_entity_id",
            "n_evidence",
            F.col("_first.conv_id").alias("first_conv_id"),
            F.col("_first.turn_idx").alias("first_turn_idx"),
        )
    )


def merge_edge_increment(
    existing: DataFrame, increment: DataFrame
) -> DataFrame:
    """Incremental edge-table maintenance: fold a new batch of canonical
    edges into the existing table (the daily-increment upsert every
    continuously-updated KG needs).

    Semantics per (subj, predicate, obj): evidence counts ADD, earliest
    provenance is the struct-min across both sides. Implemented as
    union + re-aggregate over only the touched keys' rows — with Iceberg
    this becomes MERGE INTO; over parquet the union-agg rewrites the
    affected partitions. One shuffle on the edge key; the increment is
    typically tiny relative to the table, so AQE broadcast-joins it."""
    cols = [
        "subj_entity_id", "predicate", "obj_entity_id",
        "n_evidence", "first_conv_id", "first_turn_idx",
    ]
    u = existing.select(*cols).unionByName(increment.select(*cols))
    return (
        u.groupBy("subj_entity_id", "predicate", "obj_entity_id")
        .agg(
            F.sum("n_evidence").alias("n_evidence"),
            F.min(F.struct("first_conv_id", "first_turn_idx")).alias("_first"),
        )
        .select(
            "subj_entity_id",
            "predicate",
            "obj_entity_id",
            "n_evidence",
            F.col("_first.first_conv_id").alias("first_conv_id"),
            F.col("_first.first_turn_idx").alias("first_turn_idx"),
        )
    )


def degree_stats(edges: DataFrame) -> DataFrame:
    """Per-entity degree/evidence profile over the canonical edge table:
    (entity_id, out_degree, in_degree, out_evidence, in_evidence) — the
    hub/authority screen every KG build runs (hot entities found here are
    the ones that need skew salting downstream, cf. linking's block cap).

    Scale shape: two hash aggregations over the (already evidence-
    aggregated) edge table — map-side partials bound hub skew — and one
    full outer join on entity_id. No pass over the occurrence-level
    triples."""
    outd = edges.groupBy(
        F.col("subj_entity_id").alias("entity_id")
    ).agg(
        F.count("*").cast("long").alias("out_degree"),
        F.sum("n_evidence").cast("long").alias("out_evidence"),
    )
    ind = edges.groupBy(
        F.col("obj_entity_id").alias("entity_id")
    ).agg(
        F.count("*").cast("long").alias("in_degree"),
        F.sum("n_evidence").cast("long").alias("in_evidence"),
    )
    z = F.lit(0).cast("long")
    return outd.join(ind, "entity_id", "full").select(
        "entity_id",
        F.coalesce("out_degree", z).alias("out_degree"),
        F.coalesce("in_degree", z).alias("in_degree"),
        F.coalesce("out_evidence", z).alias("out_evidence"),
        F.coalesce("in_evidence", z).alias("in_evidence"),
    )


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 10,
    num_partitions: int | None = None,
) -> DataFrame:
    """Entity importance over the canonical edge table: standard PageRank
    power iteration on the DISTINCT (subj -> obj) graph, with uniform
    teleport and dangling-mass redistribution —
    rank = (1-d)/N + d * (sum_in rank/outdeg + dangling_mass/N).

    Fixed ``iters`` rounds (no float convergence test — deterministic
    job count), each round: one join of the (static, checkpointed) link
    table with the rank vector keyed on src, one aggregation keyed on
    dst. Hub skew: the agg side has map-side partial combine; the join's
    build side is one row per node, so an oversized probe partition is
    exactly AQE skew-join's case. The per-round dangling-mass collect is
    a single scalar. Lineage is broken every round (localCheckpoint) so
    plans stay flat; at cluster scale persist the rank table per round."""
    e = (
        edges.select(
            F.col("subj_entity_id").alias("src"),
            F.col("obj_entity_id").alias("dst"),
        )
        .distinct()
    )
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    if num_partitions:
        nodes = nodes.repartition(num_partitions, "id")
    nodes = nodes.transform(_ckpt_nostats)
    n = nodes.count()
    if n == 0:
        return nodes.select(
            F.col("id").alias("entity_id"), F.lit(0.0).alias("rank")
        )
    outd = e.groupBy("src").agg(F.count("*").alias("outd"))
    links = e.join(outd, "src")
    if num_partitions:
        links = links.repartition(num_partitions, "src")
    links = links.transform(_ckpt_nostats)
    # dangling flag is carried IN the rank vector (joined once, here) so
    # each round's dangling-mass sum is a scan of the already-checkpointed
    # ranks, folded into the round's single job as a broadcast 1-row
    # aggregate — no separate per-round driver collect (was 2 jobs/round).
    dangling = nodes.join(
        e.select(F.col("src").alias("id")).distinct(), "id", "left_anti"
    ).withColumn("_dang", F.lit(True))
    ranks = (
        nodes.join(dangling, "id", "left")
        .select(
            "id",
            F.lit(1.0 / n).alias("rank"),
            F.coalesce(F.col("_dang"), F.lit(False)).alias("_dang"),
        )
        .transform(_ckpt_nostats)
    )
    for _ in range(iters):
        dang_mass = F.broadcast(
            ranks.where("_dang").agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm")
            )
        )
        contribs = (
            links.join(ranks, links["src"] == ranks["id"])
            .select(
                F.col("dst").alias("id"),
                (F.col("rank") / F.col("outd")).alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("c"))
        )
        ranks = (
            ranks.select("id", "_dang")
            .join(contribs, "id", "left")
            .crossJoin(dang_mass)
            .select(
                "id",
                (
                    F.lit((1.0 - damping) / n)
                    + damping
                    * (
                        F.coalesce(F.col("c"), F.lit(0.0))
                        + F.col("_dm") / F.lit(float(n))
                    )
                ).alias("rank"),
                "_dang",
            )
            .transform(_ckpt_nostats)
        )
    return ranks.select(F.col("id").alias("entity_id"), "rank")


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    damping: float = 0.85,
    iters: int = 10,
) -> DataFrame:
    """Personalized PageRank: importance RELATIVE TO a seed set — the
    teleport (and dangling mass) returns to the seeds instead of
    everywhere, so rank is proximity to the seeds weighted by graph
    structure. The KG uses: entity relevance for a query's seed
    entities, locality-aware candidate ranking, seed-expanded topic
    subgraphs. rank = (1-d)*reset(v) + d*(sum_in rank/outdeg +
    dangling_mass*reset(v)), reset = uniform over seeds.

    Same plan as pagerank (one link-join + one dst-agg per round, the
    dangling sum folded in as a broadcast 1-row aggregate; per-round
    localCheckpoint) with the reset vector carried as a column — seeds
    outside the graph's vertex set are ignored. Rows-only driver checks
    (float ranks); numpy twin pins exactness. Mass conservation: ranks
    sum to 1 every round (teleport + dangling both return to seeds)."""
    e = (
        edges.select(
            F.col("subj_entity_id").alias("src"),
            F.col("obj_entity_id").alias("dst"),
        )
        .distinct()
    )
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .transform(_ckpt_nostats)
    )
    seed_ids = (
        seeds.select(F.col("entity_id").alias("id"))
        .distinct()
        .join(nodes, "id")
        .transform(_ckpt_nostats)
    )
    n_seeds = seed_ids.count()
    if n_seeds == 0:
        return nodes.where(F.lit(False)).select(
            F.col("id").alias("entity_id"), F.lit(0.0).alias("rank")
        )
    outd = e.groupBy("src").agg(F.count("*").alias("outd"))
    links = e.join(outd, "src").transform(_ckpt_nostats)
    dangling = nodes.join(
        e.select(F.col("src").alias("id")).distinct(), "id", "left_anti"
    ).withColumn("_dang", F.lit(True))
    reset = 1.0 / n_seeds
    ranks = (
        nodes.join(seed_ids.withColumn("_seed", F.lit(True)), "id", "left")
        .join(dangling, "id", "left")
        .select(
            "id",
            F.when(F.col("_seed"), F.lit(reset)).otherwise(
                F.lit(0.0)
            ).alias("_reset"),
            F.coalesce(F.col("_dang"), F.lit(False)).alias("_dang"),
        )
        .withColumn("rank", F.col("_reset"))
        .transform(_ckpt_nostats)
    )
    for _ in range(iters):
        dang_mass = F.broadcast(
            ranks.where("_dang").agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm")
            )
        )
        contribs = (
            links.join(ranks, links["src"] == ranks["id"])
            .select(
                F.col("dst").alias("id"),
                (F.col("rank") / F.col("outd")).alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("c"))
        )
        ranks = (
            ranks.select("id", "_reset", "_dang")
            .join(contribs, "id", "left")
            .crossJoin(dang_mass)
            .select(
                "id",
                "_reset",
                "_dang",
                (
                    F.lit(1.0 - damping) * F.col("_reset")
                    + damping
                    * (
                        F.coalesce(F.col("c"), F.lit(0.0))
                        + F.col("_dm") * F.col("_reset")
                    )
                ).alias("rank"),
            )
            .transform(_ckpt_nostats)
        )
    return ranks.select(F.col("id").alias("entity_id"), "rank")


def two_hop_paths(edges: DataFrame) -> DataFrame:
    """(a, p1, b, p2, c): all length-2 directed predicate paths through the
    canonical edge table — the join KG reasoning/feature pipelines run
    (relation composition, path features for link prediction).

    One self-join keyed on the mid vertex. The skew point is a hub mid
    vertex (in_deg x out_deg pairs emitted): the edge table is
    evidence-aggregated so the hub's rows are distinct neighbors, and
    AQE skew-splitting spreads the probe side; for a true mega-hub,
    pre-filter with degree_stats (the documented screen)."""
    a = edges.select(
        F.col("subj_entity_id").alias("a"),
        F.col("predicate").alias("p1"),
        F.col("obj_entity_id").alias("b"),
    )
    b = edges.select(
        F.col("subj_entity_id").alias("b"),
        F.col("predicate").alias("p2"),
        F.col("obj_entity_id").alias("c"),
    )
    return a.join(b, "b").select("a", "p1", "b", "p2", "c")


def triangle_count(edges: DataFrame) -> DataFrame:
    """Global triangle count over the UNDIRECTED distinct entity graph:
    one row (n_triangles).

    Uses the degree-ordered orientation: every undirected edge is kept
    once, directed from the (degree, id)-smaller endpoint to the larger.
    Each vertex's oriented out-degree is then O(sqrt(|E|)) on any graph,
    so the wedge join (the quadratic step) emits sum deg_o^2 ~ |E|^1.5
    wedges instead of a hub's deg^2 — the standard bound that makes
    triangle counting feasible on power-law KGs. Two shuffles: the wedge
    self-join on the oriented source, the closing semi-join on the wedge
    endpoints."""
    und = (
        edges.select(
            F.least("subj_entity_id", "obj_entity_id").alias("u"),
            F.greatest("subj_entity_id", "obj_entity_id").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("x"))
        .union(und.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count("*").alias("d"))
    )
    du = deg.select(F.col("x").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("x").alias("v"), F.col("d").alias("dv"))
    oriented = (
        und.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("s"), F.col("v").alias("t")),
            )
            .otherwise(F.struct(F.col("v").alias("s"), F.col("u").alias("t")))
            .alias("e")
        )
        .select("e.s", "e.t")
    )
    w1 = oriented.select(F.col("s"), F.col("t").alias("t1"))
    w2 = oriented.select(F.col("s"), F.col("t").alias("t2"))
    wedges = w1.join(w2, "s").where(F.col("t1") < F.col("t2"))
    closing = oriented.select(
        F.col("s").alias("t1"), F.col("t").alias("t2")
    ).unionByName(
        oriented.select(F.col("t").alias("t1"), F.col("s").alias("t2"))
    ).where(F.col("t1") < F.col("t2")).distinct()
    tri = wedges.join(closing, ["t1", "t2"], "left_semi")
    return tri.agg(F.count("*").cast("long").alias("n_triangles"))


def write_graph(
    nodes: DataFrame,
    edges: DataFrame,
    base_path: str,
    fmt: str = "parquet",
) -> None:
    """Materialize node/edge tables. Edges partitioned by predicate for
    partition pruning; nodes written flat (entity_id is high-cardinality).
    With an Iceberg catalog configured, pass fmt='iceberg' and base_path as
    a table prefix instead."""
    if fmt == "iceberg":
        nodes.writeTo(f"{base_path}_nodes").createOrReplace()
        edges.writeTo(f"{base_path}_edges").partitionedBy("predicate").createOrReplace()
    else:
        nodes.write.mode("overwrite").parquet(f"{base_path}/nodes")
        edges.write.mode("overwrite").partitionBy("predicate").parquet(
            f"{base_path}/edges"
        )


def predicate_schema(edges: DataFrame) -> DataFrame:
    """Schema induction over the canonical edge table: per predicate, the
    cardinality statistics a KG pipeline derives its ontology (and its
    entity-resolution weights) from —

      n_triples, n_subjects, n_objects,
      functionality_ppm         = n_subjects*1e6 div n_triples
      inverse_functionality_ppm = n_objects*1e6  div n_triples

    A predicate with functionality ~1e6 is one-triple-per-subject
    (born_in-like, key-ish: a strong entity-resolution signal — two
    mentions sharing a highly-functional predicate's object are likely the
    same entity); low functionality marks multi-valued predicates.
    Integer-ppm division keeps the DuckDB oracle bit-exact. One
    aggregation pass: countDistinct subj/obj expand to Catalyst's
    two-phase partial-distinct plan, no extra job."""
    return edges.groupBy("predicate").agg(
        F.count("*").cast("long").alias("n_triples"),
        F.countDistinct("subj_entity_id").cast("long").alias("n_subjects"),
        F.countDistinct("obj_entity_id").cast("long").alias("n_objects"),
        F.expr(
            "(count(distinct subj_entity_id) * 1000000)"
            " div count(*)"
        ).alias("functionality_ppm"),
        F.expr(
            "(count(distinct obj_entity_id) * 1000000)"
            " div count(*)"
        ).alias("inverse_functionality_ppm"),
    )


def dense_index(
    df: DataFrame, col: str, num_partitions: int = 8
) -> DataFrame:
    """(col, ent_idx): dense 0..N-1 index = each row's rank in the global
    sort order of ``col`` — WITHOUT a one-task global window (the repo's
    no-global-Window rule). Range-partition on the column, row_number
    within each partition (distributed — partitions sort independently),
    then add per-partition offsets computed from a collected partition-
    count table (num_partitions rows — driver-sized by construction).
    Range partitioning makes partition order == value order, so the final
    index is the global sorted rank, independent of partition boundaries
    (what the DuckDB oracle's row_number reproduces).

    The partitioned frame is materialized (localCheckpoint) BEFORE the
    count collect: the offsets are only valid for the exact partition
    boundaries they were counted on, and an uncached repartitionByRange
    re-samples boundaries on every action — the counts job and the final
    window job could otherwise disagree, mis-assigning (or nulling)
    indices."""
    from pyspark.sql import Window

    parts = df.repartitionByRange(num_partitions, F.col(col))
    with_pid = parts.withColumn(
        "_pid", F.spark_partition_id()
    ).transform(_ckpt_nostats)
    counts = sorted(
        (r._pid, r.cnt)
        for r in with_pid.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    )
    offsets, acc = {}, 0
    for pid, cnt in counts:
        offsets[pid] = acc
        acc += cnt
    off = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    w = Window.partitionBy("_pid").orderBy(col)
    return with_pid.select(
        col,
        (
            F.row_number().over(w).cast("long")
            - 1
            + F.element_at(off, F.col("_pid"))
        ).alias("ent_idx"),
    )


def corrupt_triples(
    edges: DataFrame, n_neg: int = 2
) -> DataFrame:
    """Negative sampling for KG-embedding training (TransE/DistMult prep):
    for every positive edge, ``n_neg`` corrupted copies whose OBJECT is
    replaced by a pseudo-random entity drawn md5-deterministically from
    the graph's own entity set.

    Mechanics: entities get a dense 0..E-1 index (row_number over sorted
    id — one tiny shuffle of the vertex set); each (edge, neg_i) pair
    hashes to an index via md5(subj|pred|obj|i) and joins the index table.
    The join key is uniform by construction — no skew — and the entity
    index broadcasts while vertex sets fit (beyond that it is a balanced
    shuffle join). Corruptions that collide with the true object are kept
    and FLAGGED (is_false_negative) rather than resampled, so the row
    count is exactly n_pos * n_neg and the oracle stays closed-form."""

    ents = (
        edges.select(F.col("subj_entity_id").alias("eid"))
        .unionByName(edges.select(F.col("obj_entity_id").alias("eid")))
        .distinct()
    )
    n_ents = ents.count()
    idx = dense_index(ents, "eid")
    exploded = edges.select(
        "subj_entity_id",
        "predicate",
        "obj_entity_id",
        F.explode(F.array(*[F.lit(i) for i in range(n_neg)])).alias("neg_i"),
    ).withColumn(
        "ent_idx",
        F.expr(
            "cast(conv(substring(md5(concat_ws('|', subj_entity_id,"
            " predicate, obj_entity_id, neg_i)), 1, 7), 16, 10) as bigint)"
        )
        % F.lit(n_ents),
    )
    # no broadcast hint: under autoBroadcastJoinThreshold Catalyst
    # broadcasts the vertex-sized index on its own; beyond it (billions of
    # entities) this must degrade to a shuffle join on ent_idx — which is
    # uniform by construction, so it stays balanced. Forcing broadcast
    # here would OOM exactly when the graph gets big.
    return (
        exploded.join(idx, "ent_idx")
        .select(
            "subj_entity_id",
            "predicate",
            F.col("obj_entity_id").alias("true_obj"),
            "neg_i",
            F.col("eid").alias("neg_obj"),
            (F.col("eid") == F.col("obj_entity_id")).alias(
                "is_false_negative"
            ),
        )
    )


def label_propagation_communities(
    edges: DataFrame, rounds: int = 5, num_partitions: int | None = None
) -> DataFrame:
    """(entity_id, community_id): synchronous label propagation (LPA) over
    the undirected distinct entity graph — the density-based clustering a
    KG runs to find topical entity groups (unlike connected_components,
    which only finds reachability: LPA splits a connected graph along its
    sparse cuts).

    Deterministic variant: every vertex starts as its own label; each
    round every vertex adopts the most frequent label among its neighbors,
    ties broken by the SMALLEST label (no randomness, so results are
    partitioning- and engine-stable and the numpy twin in tests matches
    exactly). Fixed ``rounds`` (LPA oscillates rather than converging on
    bipartite-ish structures; a fixed budget is the standard production
    cut).

    Scale shape per round: one edges-x-labels join (the hub-skew point —
    AQE skew split applies, cf. propagate_neighbor_min) + one
    (vertex, label) count aggregation + one max_by per vertex, all
    map-side combined; lineage broken per round (localCheckpoint)."""
    und = (
        edges.select(
            F.col("subj_entity_id").alias("a"),
            F.col("obj_entity_id").alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    und = und.union(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    if num_partitions:
        und = und.repartition(num_partitions, "b")
    und = und.transform(_ckpt_nostats)
    # vertex set from ALL distinct subj/obj ids — not from the self-loop-
    # filtered undirected list — so an entity whose only edges are
    # self-loops still gets a community row (its own id), consistent with
    # pagerank/connected_components covering every vertex in the edge
    # table.
    labels = (
        edges.select(F.col("subj_entity_id").alias("id"))
        .union(edges.select(F.col("obj_entity_id").alias("id")))
        .distinct()
        .select("id", F.col("id").alias("label"))
        .transform(_ckpt_nostats)
    )
    for _ in range(rounds):
        nbr = und.join(labels, und["b"] == labels["id"]).select(
            F.col("a"), F.col("label")
        )
        freq = nbr.groupBy("a", "label").agg(F.count("*").alias("cnt"))
        # most frequent neighbor label; ties -> smallest label. max_by on
        # struct(cnt, -label): cnt major ascending, then -label ascending
        # = label descending... so invert: max of (cnt, -label) picks the
        # smallest label among max-cnt rows.
        best = freq.groupBy("a").agg(
            F.expr("max_by(label, struct(cnt, -label))").alias("label")
        )
        labels = (
            labels.select("id")
            .join(best, labels["id"] == best["a"], "left")
            .select(
                "id",
                F.coalesce(F.col("label"), F.col("id")).alias("label"),
            )
            .transform(_ckpt_nostats)
        )
    return labels.select(
        F.col("id").alias("entity_id"), F.col("label").alias("community_id")
    )


def constraint_violations(typed_edges: DataFrame) -> DataFrame:
    """Ontology domain/range validation over a TYPED edge table
    (subj_entity_id, subj_type, predicate, obj_entity_id, obj_type):
    induce each predicate's domain and range as the MODAL subject/object
    type (ties broken by type name, so induction is deterministic and
    engine-portable), then count edges whose types deviate — the
    consistency gate a KG build runs before publishing an ontology
    (W3C RDFS domain/range semantics, checked statistically the way
    open-IE pipelines must since no ontology is given a priori).

    Returns (predicate, domain_type, range_type, n_triples,
    n_domain_violations, n_range_violations, domain_violation_ppm,
    range_violation_ppm), integer-ppm so the DuckDB oracle is bit-exact.

    Scale shape: two (predicate, type) count aggregations — map-side
    combined, output is schema-sized (#predicates x #types rows) — a
    max_by per predicate (no window over data rows), and ONE broadcast
    join of the induced schema back onto the fact-side aggregate. The
    edge table is touched twice, both times in full-scan aggregations
    that reduce to schema-sized frames; nothing data-sized shuffles."""

    def modal(type_col: str, out: str) -> DataFrame:
        return (
            typed_edges.groupBy("predicate", type_col)
            .agg(F.count("*").alias("cnt"))
            .groupBy("predicate")
            .agg(
                # max-cnt type; ties -> lexicographically SMALLEST type.
                # struct orders by cnt then negated... strings can't
                # negate, so order by (cnt, reverse-rank) via min_by on
                # (-cnt, type): smallest (-cnt) = largest cnt, then
                # smallest type.
                F.expr(
                    f"min_by({type_col}, struct(-cnt, {type_col}))"
                ).alias(out)
            )
        )

    schema = modal("subj_type", "domain_type").join(
        modal("obj_type", "range_type"), "predicate"
    )
    return violations_against_schema(typed_edges, schema)


def violations_against_schema(
    typed_edges: DataFrame, schema: DataFrame
) -> DataFrame:
    """Violation counting against a FIXED (predicate, domain_type,
    range_type) schema — the second half of constraint_violations,
    separated so a STREAM can monitor against a frozen induced schema
    (streaming/constraints.py): the counts are SUM-mergeable per
    predicate, exactly the algebra the streaming state store maintains.
    One broadcast join + one map-side-combined aggregation."""
    counted = typed_edges.join(F.broadcast(schema), "predicate").groupBy(
        "predicate", "domain_type", "range_type"
    ).agg(
        F.count("*").cast("long").alias("n_triples"),
        F.sum(
            (F.col("subj_type") != F.col("domain_type")).cast("long")
        ).alias("n_domain_violations"),
        F.sum(
            (F.col("obj_type") != F.col("range_type")).cast("long")
        ).alias("n_range_violations"),
    )
    return counted.select(
        "predicate",
        "domain_type",
        "range_type",
        "n_triples",
        "n_domain_violations",
        "n_range_violations",
        F.expr("n_domain_violations * 1000000 div n_triples").alias(
            "domain_violation_ppm"
        ),
        F.expr("n_range_violations * 1000000 div n_triples").alias(
            "range_violation_ppm"
        ),
    )


def cardinality_profile(
    facts: DataFrame, functional_ppm: int = 900_000
) -> DataFrame:
    """SHACL-style cardinality induction + violation counts per predicate
    (sh:maxCount 1 on the object side = OWL FunctionalProperty; on the
    subject side = InverseFunctionalProperty).  No ontology is given a
    priori in an open-IE KG build, so functionality is INDUCED: a
    predicate is functional when >= ``functional_ppm`` ppm of its
    subjects have exactly one distinct object (and symmetrically for
    inverse-functional), then the minority multi-valued keys are the
    violation candidates a fusion stage must resolve.

    Input: (subj, predicate, obj).  Asserted facts are deduplicated
    first, so repeated extraction of the same triple never counts as a
    violation.  Returns one schema-sized row per predicate:
    (predicate, n_triples, n_subjects, functional_share_ppm,
    is_functional, n_violating_subjects, max_objects_per_subject,
    n_objects, inverse_share_ppm, is_inverse_functional,
    n_violating_objects, max_subjects_per_object).

    Scale shape: one distinct over (s,p,o) — partial-aggregated — then
    per side one (predicate, key) count aggregation that immediately
    re-aggregates to #predicates rows; integer ppm (`div`) keeps the
    DuckDB oracle bit-exact.  Nothing data-sized shuffles twice, no
    windows over data rows, output is schema-sized."""
    triples = facts.select("subj", "predicate", "obj").distinct()

    def side(key: str, other: str, share: str, nviol: str, mx: str,
             nkeys: str) -> DataFrame:
        per_key = triples.groupBy("predicate", key).agg(
            F.count("*").alias("n_other")
        )
        return per_key.groupBy("predicate").agg(
            F.count("*").cast("long").alias(nkeys),
            F.sum((F.col("n_other") == 1).cast("long")).alias("_single"),
            F.sum((F.col("n_other") > 1).cast("long")).alias(nviol),
            F.max("n_other").cast("long").alias(mx),
        ).select(
            "predicate",
            nkeys,
            F.expr(f"_single * 1000000 div {nkeys}").alias(share),
            nviol,
            mx,
        )

    subj_side = side(
        "subj", "obj", "functional_share_ppm",
        "n_violating_subjects", "max_objects_per_subject", "n_subjects",
    )
    obj_side = side(
        "obj", "subj", "inverse_share_ppm",
        "n_violating_objects", "max_subjects_per_object", "n_objects",
    )
    totals = triples.groupBy("predicate").agg(
        F.count("*").cast("long").alias("n_triples")
    )
    prof = totals.join(subj_side, "predicate").join(obj_side, "predicate")
    return prof.select(
        "predicate",
        "n_triples",
        "n_subjects",
        "functional_share_ppm",
        (F.col("functional_share_ppm") >= F.lit(functional_ppm)).alias(
            "is_functional"
        ),
        "n_violating_subjects",
        "max_objects_per_subject",
        "n_objects",
        "inverse_share_ppm",
        (F.col("inverse_share_ppm") >= F.lit(functional_ppm)).alias(
            "is_inverse_functional"
        ),
        "n_violating_objects",
        "max_subjects_per_object",
    )


def _undirected(edges: DataFrame) -> DataFrame:
    """Distinct bidirectional (a, b) pairs, self-loops dropped — the
    shared preprocessing of the undirected analytics (LPA, k-core, BFS)."""
    und = (
        edges.select(
            F.col("subj_entity_id").alias("a"),
            F.col("obj_entity_id").alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    return und.union(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()


def k_core(edges: DataFrame, k: int, max_rounds: int = 100) -> DataFrame:
    """The k-core of the undirected entity graph: the maximal subgraph
    where every vertex keeps degree >= k (Seidman 1983, "Network
    structure and minimum degree") — the standard KG PRUNING pass that
    strips weakly-attested periphery entities before embedding/serving.

    Iterative peeling: each round aggregates degrees over the current
    induced subgraph and drops vertices under k; removal can drop
    neighbors below k, so iterate to fixpoint. Returns (entity_id,
    degree) — the surviving vertices with their degree INSIDE the core.

    Scale shape per round: one map-side-combined degree aggregation +
    two semi-joins to induce the subgraph (keyed on vertex id — skew on
    hubs is bounded because hubs are precisely the vertices peeling
    never removes), lineage cut per round. Round count is the graph's
    degeneracy ordering depth, small in practice; max_rounds guards
    pathological chains."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    und = _undirected(edges).transform(_ckpt_nostats)
    prev = None
    for _ in range(max_rounds):
        deg = und.groupBy("a").agg(F.count("*").cast("long").alias("degree"))
        keep, _km = _ckpt_metrics(
            deg.where(F.col("degree") >= k), F.count(F.lit(1)).alias("n")
        )
        n = int(_km["n"] or 0)
        if n == 0:
            return keep.select(
                F.col("a").alias("entity_id"), "degree"
            )
        if prev is not None and n == prev:
            break
        prev = n
        kept_ids = keep.select("a")
        und = (
            und.join(kept_ids, "a", "left_semi")
            .join(
                kept_ids.select(F.col("a").alias("b")), "b", "left_semi"
            )
            .transform(_ckpt_nostats)
        )
    return (
        und.groupBy("a")
        .agg(F.count("*").cast("long").alias("degree"))
        .select(F.col("a").alias("entity_id"), "degree")
    )


def k_core_python(edge_list: list[tuple[int, int]], k: int) -> dict:
    """Flat twin of k_core: identical peeling recursion over an
    adjacency dict. Returns {entity_id: core_degree}."""
    adj: dict[int, set] = {}
    for a, b in edge_list:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for v in [v for v, ns in adj.items() if len(ns) < k]:
            for n in adj.pop(v):
                adj[n].discard(v)
            changed = True
    return {v: len(ns) for v, ns in adj.items()}


def bfs_distances(
    edges: DataFrame, seeds: DataFrame, max_depth: int = 4
) -> DataFrame:
    """Multi-source BFS over the undirected entity graph: (entity_id,
    dist) = hop distance to the nearest seed, up to ``max_depth`` — the
    neighborhood-expansion primitive behind KG locality sampling and
    "context subgraph" retrieval. ``seeds``: DataFrame(entity_id).

    Frontier algorithm: per level, one frontier x edges join + one
    anti-join against the visited set, both keyed on vertex id; the
    frontier only shrinks relative to the reachable set, and visited
    rows never reshuffle (the anti-join streams them). Unreachable
    vertices are absent from the output (not infinity rows — at
    100-TB graph scale materializing the complement is the bug)."""
    und = _undirected(edges).transform(_ckpt_nostats)
    dist = seeds.select(
        F.col("entity_id"), F.lit(0).cast("int").alias("dist")
    ).distinct().transform(_ckpt_nostats)
    frontier = dist.select("entity_id")
    for d in range(1, max_depth + 1):
        nxt, _m = _ckpt_metrics(
            frontier.join(und, frontier["entity_id"] == und["a"])
            .select(F.col("b").alias("entity_id"))
            .distinct()
            .join(dist.select("entity_id"), "entity_id", "left_anti")
            .withColumn("dist", F.lit(d).cast("int")),
            F.count(F.lit(1)).alias("n"),
        )
        if not _m["n"]:
            break
        dist = dist.unionByName(nxt).transform(_ckpt_nostats)
        frontier = nxt.select("entity_id")
    return dist


def indexed_adjacency(edges: DataFrame) -> DataFrame:
    """(a, idx, b, degree): each vertex's neighbors with a dense
    0..deg-1 rank (sorted by neighbor id) — the lookup table that turns
    'pick the h-th neighbor' into an equi-join. The window partitions
    BY VERTEX (never global); a mega-hub's partition is its neighbor
    list, the same rows any adjacency representation must hold."""
    from pyspark.sql import Window

    und = _undirected(edges)
    w = Window.partitionBy("a").orderBy("b")
    return und.select(
        "a",
        (F.row_number().over(w) - 1).cast("long").alias("idx"),
        "b",
        F.count("*").over(Window.partitionBy("a")).cast("long").alias(
            "degree"
        ),
    )


def random_walks(
    edges: DataFrame,
    walk_len: int = 4,
    n_walks: int = 2,
    salt: str = "walk",
    starts: DataFrame | None = None,
) -> DataFrame:
    """Deterministic 'random' walk corpus over the undirected entity
    graph — the sequence-generation stage of DeepWalk/node2vec (Perozzi
    2014): every vertex starts ``n_walks`` walks of ``walk_len`` steps;
    step t of walk w at vertex v moves to neighbor number
    md5(walk_id|t|v|salt) mod degree(v). Hash-driven choice instead of
    RNG state makes the corpus reproducible across engines, runs, and
    partitionings — and SQL-expressible, so the DuckDB oracle replays
    the identical walks.

    Returns LONG format (walk_id, step, vertex), step 0 = start vertex.
    Per step: one equi-join of the frontier against the indexed
    adjacency on (vertex, idx) — the hash spreads uniformly over each
    vertex's neighbor ranks, so the join is skew-bounded by true hub
    degree, and walk state never leaves the cluster.

    ``starts``: DataFrame(vertex) of start vertices (default: every
    vertex). DeepWalk's own cost knob — corpus size scales with the
    start batch, not the graph; start vertices without neighbors
    contribute a step-0 row and stop."""
    if walk_len < 0 or n_walks < 1:
        raise ValueError(f"bad walk shape: len={walk_len} n={n_walks}")
    adj = indexed_adjacency(edges).transform(_ckpt_nostats)
    if starts is None:
        starts = adj.select(F.col("a").alias("vertex")).distinct()
    else:
        starts = starts.select("vertex").distinct()
    cur = starts.select(
        F.explode(
            F.array(*[F.lit(w) for w in range(n_walks)])
        ).alias("w"),
        "vertex",
    ).select(
        F.concat_ws("_", F.col("vertex"), F.col("w")).alias("walk_id"),
        F.lit(0).cast("int").alias("step"),
        "vertex",
    )
    deg = adj.select(F.col("a").alias("vertex"), "degree").distinct()
    nbr = adj.select(F.col("a").alias("vertex"), "idx", "b")
    out = cur
    for t in range(1, walk_len + 1):
        # degree join FIRST, so the neighbor lookup is an exact-match
        # (vertex, idx) equi-join — joining the frontier straight onto
        # the adjacency and filtering would fan every hub visit out to
        # its full neighbor list before discarding all but one row
        hop = (
            cur.join(deg, "vertex")
            .withColumn(
                "idx",
                F.expr(
                    "cast(conv(substring(md5(concat_ws('|', walk_id,"
                    f" {t}, vertex, '{salt}')), 1, 7), 16, 10) as bigint)"
                    " % degree"
                ),
            )
            .join(nbr, ["vertex", "idx"])
            .select(
                "walk_id",
                F.lit(t).cast("int").alias("step"),
                F.col("b").alias("vertex"),
            )
        )
        cur = hop.transform(_ckpt_nostats)
        out = out.unionByName(cur)
    return out


def node2vec_walks(
    edges: DataFrame,
    walk_len: int = 4,
    n_walks: int = 2,
    w_ret: int = 1,
    w_stay: int = 2,
    w_far: int = 4,
    salt: str = "n2v",
    starts: DataFrame | None = None,
) -> DataFrame:
    """Second-order biased walk corpus — node2vec (Grover & Leskovec
    2016, §3.2) with the search bias expressed as INTEGER weights so the
    weighted choice is exact integer arithmetic and the DuckDB oracle
    replays the identical corpus. The paper's alpha_pq(prev, cand) is
    1/p when cand == prev (return), 1 when cand is adjacent to prev
    (BFS-ish stay), 1/q otherwise (DFS-ish explore); the defaults
    (1, 2, 4) encode p=2, q=1/2 scaled by 2 — any integer triple works.

    Step t >= 2 of walk w at vertex v with predecessor u: fan v's
    rank-indexed neighbor list out, weight each candidate by the triple,
    and pick the candidate whose cumulative-weight interval contains
    md5(walk_id|t|v|u|salt) mod total_weight. Step 1 has no predecessor
    and is the unbiased first-order choice (same rule as random_walks).

    Plan shape per step: the frontier joins the adjacency on the CURRENT
    vertex (this materializes deg(v) candidate rows per walk — inherent
    to node2vec, every implementation scans the neighbor list to weight
    it; the fan-out is bounded by true hub degree), one LEFT join of the
    candidates against the undirected edge set on (prev, cand) marks the
    distance-1 class, and one walk_id-partitioned window (uniform keys,
    at most deg(v) rows per partition) does the cumulative-weight pick.
    Walk state never leaves the cluster; nothing collects. At 100 TB the
    alternative — precomputing per-(u,v) alias tables — is O(sum of
    deg(u)*deg(v)) memory and is exactly what the scan avoids.

    Returns LONG format (walk_id, step, vertex), step 0 = start vertex;
    walks stop early at sink vertices (inner join drops them)."""
    if walk_len < 0 or n_walks < 1:
        raise ValueError(f"bad walk shape: len={walk_len} n={n_walks}")
    if min(w_ret, w_stay, w_far) < 1:
        raise ValueError("node2vec weights must be positive integers")
    from pyspark.sql import Window

    adj = indexed_adjacency(edges).transform(_ckpt_nostats)
    nbr = adj.select(F.col("a").alias("vertex"), "idx", "b")
    deg = adj.select(F.col("a").alias("vertex"), "degree").distinct()
    und = adj.select(F.col("a").alias("pv"), F.col("b").alias("cand"))
    if starts is None:
        starts = adj.select(F.col("a").alias("vertex")).distinct()
    else:
        starts = starts.select("vertex").distinct()
    cur = starts.select(
        F.explode(F.array(*[F.lit(w) for w in range(n_walks)])).alias("w"),
        "vertex",
    ).select(
        F.concat_ws("_", F.col("vertex"), F.col("w")).alias("walk_id"),
        "vertex",
    )
    out = cur.select(
        "walk_id", F.lit(0).cast("int").alias("step"), "vertex"
    )
    if walk_len == 0:
        return out

    def _hash(t: int, extra: str) -> str:
        return (
            "cast(conv(substring(md5(concat_ws('|', walk_id,"
            f" {t}, vertex{extra}, '{salt}')), 1, 7), 16, 10) as bigint)"
        )

    # step 1: no predecessor yet — unbiased degree-mod choice
    frontier = (
        cur.join(deg, "vertex")
        .withColumn("idx", F.expr(_hash(1, "") + " % degree"))
        .join(nbr, ["vertex", "idx"])
        .select(
            "walk_id",
            F.col("vertex").alias("prev"),
            F.col("b").alias("vertex"),
        )
        .transform(_ckpt_nostats)
    )
    out = out.unionByName(
        frontier.select(
            "walk_id", F.lit(1).cast("int").alias("step"), "vertex"
        )
    )
    w_cum = (
        Window.partitionBy("walk_id")
        .orderBy("idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("walk_id")
    for t in range(2, walk_len + 1):
        cand = (
            frontier.join(nbr, "vertex")
            .join(und, (F.col("prev") == F.col("pv"))
                  & (F.col("b") == F.col("cand")), "left")
            .withColumn(
                "wt",
                F.when(F.col("b") == F.col("prev"), F.lit(w_ret))
                .when(F.col("pv").isNotNull(), F.lit(w_stay))
                .otherwise(F.lit(w_far))
                .cast("long"),
            )
            .withColumn("cum", F.sum("wt").over(w_cum))
            .withColumn("total", F.sum("wt").over(w_tot))
            .withColumn(
                "r", F.expr(_hash(t, ", prev") + " % total")
            )
        )
        frontier = (
            cand.where(
                (F.col("r") >= F.col("cum") - F.col("wt"))
                & (F.col("r") < F.col("cum"))
            )
            .select(
                "walk_id",
                F.col("vertex").alias("prev"),
                F.col("b").alias("vertex"),
            )
            .transform(_ckpt_nostats)
        )
        out = out.unionByName(
            frontier.select(
                "walk_id", F.lit(t).cast("int").alias("step"), "vertex"
            )
        )
    return out


def match_bgp(
    edges: DataFrame,
    patterns: list[tuple[str, str, str]],
    optional: list[tuple[str, str, str]] | None = None,
    sources: list[DataFrame] | None = None,
    filters: list[str] | None = None,
    values: tuple[list[str], list[tuple]] | None = None,
    bind: dict | None = None,
) -> DataFrame:
    """Basic-graph-pattern matching — the SPARQL BGP core (W3C SPARQL
    1.1 §5.1) re-expressed as Catalyst joins: each pattern is a
    (subject, predicate, object) triple of terms; a term starting '?'
    is a variable, anything else a constant (predicates compare as
    strings, entity positions as longs). Returns one column per
    distinct variable, one row per solution binding.

    Example — customers and suppliers co-located in a nation's region:
      match_bgp(edges, [("?c", "cust_in_nation", "?n"),
                        ("?s", "supp_in_nation", "?n"),
                        ("?n", "in_region",      "?r")])

    Plan shape: one filtered scan of the edge table per pattern (the
    predicate/constant filters push into the parquet scan), folded with
    natural equi-joins on shared variables — which is exactly the form
    Catalyst reorders and AQE re-plans; there is no interpretation
    overhead at run time. A repeated variable inside one pattern
    becomes a same-row filter. Cartesian patterns (no shared variable
    with what's been folded so far) are rejected — at KG scale an
    accidental cross product is the bug, and SPARQL engines flag it
    too.

    ``optional`` patterns fold AFTER the required group as LEFT joins —
    SPARQL OPTIONAL semantics (§6): bindings survive with nulls for the
    optional variables when no match exists, and multiply when several
    do. Each optional pattern must share a variable with the required
    group (same cross-product rule).

    ``sources`` (optional, same length as ``patterns``) evaluates each
    REQUIRED pattern against its own triple DataFrame instead of
    ``edges`` — the hook semi-naive forward chaining uses to bind one
    body atom to the round's delta while the rest scan the full fact
    set. Optional patterns always scan ``edges``.

    ``filters`` (SPARQL FILTER, §17): SQL boolean expressions over
    variable names (no '?'), e.g. ``"n % 8 = 2"`` or ``"c != s"``. Each
    is applied at the EARLIEST fold point where all its variables are
    bound — below every later join, so Catalyst sees it before the
    expensive exchanges (and pushes single-scan predicates into the
    parquet read). SPARQL's error-is-false rule falls out of SQL NULL
    semantics: a filter over an unbound OPTIONAL variable evaluates
    NULL and the row drops. A filter naming a variable no pattern binds
    raises.

    ``values`` (SPARQL VALUES, §10.2): ``(varnames, rows)`` — an inline
    solution table joined into the required group (broadcast: VALUES
    blocks are query-sized). Shares the cross-product rule; varnames
    must not carry '?'.

    ``bind`` (SPARQL BIND, §10.1): ``{new_var: sql_expr}`` assignment
    expressions extending each solution AFTER the group fold — pure
    per-row projections, zero plan cost. Per the spec's in-scope rule
    the target must be FRESH (an already-bound name raises); later
    binds may reference earlier ones (dict order). ``filters`` apply
    at fold points and therefore cannot reference bind targets — a
    post-BIND constraint is a ``.where`` on the result (or SPARQL's
    own FILTER-after-BIND, which is the same thing)."""
    if not patterns:
        raise ValueError("match_bgp: empty pattern list")

    def is_var(t: str) -> bool:
        return isinstance(t, str) and t.startswith("?")

    if sources is not None and len(sources) != len(patterns):
        raise ValueError(
            "match_bgp: sources must match patterns 1:1 "
            f"({len(sources)} vs {len(patterns)})"
        )
    frames = []
    for idx, (s, p, o) in enumerate(list(patterns) + list(optional or [])):
        src = (
            sources[idx]
            if sources is not None and idx < len(patterns)
            else edges
        )
        df = src.select("subj_entity_id", "predicate", "obj_entity_id")
        if not is_var(p):
            df = df.where(F.col("predicate") == p)
        if not is_var(s):
            df = df.where(F.col("subj_entity_id") == int(s))
        if not is_var(o):
            df = df.where(F.col("obj_entity_id") == int(o))
        if is_var(s) and is_var(o) and s == o:
            df = df.where(F.col("subj_entity_id") == F.col("obj_entity_id"))
        cols = []
        if is_var(s):
            cols.append(F.col("subj_entity_id").alias(s[1:]))
        if is_var(o) and o != s:
            cols.append(F.col("obj_entity_id").alias(o[1:]))
        if is_var(p):
            if p in (s, o):
                raise ValueError(
                    f"predicate variable {p} reused in entity position"
                )
            cols.append(F.col("predicate").alias(p[1:]))
        if not cols:
            # all-constant pattern: an existence assertion — keep a
            # constant column so the fold can cross it in (1 row or 0)
            df = df.limit(1).select(F.lit(1).alias("_exists"))
            frames.append((df, set()))
            continue
        frames.append(
            (df.select(*cols), {x[1:] for x in (s, o, p) if is_var(x)})
        )

    n_req = len(patterns)
    if values is not None:
        vnames, vrows = values
        if any(v.startswith("?") for v in vnames):
            raise ValueError("match_bgp: VALUES varnames carry no '?'")
        if not vrows or any(len(r) != len(vnames) for r in vrows):
            raise ValueError("match_bgp: VALUES rows must be non-empty "
                             "and match varnames arity")
        vdf = F.broadcast(
            edges.sparkSession.createDataFrame(
                [tuple(r) for r in vrows], list(vnames)
            ).distinct()  # VALUES is a solution SET constraint here
        )
        # fold as one more REQUIRED frame: inherits the shared-variable
        # and cross-product rules
        frames.insert(n_req, (vdf, set(vnames)))
        n_req += 1

    all_vars = set().union(*(v for _, v in frames))
    pending = list(filters or [])
    _ident = re.compile(r"[A-Za-z_]\w*")

    def _refs(expr: str) -> set:
        # identifiers that are pattern variables; SQL function names and
        # keywords fall out of the intersection. A filter naming a column
        # NO pattern binds fails Spark analysis when applied (its refs
        # here are empty, so it applies at the first fold point).
        return set(_ident.findall(expr)) & all_vars

    def _apply_ready(out: DataFrame, bound: set) -> DataFrame:
        for expr in list(pending):
            if _refs(expr) <= bound:
                out = out.where(F.expr(expr))
                pending.remove(expr)
        return out

    out, bound = frames[0]
    out = _apply_ready(out, bound)
    for i, (df, vars_i) in enumerate(frames[1:], start=1):
        shared = sorted(bound & vars_i)
        req = i < n_req
        if not shared and not req:
            raise ValueError(
                "match_bgp: optional pattern shares no variable with "
                "the required group"
            )
        if bound and vars_i and not shared:
            raise ValueError(
                "match_bgp: pattern introduces a cross product (no "
                f"shared variable with {sorted(bound)})"
            )
        if shared:
            out = out.join(df, shared, "inner" if req else "left")
        elif not bound:
            # the folded side so far is an existence assertion (<= 1
            # row): IT is the broadcast side, not the new pattern scan
            out = df.crossJoin(F.broadcast(out))
        else:
            # existence-assertion fold: <= 1 row, broadcast it
            out = out.crossJoin(F.broadcast(df))
        bound |= vars_i
        out = _apply_ready(out, bound)
    if pending:
        # a filter referencing variables never jointly bound (can only
        # happen with refs spanning no frame) — surface it loudly
        raise ValueError(f"match_bgp: unapplied filters {pending}")
    out = out.drop("_exists")
    for name, expr in (bind or {}).items():
        tgt = name.lstrip("?")
        if tgt in out.columns:
            raise ValueError(
                f"match_bgp: BIND target {tgt} is already bound "
                "(SPARQL 1.1 §10.1 requires a fresh variable)"
            )
        out = out.withColumn(tgt, F.expr(expr))
    return out


def union_bgp(
    edges: DataFrame,
    groups: list,
) -> DataFrame:
    """SPARQL UNION (§6.2): evaluate each group as its own BGP and
    concatenate the solution sequences (bag semantics — no dedup, as
    the spec's UNION without DISTINCT). Variables a branch does not
    bind come back NULL in its rows, via union-by-name with missing
    columns allowed.

    Each group is either a plain pattern list or a dict with any of
    ``patterns`` / ``optional`` / ``sources`` / ``filters`` /
    ``values`` — the :func:`match_bgp` keywords. A variable bound as an
    entity (long) in one branch and a predicate (string) in another is
    a query bug; it's rejected here with the conflicting types rather
    than letting the union cast silently."""
    if not groups:
        raise ValueError("union_bgp: empty group list")
    outs = []
    for g in groups:
        kw = dict(g) if isinstance(g, dict) else {"patterns": g}
        outs.append(match_bgp(edges, **kw))
    types: dict[str, str] = {}
    for o in outs:
        for name, dtype in o.dtypes:
            if types.setdefault(name, dtype) != dtype:
                raise ValueError(
                    f"union_bgp: variable {name} bound with conflicting "
                    f"types {types[name]} vs {dtype} across branches"
                )
    from functools import reduce

    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), outs
    )


def match_path(
    edges: DataFrame,
    predicate: str,
    max_hops: int,
    min_hops: int = 1,
) -> DataFrame:
    """SPARQL property-path p{min,max} (SPARQL 1.1 §9): DIRECTED
    reachability via 1..max_hops chains of ``predicate``. Returns
    (src, dst, hops) with hops = the MINIMAL chain length — the
    subsumption/part-of closure query every ontology-backed KG serves.

    Frontier semi-naive evaluation: level k joins the level-(k-1)
    frontier with the single-predicate step table and anti-joins pairs
    already found (so each pair materializes once, at its minimal
    depth — the anti-join is also what keeps cyclic graphs from looping
    forever). Early-exits when a level adds nothing.

    Scale contract: transitive closure is O(V^2) pairs in the worst
    case — max_hops is the explicit cap (SPARQL engines bound or
    refuse unbounded '+' over large graphs for the same reason), and
    each level is one equi-join + one anti-join, both keyed on vertex
    ids."""
    if max_hops < 1 or min_hops < 1 or min_hops > max_hops:
        raise ValueError(
            f"bad hop bounds: min={min_hops} max={max_hops}"
        )
    step = (
        edges.where(F.col("predicate") == predicate)
        .select(
            F.col("subj_entity_id").alias("src"),
            F.col("obj_entity_id").alias("dst"),
        )
        .distinct()
    )
    return _path_closure(step, max_hops, min_hops)


def _path_closure(step: DataFrame, max_hops: int, min_hops: int) -> DataFrame:
    """Bounded-repetition closure of a compiled (src, dst) step table —
    the frontier semi-naive loop shared by :func:`match_path` (single
    predicate) and :func:`match_path_expr` (composite step)."""
    step = step.transform(_ckpt_nostats)
    found = step.withColumn("hops", F.lit(1).cast("int"))
    frontier = step
    for k in range(2, max_hops + 1):
        nxt, _m = _ckpt_metrics(
            frontier.select("src", F.col("dst").alias("mid"))
            .join(step.select(F.col("src").alias("mid"), "dst"), "mid")
            .select("src", "dst")
            .distinct()
            .join(found.select("src", "dst"), ["src", "dst"], "left_anti")
            .withColumn("hops", F.lit(k).cast("int")),
            F.count(F.lit(1)).alias("n"),
        )
        if not _m["n"]:
            break
        found = found.unionByName(nxt).transform(_ckpt_nostats)
        frontier = nxt
    return found.where(F.col("hops") >= min_hops)


def compile_path_step(edges: DataFrame, expr) -> DataFrame:
    """Compile a SPARQL 1.1 §9 property-path EXPRESSION into one
    (src, dst) step table. Grammar (nested python tuples):

    - ``"p"``                  — forward step on predicate p;
    - ``("inv", e)``           — inverse path ``^e`` (src/dst swapped);
    - ``("alt", e1, e2, ...)`` — alternative ``e1|e2|...`` (union);
    - ``("seq", e1, e2, ...)`` — sequence ``e1/e2/...`` (relational
      composition: equi-join each stage's dst to the next's src);
    - ``("neg", [p1, ...])``   — negated property set ``!(p1|...)``:
      any FORWARD edge whose predicate is not listed (the spec's
      NPS is over predicate IRIs, not sub-expressions).

    Plan shape: leaves are filtered scans of the edge table (the
    predicate equality / NOT-IN pushes into the parquet read), ``alt``
    is a union (no shuffle of its own), ``seq`` is one equi-join per
    '/' keyed on the shared vertex, and the final distinct collapses
    duplicate derivations. No cartesian products can arise: every join
    this compiler emits is an equi-join on the composition vertex."""
    if isinstance(expr, str):
        if expr.startswith("?"):
            raise ValueError(
                f"compile_path_step: predicate expected, got variable {expr}"
            )
        return edges.where(F.col("predicate") == expr).select(
            F.col("subj_entity_id").alias("src"),
            F.col("obj_entity_id").alias("dst"),
        ).distinct()
    if not isinstance(expr, tuple) or not expr:
        raise ValueError(f"compile_path_step: bad expression node {expr!r}")
    op, *args = expr
    if op == "inv":
        if len(args) != 1:
            raise ValueError("compile_path_step: inv takes one argument")
        return compile_path_step(edges, args[0]).select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        )
    if op == "alt":
        if len(args) < 2:
            raise ValueError("compile_path_step: alt takes >= 2 arguments")
        out = compile_path_step(edges, args[0])
        for a in args[1:]:
            out = out.unionByName(compile_path_step(edges, a))
        return out.distinct()
    if op == "seq":
        if len(args) < 2:
            raise ValueError("compile_path_step: seq takes >= 2 arguments")
        out = compile_path_step(edges, args[0])
        for a in args[1:]:
            nxt = compile_path_step(edges, a)
            out = (
                out.select("src", F.col("dst").alias("mid"))
                .join(nxt.select(F.col("src").alias("mid"), "dst"), "mid")
                .select("src", "dst")
            )
        return out.distinct()
    if op == "neg":
        if len(args) != 1 or not isinstance(args[0], (list, tuple, set)) \
                or not args[0]:
            raise ValueError(
                "compile_path_step: neg takes one non-empty predicate list"
            )
        preds = sorted(args[0])
        if any(not isinstance(p, str) or p.startswith("?") for p in preds):
            raise ValueError(
                "compile_path_step: negated property sets hold predicate "
                "IRIs only (SPARQL 1.1 §9.1)"
            )
        return edges.where(~F.col("predicate").isin(preds)).select(
            F.col("subj_entity_id").alias("src"),
            F.col("obj_entity_id").alias("dst"),
        ).distinct()
    raise ValueError(f"compile_path_step: unknown operator {op!r}")


def match_path_expr(
    edges: DataFrame,
    expr,
    max_hops: int = 1,
    min_hops: int = 1,
) -> DataFrame:
    """SPARQL 1.1 §9 property-path expressions with bounded repetition:
    ``expr{min_hops, max_hops}`` where ``expr`` is any
    :func:`compile_path_step` expression (sequence / alternative /
    inverse / negated property set). Returns (src, dst, hops) with hops
    = the minimal number of EXPRESSION repetitions (so for the default
    1..1 bounds this is just the compiled step itself).

    The expression compiles ONCE into a step table; repetition reuses
    match_path's frontier semi-naive loop (per level: one equi-join +
    one anti-join, early exit on an empty delta). The same explicit
    max_hops cap applies — unbounded ``*``/``+`` over a 100-TB edge
    table is a refused query, exactly as production SPARQL engines
    bound it."""
    if max_hops < 1 or min_hops < 1 or min_hops > max_hops:
        raise ValueError(
            f"bad hop bounds: min={min_hops} max={max_hops}"
        )
    step = compile_path_step(edges, expr)
    if max_hops == 1:
        return step.withColumn("hops", F.lit(1).cast("int"))
    return _path_closure(step, max_hops, min_hops)


def _head_triples(bindings: DataFrame, template: tuple) -> DataFrame:
    """Project BGP solution bindings through a CONSTRUCT head template
    (s_term, p_term, o_term): '?var' terms pull the binding column,
    anything else is a constant (string predicate / long entity id)."""
    s, p, o = template

    def term(t, pos: str):
        c = (
            F.col(t[1:])
            if isinstance(t, str) and t.startswith("?")
            else F.lit(t)
        )
        if pos == "p":
            return c.cast("string").alias("predicate")
        return c.cast("long").alias(
            "subj_entity_id" if pos == "s" else "obj_entity_id"
        )

    return bindings.select(term(s, "s"), term(p, "p"), term(o, "o"))


def construct_triples(
    edges: DataFrame,
    patterns: list[tuple[str, str, str]],
    template: tuple[str, str, str],
    optional: list[tuple[str, str, str]] | None = None,
    where: str | None = None,
) -> DataFrame:
    """SPARQL CONSTRUCT (W3C SPARQL 1.1 §10.2): evaluate a basic graph
    pattern and materialize NEW triples through a head template — the
    single-rule application step of KG enrichment (derive co-location,
    inverse, shortcut edges from existing facts). ``where`` is an
    optional SQL boolean over the binding columns (SPARQL FILTER).

    Output is DISTINCT (a CONSTRUCT result is an RDF graph — a set),
    so duplicate bindings collapse before anything downstream joins on
    the derived edges. Plan shape is match_bgp's (pushed-filter scans
    folded by equi-joins) plus one projection and one aggregation-free
    dedup shuffle on the full output key."""
    b = match_bgp(edges, patterns, optional)
    if where is not None:
        b = b.where(where)
    return _head_triples(b, template).distinct()


def sparql_update(
    edges: DataFrame,
    where: list[tuple[str, str, str]],
    delete: list[tuple[str, str, str]] | None = None,
    insert: list[tuple[str, str, str]] | None = None,
    optional: list[tuple[str, str, str]] | None = None,
    filters: list[str] | None = None,
) -> DataFrame:
    """SPARQL 1.1 Update ``DELETE/INSERT WHERE`` (W3C SPARQL 1.1 Update
    section 3.1.3) as a pure graph-to-graph transform: evaluate the WHERE
    group ONCE against the input graph, instantiate the DELETE and
    INSERT templates from the SAME solution set, and return
    ``(graph MINUS delete-set) UNION insert-set`` -- the spec's order (both
    template sets are computed against the pre-update graph, so an
    inserted triple can never feed its own deletion and vice versa).
    The KG-maintenance primitive: retire superseded facts and write
    their replacements in one atomic derivation.

    Templates are CONSTRUCT-style ``(s, p, o)`` terms -- ``?var`` pulls
    the binding column, anything else is a constant. Per the spec,
    solutions leaving a template variable unbound (possible via
    ``optional``) instantiate NO triple for that template -- projected
    rows with nulls drop. RDF graphs are SETS: the input is
    set-normalized first, so the result is duplicate-free regardless of
    input multiplicity.

    Plan shape: match_bgp's folded pushed-filter joins, one left_anti
    on the full (s, p, o) key for the difference, one union + distinct
    for the insert -- two key-shuffles total, both on the same key a
    publish-time dedup already pays; no driver-side state. ``edges``
    columns beyond the triple key are dropped (an update yields a
    graph, not an annotated edge table)."""
    if not delete and not insert:
        raise ValueError(
            "sparql_update: at least one of delete/insert templates "
            "is required"
        )
    cols = ["subj_entity_id", "predicate", "obj_entity_id"]
    bindings = match_bgp(edges, where, optional=optional, filters=filters)

    def template_set(templates):
        parts = [
            _head_triples(bindings, t).na.drop(subset=cols)
            for t in templates
        ]
        out = parts[0]
        for p_ in parts[1:]:
            out = out.unionByName(p_)
        return out.distinct()

    out = edges.select(*cols).distinct()
    if delete:
        out = out.join(template_set(delete), cols, "left_anti")
    if insert:
        out = out.unionByName(template_set(insert)).distinct()
    return out


def forward_chain(
    edges: DataFrame,
    rules: list[tuple[list[tuple[str, str, str]], tuple[str, str, str]]],
    max_rounds: int = 12,
) -> DataFrame:
    """Datalog-style forward chaining to fixpoint: repeatedly apply
    CONSTRUCT rules (body BGP -> head template) and add the derived
    triples to the fact set until no rule derives anything new — the
    materialization step of RDFS/OWL-RL-style entailment (transitive
    predicates, inverses, subproperty shortcuts) a published KG bakes
    in so query time pays no inference cost.

    SEMI-NAIVE evaluation (the classic Datalog optimization): a rule
    with k body atoms is evaluated k times per round, each variant
    binding ONE atom to the PREVIOUS ROUND'S DELTA (via match_bgp's
    ``sources``) and the rest to the full fact set — every new
    derivation uses at least one new fact, so a round's work scales
    with what changed, not with the whole closure. Derived triples
    anti-join the accumulated set; an empty delta ends the loop (each
    round's delta is localCheckpointed, keeping lineage flat across
    rounds). ``max_rounds`` is the explicit cap — closure depth is
    log-bounded for transitive rules evaluated semi-naively on the
    accumulated set, so 12 rounds cover chains of ~2^12 hops; hitting
    the cap returns the partial closure (same contract as match_path's
    max_hops).

    Returns the MATERIALIZED graph: original ∪ derived triples with
    ``derived_round`` (0 = asserted, k = first derived in round k) —
    distinct on (subj, predicate, obj)."""
    if max_rounds < 1:
        raise ValueError(f"forward_chain: bad max_rounds {max_rounds}")
    for body, head in rules:
        body_vars = {
            t[1:] for pat in body for t in pat
            if isinstance(t, str) and t.startswith("?")
        }
        head_vars = {
            t[1:] for t in head
            if isinstance(t, str) and t.startswith("?")
        }
        if not head_vars <= body_vars:
            raise ValueError(
                "forward_chain: head variables "
                f"{sorted(head_vars - body_vars)} not bound by body {body}"
            )
    key = ["subj_entity_id", "predicate", "obj_entity_id"]
    full = (
        edges.select(*key)
        .distinct()
        .withColumn("derived_round", F.lit(0))
        .transform(_ckpt_nostats)
    )
    delta = full.select(*key)
    for rnd in range(1, max_rounds + 1):
        parts = []
        for body, head in rules:
            for i in range(len(body)):
                srcs = [
                    delta if j == i else full for j in range(len(body))
                ]
                parts.append(
                    _head_triples(
                        match_bgp(full, body, sources=srcs), head
                    )
                )
        derived = parts[0]
        for p in parts[1:]:
            derived = derived.unionByName(p)
        delta, _m = _ckpt_metrics(
            derived.distinct().join(full.select(*key), key, "left_anti"),
            F.count(F.lit(1)).alias("n"),
        )
        if not _m["n"]:
            break
        full = full.unionByName(
            delta.withColumn("derived_round", F.lit(rnd))
        ).transform(_ckpt_nostats)
    return full


def mine_composition_rules(
    edges: DataFrame,
    min_support: int = 2,
    min_confidence_ppm: int = 100_000,
) -> DataFrame:
    """AMIE-style mining of composition rules p1(x,y) ^ p2(y,z) =>
    p3(x,z) over the edge table (Galárraga et al. 2013, "AMIE:
    Association Rule Mining under Incomplete Evidence" — the classic
    KG-completion rule miner, restricted to the length-2 closed rules
    that dominate its output). Returns (p1, p2, p3, n_body,
    support, confidence_ppm):

      n_body         = #distinct (x,z) pairs connected by p1 then p2
      support        = #those pairs where p3(x,z) also holds
      confidence_ppm = support * 1e6 div n_body   (PCA-free std conf)

    Scale shape: one self-join on the mid vertex (the same hub-skew
    point as two_hop_paths — AQE skew-split applies), deduped to
    distinct (p1, p2, x, z) BEFORE the head join so support counts
    pairs, not paths; the head join keys on (x, z) — uniform, not
    hub-keyed; both aggregates are schema-sized (predicates^2 rows
    out). Entirely relational, so the DuckDB twin is bit-exact."""
    if min_support < 1 or not 0 <= min_confidence_ppm <= 1_000_000:
        raise ValueError(
            f"bad thresholds: support={min_support} "
            f"conf_ppm={min_confidence_ppm}"
        )
    a = edges.select(
        F.col("subj_entity_id").alias("x"),
        F.col("predicate").alias("p1"),
        F.col("obj_entity_id").alias("mid"),
    )
    b = edges.select(
        F.col("subj_entity_id").alias("mid"),
        F.col("predicate").alias("p2"),
        F.col("obj_entity_id").alias("z"),
    )
    body = a.join(b, "mid").select("p1", "p2", "x", "z").distinct()
    heads = edges.select(
        F.col("subj_entity_id").alias("x"),
        F.col("predicate").alias("p3"),
        F.col("obj_entity_id").alias("z"),
    )
    n_body = body.groupBy("p1", "p2").agg(
        F.count("*").cast("long").alias("n_body")
    )
    support = (
        body.join(heads, ["x", "z"])
        .groupBy("p1", "p2", "p3")
        .agg(F.count("*").cast("long").alias("support"))
    )
    return (
        support.join(F.broadcast(n_body), ["p1", "p2"])
        .withColumn(
            "confidence_ppm",
            F.expr("support * 1000000 div n_body"),
        )
        .where(
            (F.col("support") >= min_support)
            & (F.col("confidence_ppm") >= min_confidence_ppm)
        )
        .select(
            "p1", "p2", "p3", "n_body", "support", "confidence_ppm"
        )
    )


def apply_composition_rules(
    edges: DataFrame, rules: DataFrame
) -> DataFrame:
    """KG completion by rule application — the consumer of
    :func:`mine_composition_rules`: for each rule p1(x,y) ^ p2(y,z) =>
    p3(x,z), every body match whose head fact is NOT yet in the KG
    becomes a candidate new fact, carrying the rule's confidence (a
    pair predicted by several rules takes the MAX, the same exact-max
    convention as bootstrap/pattern_apply — no float accumulation
    order). This is AMIE's actual payoff: the miner finds the
    regularities, this materializes the missing facts they imply.

    Returns (subj_entity_id, predicate, obj_entity_id, confidence_ppm,
    n_rules). Scale shape: the body self-join on the mid vertex (the
    miner's own plan — AQE skew-split on hubs), the rule table rides
    BROADCAST (schema-sized), and the known-fact exclusion is one
    anti-join keyed on the uniform (x, p3, z)."""
    a = edges.select(
        F.col("subj_entity_id").alias("x"),
        F.col("predicate").alias("p1"),
        F.col("obj_entity_id").alias("mid"),
    )
    b = edges.select(
        F.col("subj_entity_id").alias("mid"),
        F.col("predicate").alias("p2"),
        F.col("obj_entity_id").alias("z"),
    )
    body = a.join(b, "mid").select("p1", "p2", "x", "z").distinct()
    cand = body.join(
        F.broadcast(
            rules.select("p1", "p2", "p3", "confidence_ppm")
        ),
        ["p1", "p2"],
    )
    known = edges.select(
        F.col("subj_entity_id").alias("x"),
        F.col("predicate").alias("p3"),
        F.col("obj_entity_id").alias("z"),
    )
    return (
        cand.join(known, ["x", "p3", "z"], "left_anti")
        .groupBy("x", "p3", "z")
        .agg(
            F.max("confidence_ppm").cast("long").alias("confidence_ppm"),
            F.count("*").cast("long").alias("n_rules"),
        )
        .select(
            F.col("x").alias("subj_entity_id"),
            F.col("p3").alias("predicate"),
            F.col("z").alias("obj_entity_id"),
            "confidence_ppm",
            "n_rules",
        )
    )


def skipgram_pairs(
    walks: DataFrame, window: int = 2
) -> DataFrame:
    """Skip-gram training pairs from a walk corpus (the DeepWalk/
    node2vec -> word2vec handoff, Perozzi 2014 §4.2): for every walk,
    every ordered (center, context) vertex pair within ``window`` steps,
    aggregated to (src, dst, cnt). ``walks``: long format
    (walk_id, step, vertex) as produced by random_walks.

    One self-join keyed on walk_id (walks are short and uniform — the
    join fans out len*window per walk, bounded by construction) + one
    count aggregation with map-side combine. No driver-side windowing."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    a = walks.select(
        "walk_id", F.col("step").alias("i"), F.col("vertex").alias("src")
    )
    b = walks.select(
        "walk_id", F.col("step").alias("j"), F.col("vertex").alias("dst")
    )
    return (
        a.join(b, "walk_id")
        .where(
            (F.col("i") != F.col("j"))
            & (F.abs(F.col("i") - F.col("j")) <= window)
        )
        .groupBy("src", "dst")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def entity_cooccurrence_pmi(
    conv_entities: DataFrame,
    max_entities_per_conv: int | None = None,
) -> DataFrame:
    """PMI-weighted entity co-occurrence — the classic distributional
    edge type a KG build adds NEXT TO extracted relations: two entities
    that keep appearing in the same conversations are related even when
    no extractor fires between them (and a high-PMI pair with no KG edge
    is a recall probe for the extraction heads).

    Input: (conv_id, entity_id) mention occurrences (duplicates fine —
    deduped here). Output per unordered pair seen together:
    pmi = ln(n_joint * n_convs / (n_a * n_b)) over conversation-level
    presence counts, plus the raw counts so downstream thresholds don't
    re-derive them.

    Plan: dedup to conversation-level presence (one shuffle), per-entity
    counts via map-side combine, then the within-conversation pair join
    — quadratic ONLY in each conversation's distinct-entity count, which
    ``max_entities_per_conv`` caps explicitly (a 10k-entity megathread
    would emit 50M pairs; capped conversations are DROPPED, not sampled,
    so the statistic stays exact over the kept population). n_convs is a
    one-scalar count; pmi is computed with one expression shape so the
    DuckDB twin is bit-exact."""
    ce = conv_entities.select("conv_id", "entity_id").distinct()
    if max_entities_per_conv is not None:
        sizes = ce.groupBy("conv_id").agg(
            F.count("*").alias("_n_ents")
        ).where(F.col("_n_ents") <= max_entities_per_conv)
        ce = ce.join(sizes.select("conv_id"), "conv_id")
    ce = ce.transform(_ckpt_nostats)  # reused 3x: counts + both join sides
    n_convs = ce.select("conv_id").distinct().count()
    ent_counts = ce.groupBy("entity_id").agg(
        F.count("*").cast("long").alias("n_solo")
    )
    a = ce.select("conv_id", F.col("entity_id").alias("entity_a"))
    b = ce.select("conv_id", F.col("entity_id").alias("entity_b"))
    joint = (
        a.join(b, "conv_id")
        .where(F.col("entity_a") < F.col("entity_b"))
        .groupBy("entity_a", "entity_b")
        .agg(F.count("*").cast("long").alias("n_joint"))
    )
    return (
        joint.join(
            ent_counts.select(
                F.col("entity_id").alias("entity_a"),
                F.col("n_solo").alias("n_a"),
            ),
            "entity_a",
        )
        .join(
            ent_counts.select(
                F.col("entity_id").alias("entity_b"),
                F.col("n_solo").alias("n_b"),
            ),
            "entity_b",
        )
        .select(
            "entity_a",
            "entity_b",
            "n_joint",
            "n_a",
            "n_b",
            F.lit(n_convs).cast("long").alias("n_convs"),
            F.log(
                F.col("n_joint").cast("double")
                * F.lit(n_convs).cast("double")
                / (
                    F.col("n_a").cast("double")
                    * F.col("n_b").cast("double")
                )
            ).alias("pmi"),
        )
    )


def neighborhood_similarity(
    edges: DataFrame,
    max_pivot_degree: int | None = None,
) -> DataFrame:
    """Structural entity similarity over the undirected KG: for every
    vertex pair sharing >= 1 neighbor, the Jaccard and overlap
    coefficients of their neighbor sets plus the Adamic-Adar score —
    the standard candidate generator for KG entity resolution (two
    canonicalized entities whose neighborhoods coincide are link-
    prediction duplicates) and for missing-edge suggestion.

    Plan: wedge enumeration — the adjacency self-joined on the PIVOT
    (common neighbor) with x < y, aggregated to pair counts. A pivot of
    degree d emits d*(d-1)/2 wedges, so hubs dominate cost;
    ``max_pivot_degree`` excludes pivots above the cap (the usual
    analytics contract: a 10^6-degree hub contributes ~0 Adamic-Adar
    weight per wedge yet 10^12 wedges — capped pivots change scores only
    by that near-zero mass, and the cap is visible in the signature, not
    silent). Degree joins are aggregation-sized. Jaccard/overlap are one
    integer->double division each (bit-exact cross-engine); Adamic-Adar
    sums 1/ln(degree) doubles, whose addition ORDER is partition-
    dependent — it ships in the operator output but belongs OUT of
    hash-compared oracles (pin it with a python twin instead)."""
    und = _undirected(edges).transform(_ckpt_nostats)
    deg = und.groupBy("a").agg(F.count("*").cast("long").alias("degree"))
    pivots = deg.withColumnRenamed("a", "pivot").withColumnRenamed(
        "degree", "pivot_degree"
    )
    if max_pivot_degree is not None:
        pivots = pivots.where(F.col("pivot_degree") <= max_pivot_degree)
    wedges = (
        und.select(F.col("a").alias("pivot"), F.col("b").alias("x"))
        .join(
            und.select(F.col("a").alias("pivot"), F.col("b").alias("y")),
            "pivot",
        )
        .where(F.col("x") < F.col("y"))
        .join(pivots, "pivot")
    )
    pair_stats = wedges.groupBy("x", "y").agg(
        F.count("*").cast("long").alias("n_common"),
        F.sum(
            F.lit(1.0) / F.log(F.col("pivot_degree").cast("double"))
        ).alias("adamic_adar"),
    )
    return (
        pair_stats.join(
            deg.select(F.col("a").alias("x"), F.col("degree").alias("deg_x")),
            "x",
        )
        .join(
            deg.select(F.col("a").alias("y"), F.col("degree").alias("deg_y")),
            "y",
        )
        .select(
            F.col("x").alias("entity_a"),
            F.col("y").alias("entity_b"),
            "n_common",
            F.col("deg_x").alias("degree_a"),
            F.col("deg_y").alias("degree_b"),
            (
                F.col("n_common").cast("double")
                / (F.col("deg_x") + F.col("deg_y") - F.col("n_common"))
                .cast("double")
            ).alias("jaccard"),
            (
                F.col("n_common").cast("double")
                / F.least("deg_x", "deg_y").cast("double")
            ).alias("overlap"),
            "adamic_adar",
        )
    )


def shortest_paths(
    edges: DataFrame,
    seeds: DataFrame,
    weight: str | None = None,
    max_hops: int = 4,
) -> DataFrame:
    """Multi-source weighted shortest paths over the undirected entity
    graph — Bellman-Ford rounds with a semi-naive frontier: (entity_id,
    cost) = minimal total edge cost from the nearest seed over paths of
    at most ``max_hops`` edges. The weighted sibling of bfs_distances
    (evidence-weighted KG proximity, trust-decay propagation).

    ``weight``: integer column of ``edges`` (each undirected direction
    inherits its edge row's value; ties across parallel rows take the
    MIN weight). Integer costs keep min() exact across engines — the
    DuckDB twin is a depth-guarded recursive CTE, bit-equal. None =
    every edge costs 1 (then this is bfs_distances with costs).

    Per round: frontier x adjacency join, min-agg on the destination,
    and an improvement join against the running best — rows that didn't
    improve never reshuffle; the frontier carries ONLY improved
    vertices, so rounds shrink toward fixpoint and terminate early when
    no cost improves (Bellman-Ford's invariant: round k has settled all
    <=k-hop optimal paths). Unreachable vertices are absent, never
    materialized as infinity rows."""
    if max_hops < 0:
        raise ValueError(f"max_hops must be >= 0, got {max_hops}")
    w_col = (
        F.col(weight).cast("long") if weight else F.lit(1).cast("long")
    )
    e = edges.select(
        F.col("subj_entity_id").alias("a"),
        F.col("obj_entity_id").alias("b"),
        w_col.alias("w"),
    ).where(F.col("a") != F.col("b"))
    und = (
        e.unionByName(
            e.select(F.col("b").alias("a"), F.col("a").alias("b"), "w")
        )
        .groupBy("a", "b")
        .agg(F.min("w").alias("w"))
        .transform(_ckpt_nostats)
    )
    best = (
        seeds.select("entity_id")
        .distinct()
        .select("entity_id", F.lit(0).cast("long").alias("cost"))
        .transform(_ckpt_nostats)
    )
    frontier = best
    for _ in range(max_hops):
        cand = (
            frontier.join(und, frontier["entity_id"] == und["a"])
            .select(
                F.col("b").alias("entity_id"),
                (F.col("cost") + F.col("w")).alias("cost"),
            )
            .groupBy("entity_id")
            .agg(F.min("cost").alias("cost"))
        )
        improved = (
            cand.join(
                best.select(
                    "entity_id", F.col("cost").alias("_cur")
                ),
                "entity_id",
                "left",
            )
            .where(F.col("_cur").isNull() | (F.col("cost") < F.col("_cur")))
            .select("entity_id", "cost")
        )
        improved, _m = _ckpt_metrics(improved, F.count(F.lit(1)).alias("n"))
        if not _m["n"]:
            break
        best = (
            best.join(improved.select("entity_id"), "entity_id", "left_anti")
            .unionByName(improved)
            .transform(_ckpt_nostats)
        )
        frontier = improved
    return best


def hits(
    edges: DataFrame, iters: int = 8
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) over the DIRECTED
    distinct edge graph: authority(v) = sum of hub scores pointing at v,
    hub(v) = sum of authority scores v points at, L2-normalized each
    half-step. The classic complement to PageRank for KGs whose
    predicates are citation-shaped (a good 'source' entity is one whose
    objects are themselves authoritative).

    Fixed ``iters`` rounds, each: two join+agg passes over the
    (static, checkpointed) edge list keyed on src/dst with map-side
    combine. Normalization is deferred to ONE final pass — scalar
    scaling commutes with the linear update, so per-half-step L2
    normalizing (textbook form) only changes magnitudes the final
    normalize restores, and skipping it removes two blocking one-scalar
    collects per round (the round-5 job-count lesson: count jobs per
    iteration before bytes). Unnormalized scores grow ~lambda^(2k)
    (lambda = top eigenvalue of A^T A <= max in-degree * max out-degree
    bound), so double overflow needs lambda^(2*iters) > 1e308 — far
    beyond any sane iters; normalize mid-loop if you ever push there.
    Float scores are NOT cross-engine bit-stable — rows-only driver
    checks; exactness is pinned against a numpy twin in tests."""
    e = (
        edges.select(
            F.col("subj_entity_id").alias("src"),
            F.col("obj_entity_id").alias("dst"),
        )
        .distinct()
        .transform(_ckpt_nostats)
    )
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .transform(_ckpt_nostats)
    )
    if nodes.isEmpty():
        return nodes.select(
            F.col("id").alias("entity_id"),
            F.lit(0.0).alias("hub"),
            F.lit(0.0).alias("authority"),
        )
    score = nodes.select(
        "id", F.lit(1.0).alias("hub"), F.lit(1.0).alias("authority")
    ).transform(_ckpt_nostats)
    for _ in range(iters):
        auth = (
            e.join(
                score.select(F.col("id").alias("src"), "hub"), "src"
            )
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("hub").alias("authority"))
        )
        hub = (
            e.join(
                auth.select(F.col("id").alias("dst"), "authority"), "dst"
            )
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("authority").alias("hub"))
        )
        score = (
            nodes.join(hub, "id", "left")
            .join(auth, "id", "left")
            .select(
                "id",
                F.coalesce("hub", F.lit(0.0)).alias("hub"),
                F.coalesce("authority", F.lit(0.0)).alias("authority"),
            )
            .transform(_ckpt_nostats)
        )
    norms = score.agg(
        F.sqrt(F.sum(F.col("hub") * F.col("hub"))).alias("h"),
        F.sqrt(F.sum(F.col("authority") * F.col("authority"))).alias("a"),
    ).collect()[0]
    h_norm = norms["h"] or 1.0
    a_norm = norms["a"] or 1.0
    return score.select(
        F.col("id").alias("entity_id"),
        (F.col("hub") / F.lit(h_norm)).alias("hub"),
        (F.col("authority") / F.lit(a_norm)).alias("authority"),
    )


def minus_bgp(
    edges: DataFrame,
    patterns: list,
    minus: list,
    filters: list | None = None,
    minus_filters: list | None = None,
) -> DataFrame:
    """SPARQL MINUS (W3C SPARQL 1.1 §8.3): solutions of the required
    group with every solution removed that agrees with some minus-group
    solution on their shared variables. Both groups evaluate through
    :func:`match_bgp` with REQUIRED patterns only (no OPTIONAL in the
    minus group), so every minus column is bound and SQL anti-join
    equality IS the spec's compatibility test. When the two groups
    share no variable, MINUS removes nothing — the spec's
    disjoint-domain rule (§8.3.2) — and the left solutions return
    unchanged.

    Plan shape: the minus group projects to the shared variables only
    before the anti-join, so the anti-join build side carries
    |shared-var combinations| rows, not full minus bindings; Spark's
    left_anti never multiplies the probe side, so no pre-distinct
    shuffle is needed."""
    left = match_bgp(edges, patterns, filters=filters)
    right = match_bgp(edges, minus, filters=minus_filters)
    shared = sorted(set(left.columns) & set(right.columns))
    if not shared:
        return left
    return left.join(right.select(*shared), shared, "left_anti")


def local_clustering(edges: DataFrame) -> DataFrame:
    """Per-vertex local clustering coefficient over the UNDIRECTED
    distinct entity graph (Watts-Strogatz 1998): lcc(v) = triangles
    through v / (deg(v) choose 2). The per-entity density signal KG
    curation uses to separate clique-like cores (high lcc) from
    star-hub spam (high degree, lcc ~ 0).

    Returns (entity_id, degree, n_triangles, lcc_ppm) for every vertex;
    ``lcc_ppm`` is integer parts-per-million via exact integer floor
    division — bit-stable cross-engine (float division is not), 0 when
    degree < 2.

    Plan shape: the triangle ENUMERATION reuses triangle_count's
    degree-ordered orientation (wedge fan-out bounded ~sqrt(|E|) per
    vertex on any graph), but keeps the closing join as INNER to get
    the triangle rows, then explodes each triangle to its 3 corners and
    counts per corner — one extra map-side-combined aggregation over
    3x the triangle count, no new skew surface (a corner's row count is
    its triangle incidence, exactly the output)."""
    und = (
        edges.select(
            F.least("subj_entity_id", "obj_entity_id").alias("u"),
            F.greatest("subj_entity_id", "obj_entity_id").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .transform(_ckpt_nostats)
    )
    deg = (
        und.select(F.col("u").alias("x"))
        .union(und.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count("*").cast("long").alias("d"))
        .transform(_ckpt_nostats)
    )
    du = deg.select(F.col("x").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("x").alias("v"), F.col("d").alias("dv"))
    oriented = (
        und.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("s"), F.col("v").alias("t")),
            )
            .otherwise(F.struct(F.col("v").alias("s"), F.col("u").alias("t")))
            .alias("e")
        )
        .select("e.s", "e.t")
        .transform(_ckpt_nostats)
    )
    w1 = oriented.select(F.col("s"), F.col("t").alias("t1"))
    w2 = oriented.select(F.col("s"), F.col("t").alias("t2"))
    wedges = w1.join(w2, "s").where(F.col("t1") < F.col("t2"))
    closing = (
        oriented.select(F.col("s").alias("t1"), F.col("t").alias("t2"))
        .unionByName(
            oriented.select(F.col("t").alias("t1"), F.col("s").alias("t2"))
        )
        .where(F.col("t1") < F.col("t2"))
        .distinct()
    )
    # inner join keeps the triangle rows (each triangle exactly once:
    # wedges are distinct and closing is deduped)
    tri = wedges.join(closing, ["t1", "t2"])
    per_vertex = (
        tri.select(
            F.explode(F.array("s", "t1", "t2")).alias("x")
        )
        .groupBy("x")
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )
    return (
        deg.join(per_vertex, "x", "left")
        .select(
            F.col("x").alias("entity_id"),
            F.col("d").alias("degree"),
            F.coalesce("n_triangles", F.lit(0)).cast("long").alias(
                "n_triangles"
            ),
            F.when(
                F.col("d") >= 2,
                F.expr(
                    "(2000000 * coalesce(n_triangles, 0)) div (d * (d - 1))"
                ),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("lcc_ppm"),
        )
    )


def labeled_bfs_distances(
    edges: DataFrame, seeds: DataFrame, max_depth: int = 4
) -> DataFrame:
    """Per-source multi-source BFS: (src, entity_id, dist) = hop
    distance from EACH seed to each vertex it reaches within
    ``max_depth`` over the undirected entity graph — bfs_distances with
    the source label kept, the primitive under per-entity centrality
    and ego-network extraction. ``seeds``: DataFrame(entity_id).

    Same frontier shape as bfs_distances with the key widened to
    (src, entity_id): one frontier x edges join + one anti-join per
    level. Work per level is sum over sources of that source's frontier
    — the labeled frontier IS the output being built, so no
    amplification beyond the result size."""
    from ..functions.partitioning import compute_dense_region

    und = _undirected(edges).transform(_ckpt_nostats)
    dist = (
        seeds.select(
            F.col("entity_id").alias("src"),
            F.col("entity_id"),
            F.lit(0).cast("int").alias("dist"),
        )
        .distinct()
        .transform(_ckpt_nostats)
    )
    frontier = dist.select("src", "entity_id")
    # compute_dense_region: the frontier x adjacency join fans each
    # (src, v) row out to deg(v) rows — byte-based AQE coalescing
    # single-tasks it (see betweenness_centrality). The emptiness probe
    # rides the checkpoint as an observed metric (one action per level).
    from ..functions.partitioning import checkpoint_with_metrics

    with compute_dense_region(edges.sparkSession):
        for d in range(1, max_depth + 1):
            nxt, m = checkpoint_with_metrics(
                frontier.join(und, frontier["entity_id"] == und["a"])
                .select("src", F.col("b").alias("entity_id"))
                .distinct()
                .join(
                    dist.select("src", "entity_id"),
                    ["src", "entity_id"],
                    "left_anti",
                )
                .withColumn("dist", F.lit(d).cast("int")),
                F.count(F.lit(1)).alias("n"),
            )
            if not m["n"]:
                break
            dist = dist.unionByName(nxt).transform(_ckpt_nostats)
            frontier = nxt.select("src", "entity_id")
    return dist


def harmonic_centrality(
    edges: DataFrame, seeds: DataFrame, max_depth: int = 4
) -> DataFrame:
    """Depth-bounded harmonic centrality (Boldi & Vigna 2014) for a
    BOUNDED source set: h(s) = sum over reached vertices of 1/dist,
    truncated at ``max_depth`` — the centrality that stays defined on
    disconnected graphs (unreachable vertices contribute 0, and are
    never materialized). All-vertex exact centrality is O(V * E) and is
    NOT this operator; the bounded-seed contract is the scale contract.

    Returns (src, n_reached, harmonic_ppm): the 1/d sum is accumulated
    as integer ppm (1_000_000 div d summed exactly), so the statistic
    is bit-stable cross-engine."""
    lab = labeled_bfs_distances(edges, seeds, max_depth=max_depth)
    return (
        lab.where(F.col("dist") >= 1)
        .groupBy("src")
        .agg(
            F.count("*").cast("long").alias("n_reached"),
            F.sum(F.expr("1000000 div dist")).cast("long").alias(
                "harmonic_ppm"
            ),
        )
    )


def entity_fact_summary(edges: DataFrame, k: int = 3) -> DataFrame:
    """Entity summarization: each subject's top-``k`` facts ranked by
    predicate RARITY (ascending global predicate frequency — rarest
    first), the LinkSUM/RELIN-style informativeness heuristic in exact
    integer form: a fact whose predicate appears on few edges says more
    about its subject than one every entity carries.

    Returns (subj_entity_id, predicate, obj_entity_id, pred_count,
    rank) with rank 1..k per subject, deterministic total order
    (pred_count, predicate, obj) — bit-stable cross-engine, no floats.

    Plan shape: the predicate frequency table is vocabulary-sized and
    broadcast into the ranking join; the per-subject top-k is one
    window partitioned by subject (a subject's partition is its own
    fact list — the same rows any summarizer must inspect)."""
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    pc = edges.groupBy("predicate").agg(
        F.count("*").cast("long").alias("pred_count")
    )
    w = Window.partitionBy("subj_entity_id").orderBy(
        "pred_count", "predicate", "obj_entity_id"
    )
    return (
        edges.select("subj_entity_id", "predicate", "obj_entity_id")
        .join(F.broadcast(pc), "predicate")
        .select(
            "subj_entity_id",
            "predicate",
            "obj_entity_id",
            "pred_count",
            F.row_number().over(w).cast("int").alias("rank"),
        )
        .where(F.col("rank") <= k)
    )


_HLL_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def _anf_estimate(counters: DataFrame, m: int) -> DataFrame:
    """Per-vertex HLL estimate from SPARSE register rows (v, ridx, rho):
    absent registers are zeros. Returns one row (pairs_est)."""
    alpha = _HLL_ALPHA.get(m, 0.7213 / (1 + 1.079 / m))
    per_v = counters.groupBy("v").agg(
        F.count("*").cast("long").alias("nz"),
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("ssum"),
    )
    zeros = F.lit(float(m)) - F.col("nz")
    raw = F.lit(alpha * m * m) / (zeros + F.col("ssum"))
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return per_v.select(est.alias("e")).agg(
        F.sum("e").alias("pairs_est")
    )


def hyper_anf(
    edges: DataFrame, p: int = 4, max_t: int = 8
) -> list[tuple[int, float]]:
    """HyperANF (Boldi, Vigna & Rosa, WWW 2011): the neighborhood
    function N(t) = number of (source, reachable-within-t) pairs over
    the undirected entity graph, estimated with one HyperLogLog
    counter per vertex — THE way to read distance structure (median
    distance, effective diameter) off a graph too big for per-pair
    BFS. Exact all-pairs is O(V*E); this is O(t * E * m) register
    rows with m = 2**p registers, and every step is a relational
    max-merge.

    Spark shape — sparse HLL as ROWS, not blobs: a counter is the row
    set (v, ridx, rho); merging neighbor counters is exploded
    union + groupBy(v, ridx).max(rho), which Spark executes with
    map-side partial aggregation (max is algebraic), so hub fan-in
    combines before the shuffle instead of flooding one reducer —
    the same skew story as pagerank's combine. Registers a ball never
    touched are never materialized (per-vertex row count <= min(m,
    |ball|)), so early rounds cost far less than the m-per-vertex
    worst case. Per-round localCheckpoint cuts the lineage exactly
    like pagerank (swap for persist + cleanup on a real cluster).

    Register placement is md5-deterministic (same convention as the
    KGE corruption sampler): h = 60-bit integer from the hex digest,
    ridx = h mod m, rho = leading-zero rank of the remaining 60-p
    bits — so the python twin replays the whole computation and the
    estimate curve is reproducible across engines and runs.

    Returns the collected curve [(t, pairs_est)] for t = 0..max_t,
    stopping early once the estimate stops improving (all balls
    saturated). N(0) estimates |V|; N(t)/N(t_max) >= q gives the
    effective diameter (:func:`effective_diameter`).

    Reference corpus note: distance structure is not something the
    reference computes (its KG is per-sentence); this operator exists
    for the 100-TB graph the pipeline BUILDS, where "how many hops
    until the graph closes" decides traversal depth budgets for the
    SPARQL path operators (match_path's max_hops)."""
    if not 1 <= p <= 12:
        raise ValueError(f"p must be in [1, 12], got {p}")
    m = 1 << p
    und = _undirected(edges).transform(_ckpt_nostats)
    verts = (
        und.select(F.col("a").alias("v")).distinct().transform(_ckpt_nostats)
    )
    hs = "cast(conv(substring(md5(cast(v as string)), 1, 15), 16, 10) as bigint)"
    w_bits = 60 - p
    counters = verts.select(
        "v",
        F.expr(f"cast(pmod({hs}, {m}) as int)").alias("ridx"),
        F.expr(
            f"cast(case when shiftrightunsigned({hs}, {p}) = 0"
            f" then {w_bits + 1}"
            f" else {w_bits + 1} - length(bin(shiftrightunsigned({hs}, {p})))"
            f" end as int)"
        ).alias("rho"),
    ).transform(_ckpt_nostats)
    curve = [(0, float(_anf_estimate(counters, m).collect()[0][0]))]
    for t in range(1, max_t + 1):
        nbr = (
            counters.join(und, counters["v"] == und["a"])
            .select(und["b"].alias("v"), "ridx", "rho")
        )
        counters = (
            counters.unionByName(nbr)
            .groupBy("v", "ridx")
            .agg(F.max("rho").alias("rho"))
            .transform(_ckpt_nostats)
        )
        est = float(_anf_estimate(counters, m).collect()[0][0])
        curve.append((t, est))
        if est <= curve[-2][1]:  # saturated: no ball grew
            break
    return curve


def effective_diameter(
    curve: list[tuple[int, float]], q: float = 0.9
) -> int:
    """Smallest t whose neighborhood estimate reaches a fraction ``q``
    of the final one — HyperANF's standard readout (interpolation-free
    integer variant: the value SPARQL depth budgets actually use)."""
    if not curve:
        raise ValueError("empty curve")
    target = q * curve[-1][1]
    for t, est in curve:
        if est >= target:
            return t
    return curve[-1][0]


def describe_entities(edges: DataFrame, seeds: DataFrame) -> DataFrame:
    """SPARQL DESCRIBE (W3C SPARQL 1.1 §16.4) in its symmetric
    CBD-lite reading: every edge INCIDENT to the seed entity set, with
    a ``role`` column saying whether the seed is the edge's subject,
    object, or both — the per-entity export a KG serves when a client
    asks "tell me everything about X".

    Plan shape: two semi-join-shaped probes expressed as one inner
    join per side against the DISTINCT seed dimension (broadcast when
    small, which a DESCRIBE seed set always is), then a full-outer
    merge on the edge key to fuse the subject-side and object-side
    hits without scanning the edge table a third time. Cost is
    O(edges touching seeds) after the broadcast probe — never a
    full-graph materialization."""
    s = seeds.select(F.col("entity_id")).distinct()
    key = ["subj_entity_id", "predicate", "obj_entity_id"]
    base = edges.select(*key).distinct()
    as_subj = base.join(
        F.broadcast(s.withColumnRenamed("entity_id", "subj_entity_id")),
        "subj_entity_id",
    ).withColumn("is_subj", F.lit(True))
    as_obj = base.join(
        F.broadcast(s.withColumnRenamed("entity_id", "obj_entity_id")),
        "obj_entity_id",
    ).withColumn("is_obj", F.lit(True))
    merged = as_subj.join(as_obj, key, "full_outer")
    role = (
        F.when(
            F.coalesce("is_subj", F.lit(False))
            & F.coalesce("is_obj", F.lit(False)),
            F.lit("both"),
        )
        .when(F.coalesce("is_subj", F.lit(False)), F.lit("subject"))
        .otherwise(F.lit("object"))
    )
    return merged.select(*key, role.alias("role"))


def ask_bgp(
    edges: DataFrame,
    patterns: list,
    filters: list | None = None,
) -> bool:
    """SPARQL ASK (§16.3): does at least one solution of the
    basic graph pattern exist? Evaluated as the BGP fold with an
    existence probe — ``isEmpty`` stops at the FIRST produced binding
    (limit-1 semantics), so a satisfiable pattern never materializes
    its full solution set."""
    return not match_bgp(edges, patterns, filters=filters).isEmpty()


def predicate_inverses(
    edges: DataFrame, min_overlap: int = 1
) -> DataFrame:
    """Ontology induction for owl:SymmetricProperty / owl:inverseOf:
    for every predicate pair (a, b), how many (x, y) fact pairs have
    BOTH a(x, y) and b(y, x)? A pair with overlap ~= both supports is
    an inverse pair (or a symmetric predicate when a == b) — the
    schema fact a fusion stage needs before it can canonicalize
    reciprocal claims instead of double-counting them.

    Returns (pred_a, pred_b, n_a, n_b, n_overlap, overlap_ppm) with
    pred_a <= pred_b (unordered pair once; the symmetric case appears
    as pred_a == pred_b with every mutual pair counted once) and
    overlap_ppm = 1e6 * n_overlap / min(n_a, n_b), exact integer.

    Plan shape: ONE self-equi-join of the deduped fact table against
    its (subj, obj)-swapped projection, keyed on the entity pair —
    pair keys are near-unique, so no skew surface; the per-predicate
    support table is schema-sized and broadcast into the final
    projection. Cost is O(matching reciprocal pairs), not
    O(|predicates|^2 x |facts|)."""
    t = edges.select(
        "subj_entity_id", "predicate", "obj_entity_id"
    ).distinct().transform(_ckpt_nostats)
    support = t.groupBy("predicate").agg(
        F.count("*").cast("long").alias("n")
    )
    fwd = t.select(
        F.col("subj_entity_id").alias("x"),
        F.col("obj_entity_id").alias("y"),
        F.col("predicate").alias("pa"),
    )
    rev = t.select(
        F.col("obj_entity_id").alias("x"),
        F.col("subj_entity_id").alias("y"),
        F.col("predicate").alias("pb"),
    )
    pairs = fwd.join(rev, ["x", "y"]).where(F.col("pa") <= F.col("pb"))
    # the symmetric case (pa == pb) sees each mutual {x,y} pair twice
    # (once per direction) unless we half-count: keep x < y there.
    # Self-loops a(x, x) trivially satisfy a(x,x) ^ a(x,x); they carry
    # no reciprocity evidence and are excluded for pa == pb.
    pairs = pairs.where(
        (F.col("pa") != F.col("pb")) | (F.col("x") < F.col("y"))
    )
    ov = pairs.groupBy("pa", "pb").agg(
        F.count("*").cast("long").alias("n_overlap")
    )
    sa = support.select(F.col("predicate").alias("pa"), F.col("n").alias("n_a"))
    sb = support.select(F.col("predicate").alias("pb"), F.col("n").alias("n_b"))
    return (
        ov.where(F.col("n_overlap") >= min_overlap)
        .join(F.broadcast(sa), "pa")
        .join(F.broadcast(sb), "pb")
        .select(
            F.col("pa").alias("pred_a"),
            F.col("pb").alias("pred_b"),
            "n_a",
            "n_b",
            "n_overlap",
            F.expr("(1000000 * n_overlap) div least(n_a, n_b)")
            .cast("long")
            .alias("overlap_ppm"),
        )
    )


def aggregate_bindings(
    edges: DataFrame,
    patterns: list,
    group_by: list,
    aggs: dict,
    having: list | None = None,
    **bgp_kw,
) -> DataFrame:
    """SPARQL aggregates (W3C SPARQL 1.1 §11): GROUP BY over BGP
    solutions with COUNT / SUM / MIN / MAX / AVG / COUNT(DISTINCT ...)
    projections and HAVING constraints — the analytical query form
    (``SELECT ?r (COUNT(?c) AS ?n) WHERE {...} GROUP BY ?r HAVING(...)``)
    every KG endpoint serves.

    ``group_by``: grouping variables (with or without the '?' — it is
    stripped); empty means the spec's single implicit group (§11.1:
    aggregates without GROUP BY see ALL solutions as one group — which
    is also SQL's global-aggregate rule, so an empty solution sequence
    yields one row with COUNT = 0, exactly as SPARQL does).
    ``aggs``: ``{output_alias: sql_aggregate_expr}`` over variable
    names WITHOUT the '?' (e.g. ``{"n_cust": "count(c)",
    "n_nations": "count(distinct n)"}``); expressions are Spark SQL,
    chosen to be the ANSI subset DuckDB parses identically.
    ``having``: boolean SQL expressions over the aliases and grouping
    variables, applied AFTER aggregation (§11.3); extra keywords pass
    through to :func:`match_bgp` (optional / filters / values ...).

    Plan shape: the BGP's join tree is unchanged (filters still fold at
    their earliest point); the aggregation is one hash aggregate with a
    map-side partial, so the only added exchange is keyed by the
    grouping variables — and when solutions are already co-partitioned
    by a grouping variable (e.g. the last BGP join key) AQE elides it.
    HAVING runs post-final-agg, the spec's order; Catalyst cannot and
    must not push it below the aggregate."""
    sol = match_bgp(edges, patterns, **bgp_kw)
    keys = [g.lstrip("?") for g in group_by]
    missing = [k for k in keys if k not in sol.columns]
    if missing:
        raise ValueError(
            f"aggregate_bindings: GROUP BY variables {missing} not bound "
            f"by the pattern group (bound: {sorted(sol.columns)})"
        )
    if not aggs:
        raise ValueError("aggregate_bindings: at least one aggregate "
                         "projection is required")
    out = sol.groupBy(*keys).agg(
        *[F.expr(e).alias(a) for a, e in aggs.items()]
    )
    for h in having or []:
        out = out.where(F.expr(h))
    return out


def filter_exists_bgp(
    edges: DataFrame,
    patterns: list,
    exists: list | dict | None = None,
    not_exists: list | dict | None = None,
    filters: list | None = None,
) -> DataFrame:
    """SPARQL FILTER EXISTS / FILTER NOT EXISTS (W3C SPARQL 1.1 §8.1):
    keep a solution of the required group iff the inner group, with the
    solution's bindings substituted for its shared variables, has at
    least one (EXISTS) / no (NOT EXISTS) solution. Each inner group is
    a pattern list or a dict of :func:`match_bgp` keywords (so inner
    FILTERs are allowed — referencing INNER-bound variables; an inner
    filter over an outer-only variable is the correlated form this
    operator does not support and match_bgp rejects as unbound).

    This is deliberately NOT :func:`minus_bgp`. The two diverge exactly
    where the spec says they do (§8.3.3): when the groups share no
    variable, MINUS removes nothing (incompatible-by-definition), while
    NOT EXISTS still substitutes — trivially — and removes EVERY
    solution if the inner pattern matches anything at all. Both edges
    are pinned side-by-side in tests.

    Plan shape: shared variables make this a hash SEMI/ANTI join on
    those variables — the inner group projects to the shared variables
    only, and semi/anti joins never multiply the probe side, so no
    pre-distinct is needed. With no shared variable the inner group
    reduces to a ``limit(1)`` existence probe broadcast into a
    nested-loop semi/anti join — one row, no shuffle."""
    out = match_bgp(edges, patterns, filters=filters)
    for grp, how in ((exists, "left_semi"), (not_exists, "left_anti")):
        if grp is None:
            continue
        kw = dict(grp) if isinstance(grp, dict) else {"patterns": grp}
        inner = match_bgp(edges, **kw)
        shared = sorted(set(out.columns) & set(inner.columns))
        if shared:
            out = out.join(inner.select(*shared), shared, how)
        else:
            probe = F.broadcast(
                inner.limit(1).select(F.lit(1).alias("_probe"))
            )
            out = out.join(probe, F.lit(True), how)
    return out


def sample_pivots(
    edges: DataFrame, n_pivots: int, salt: str = "bc"
) -> list[int]:
    """Deterministic md5-ranked pivot sample over the vertex set (the
    Brandes-Pich source sample): the ``n_pivots`` vertices with the
    smallest md5(salt|id) — a pure function of ids, so the python twin
    draws the identical set. The collect is pivot-bounded (model-sized),
    not data-sized."""
    und = _undirected(edges)
    verts = und.select(F.col("a").alias("entity_id")).distinct()
    rows = (
        verts.withColumn(
            "h",
            F.md5(F.concat(F.lit(salt + "|"), F.col("entity_id").cast("string"))),
        )
        .orderBy("h", "entity_id")
        .limit(n_pivots)
        .collect()
    )
    return [r.entity_id for r in rows]


def betweenness_centrality(
    edges: DataFrame,
    n_pivots: int = 32,
    max_depth: int = 6,
    salt: str = "bc",
) -> DataFrame:
    """Pivot-sampled betweenness centrality over the undirected entity
    graph: Brandes' dependency accumulation (Brandes 2001, "A Faster
    Algorithm for Betweenness Centrality") run from a deterministic
    md5 sample of ``n_pivots`` sources (Brandes & Pich 2007,
    "Centrality Estimation in Large Networks"), shortest paths
    truncated at ``max_depth`` hops (k-betweenness; exact when
    max_depth >= diameter and n_pivots >= |V|).

    Returns (entity_id, delta_sum, bc_est): delta_sum = the summed
    Brandes dependencies over the pivot set; bc_est = delta_sum *
    |V| / n_pivots, the unbiased estimator of the classic betweenness
    count.

    Scale shape: the forward pass is labeled multi-source BFS widened
    with the path-count column — per level ONE frontier x edges join +
    one (src, v)-keyed group-sum (sigma's parent sum) + one anti-join;
    the backward pass replays the levels in reverse with the same join
    pattern (child contributions group-summed per (src, parent), then
    scaled by the parent's sigma). Rounds = 2 * max_depth, every
    shuffle keyed on (src, vertex); per-level state is the labeled
    frontier itself, localCheckpointed so lineage stays flat. No
    all-pairs stage exists — the pivot count bounds the work exactly
    like harmonic_centrality's seed contract."""
    from ..functions.partitioning import compute_dense_region

    und = _undirected(edges).transform(_ckpt_nostats)
    pivots = sample_pivots(edges, n_pivots, salt=salt)
    spark = edges.sparkSession
    if not pivots:
        return local_df(
            spark, [], "entity_id long, delta_sum double, bc_est double"
        )
    n_verts = (
        und.select(F.col("a").alias("entity_id")).distinct().count()
    )
    lvl0 = local_df(
        spark, [(p, p, 1.0) for p in pivots], "src long, v long, sigma double"
    ).transform(_ckpt_nostats)

    # forward: levels[d] = (src, v, sigma) of vertices FIRST reached at
    # depth d from src, sigma = number of shortest src->v paths.
    # compute_dense_region: the per-level frontier x adjacency joins are
    # byte-tiny but compute-dense — AQE's byte-based coalescing was
    # collapsing them to single tasks (4.3s one-task stages in the
    # round-6 event log)
    levels = [lvl0]
    visited = lvl0.select("src", "v").transform(_ckpt_nostats)
    from ..functions.partitioning import checkpoint_with_metrics

    with compute_dense_region(spark):
        for _d in range(1, max_depth + 1):
            frontier = levels[-1]
            nxt, _m = checkpoint_with_metrics(
                frontier.join(und, frontier["v"] == und["a"])
                .select("src", F.col("b").alias("v"), "sigma")
                .groupBy("src", "v")
                .agg(F.sum("sigma").alias("sigma"))
                .join(visited, ["src", "v"], "left_anti"),
                F.count(F.lit(1)).alias("n"),
            )
            if not _m["n"]:
                break
            levels.append(nxt)
            visited = visited.unionByName(
                nxt.select("src", "v")
            ).transform(_ckpt_nostats)

        # backward: delta over levels in reverse; a parent at depth d
        # gets sigma_parent * sum over depth-d+1 neighbors of
        # (1 + delta_w)/sigma_w
        acc = None
        delta = levels[-1].withColumn("delta", F.lit(0.0))
        for d in range(len(levels) - 2, -1, -1):
            contrib = delta.select(
                "src",
                F.col("v").alias("w"),
                ((F.lit(1.0) + F.col("delta")) / F.col("sigma")).alias(
                    "share"
                ),
            )
            parent = levels[d]
            dsum = (
                contrib.join(und, contrib["w"] == und["b"])
                .select("src", F.col("a").alias("v"), "share")
                .groupBy("src", "v")
                .agg(F.sum("share").alias("share_sum"))
            )
            delta = (
                parent.join(dsum, ["src", "v"], "left")
                .select(
                    "src",
                    "v",
                    "sigma",
                    (
                        F.coalesce(F.col("share_sum"), F.lit(0.0))
                        * F.col("sigma")
                    ).alias("delta"),
                )
                .transform(_ckpt_nostats)
            )
            part = delta.where(F.col("v") != F.col("src")).select(
                "v", "delta"
            )
            acc = part if acc is None else acc.unionByName(part)
            # depth-(d+1) vertices contribute their own delta too
    # every non-root level's deltas enter the total; the loop above
    # accumulates levels 0..D-1 as PARENTS — add the deepest level
    # (delta 0 there, so only the parents' rows matter; roots excluded)
    if acc is None:
        acc = local_df(spark, [], "v long, delta double")
    out = acc.groupBy(F.col("v").alias("entity_id")).agg(
        F.sum("delta").alias("delta_sum")
    )
    scale = float(n_verts) / float(len(pivots))
    return out.select(
        "entity_id",
        "delta_sum",
        (F.col("delta_sum") * F.lit(scale)).alias("bc_est"),
    )


def betweenness_python(
    edge_list: list[tuple[int, int]],
    n_pivots: int = 32,
    max_depth: int = 6,
    salt: str = "bc",
) -> dict[int, float]:
    """Exact flat twin of :func:`betweenness_centrality` (same md5
    pivot draw, same depth truncation, same dependency recursion) —
    plain Brandes with a depth cap. Returns entity_id -> delta_sum."""
    import hashlib
    from collections import deque

    adj: dict[int, set[int]] = {}
    for a, b in edge_list:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    verts = sorted(adj)
    ranked = sorted(
        verts,
        key=lambda x: (
            hashlib.md5(f"{salt}|{x}".encode()).hexdigest(),
            x,
        ),
    )
    pivots = ranked[:n_pivots]
    delta_sum: dict[int, float] = {}
    for s in pivots:
        dist = {s: 0}
        sigma = {s: 1.0}
        order = [s]
        q = deque([s])
        while q:
            v = q.popleft()
            if dist[v] >= max_depth:
                continue
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    sigma[w] = 0.0
                    order.append(w)
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
        delta = {v: 0.0 for v in order}
        for w in reversed(order):
            for v in adj[w]:
                if v in dist and dist[v] == dist[w] - 1:
                    delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
            if w != s:
                delta_sum[w] = delta_sum.get(w, 0.0) + delta[w]
    return delta_sum


def link_scores(
    edges: DataFrame,
    min_common: int = 2,
    max_hub_degree: int = 10_000,
) -> DataFrame:
    """Graph-heuristic link prediction over the undirected entity
    graph: for every non-adjacent two-hop pair, the three classic
    common-neighbor scores in exact integer form —

    * ``cn``: common-neighbor count (Newman 2001),
    * ``jaccard_ppm``: 1e6 * |N(a) ∩ N(b)| DIV |N(a) ∪ N(b)|,
    * ``ra_ppm``: resource allocation, sum over common neighbors z of
      1e6 DIV deg(z) (Zhou, Lü & Zhang 2009 — Adamic-Adar with 1/deg
      in place of 1/log deg, which keeps the statistic integer-exact
      cross-engine; same ppm-div trick as harmonic_centrality).

    The structural complement to the KGE ranking stack (kge.py): no
    training, pure topology, and the standard strong baseline.

    ``min_common`` bounds the output (pairs with fewer shared
    neighbors are noise); ``max_hub_degree`` drops super-hubs from the
    WITNESS role z — a hub's RA share is ~0 and its two-hop fan-out is
    the quadratic that kills naive CN at scale (standard practice; the
    oracle applies the identical cap).

    Plan: degree table (one groupBy) joined onto the witness column,
    one adjacency self-join keyed on the witness z (each z contributes
    deg(z)^2 pairs — capped by max_hub_degree), one anti-join against
    existing edges, one (a, b) hash aggregate. No all-pairs stage."""
    und = _undirected(edges).transform(_ckpt_nostats)
    deg = und.groupBy("a").agg(F.count("*").cast("long").alias("deg"))
    wit = (
        und.join(deg.select(F.col("a").alias("b"), "deg"), "b")
        .where(F.col("deg") <= max_hub_degree)
        .select(F.col("a"), F.col("b").alias("z"), F.col("deg").alias("deg_z"))
    )
    pairs = (
        wit.select(F.col("a"), "z", "deg_z")
        .join(
            wit.select(F.col("a").alias("c"), F.col("z")),
            "z",
        )
        .where(F.col("a") < F.col("c"))
        .join(
            und.select(
                F.col("a"), F.col("b").alias("c")
            ),
            ["a", "c"],
            "left_anti",
        )
        .groupBy("a", "c")
        .agg(
            F.count("*").cast("long").alias("cn"),
            F.sum(F.expr("1000000 div deg_z")).cast("long").alias("ra_ppm"),
        )
        .where(F.col("cn") >= min_common)
    )
    da = deg.select(F.col("a"), F.col("deg").alias("deg_a"))
    dc = deg.select(F.col("a").alias("c"), F.col("deg").alias("deg_c"))
    return (
        pairs.join(da, "a")
        .join(dc, "c")
        .select(
            F.col("a").alias("entity_a"),
            F.col("c").alias("entity_b"),
            "cn",
            F.expr(
                "cast(cn * 1000000 div (deg_a + deg_c - cn) as bigint)"
            ).alias("jaccard_ppm"),
            "ra_ppm",
        )
    )


def pra_path_features(
    edges: DataFrame,
    candidates: DataFrame,
    max_step_fanout: int = 10_000,
) -> DataFrame:
    """PRA random-walk path features (Lao & Cohen 2010, "Relational
    retrieval using a combination of path-constrained random walks"):
    for every candidate entity pair, the probability that a random walk
    from src following a FIXED predicate sequence (length 1 or 2) ends
    at dst — the feature map Path-Ranking link predictors train on, and
    the typed complement to link_scores' untyped topology statistics.

    ``edges``: (subj_entity_id, predicate, obj_entity_id);
    ``candidates``: (src, dst) pairs (the training/inference examples —
    PRA is always candidate-conditioned, never all-pairs). Returns
    (src, dst, path, prob_ppm) with path = 'p' or 'p1/p2' and prob the
    walk probability in truncating integer ppm: each step's weight is
    1e6 DIV outdeg(node, pred) (uniform over that predicate's
    out-edges), a 2-step path sums w1*w2 over mid nodes then divides by
    1e6 — order-insensitive BIGINT math, bit-exact cross-engine.

    ``max_step_fanout`` drops (node, predicate) steps with more
    out-edges than the cap from the walk: a super-hub step carries
    ~zero per-target probability but quadratic join fan-out — the same
    hub discipline as link_scores/two_hop (standard in PRA
    implementations; the oracle applies the identical cap).

    Plan shape (100 TB graph, millions of candidates): one (node, pred)
    groupBy for out-degrees joined back onto edges (AQE broadcasts the
    degree side per partition stats); length-1 is one equi-join of the
    weighted edges with the candidate set; length-2 fans out FROM the
    candidate srcs only (candidates join edges on src, then on
    (mid, dst)) — the corpus-sized edge table is never self-joined
    unconditioned. Final aggregate keys on (src, dst, path)."""
    deg = edges.groupBy("subj_entity_id", "predicate").agg(
        F.count("*").cast("long").alias("n_out")
    )
    w = (
        edges.join(deg, ["subj_entity_id", "predicate"])
        .where(F.col("n_out") <= max_step_fanout)
        .select(
            F.col("subj_entity_id").alias("src"),
            F.col("predicate").alias("pred"),
            F.col("obj_entity_id").alias("dst"),
            F.expr("1000000L div n_out").alias("w_ppm"),
        )
    )
    cand = candidates.select("src", "dst")
    l1 = w.join(cand, ["src", "dst"]).select(
        "src",
        "dst",
        F.col("pred").alias("path"),
        F.col("w_ppm").alias("prob_ppm"),
    )
    s1 = cand.join(
        w.select(
            "src",
            F.col("pred").alias("p1"),
            F.col("dst").alias("mid"),
            F.col("w_ppm").alias("w1"),
        ),
        "src",
    )
    s2 = s1.join(
        w.select(
            F.col("src").alias("mid"),
            F.col("pred").alias("p2"),
            "dst",
            F.col("w_ppm").alias("w2"),
        ),
        ["mid", "dst"],
    )
    l2 = (
        s2.groupBy(
            "src", "dst", F.concat_ws("/", "p1", "p2").alias("path")
        )
        .agg(
            F.expr("cast(sum(w1 * w2) div 1000000L as bigint)").alias(
                "prob_ppm"
            )
        )
    )
    return l1.unionByName(l2)


def _edge_support(und: DataFrame) -> DataFrame:
    """Per-edge triangle support over a canonical (u < v) distinct edge
    set, via the same degree-ordered orientation as triangle_count (wedge
    fan-out bounded by ~sqrt(|E|) per vertex on power-law graphs).
    Returns (u, v, support) for edges in at least one triangle."""
    deg = (
        und.select(F.col("u").alias("x"))
        .union(und.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count("*").alias("d"))
    )
    du = deg.select(F.col("x").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("x").alias("v"), F.col("d").alias("dv"))
    oriented = (
        und.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("s"), F.col("v").alias("t")),
            )
            .otherwise(F.struct(F.col("v").alias("s"), F.col("u").alias("t")))
            .alias("e")
        )
        .select("e.s", "e.t")
    )
    w1 = oriented.select(F.col("s"), F.col("t").alias("t1"))
    w2 = oriented.select(F.col("s"), F.col("t").alias("t2"))
    wedges = w1.join(w2, "s").where(F.col("t1") < F.col("t2"))
    closing = und.select(F.col("u").alias("t1"), F.col("v").alias("t2"))
    tri = wedges.join(closing, ["t1", "t2"])  # (s, t1, t2) closed wedges
    tri_edges = tri.select(
        F.explode(
            F.array(
                F.struct(
                    F.least("s", "t1").alias("u"),
                    F.greatest("s", "t1").alias("v"),
                ),
                F.struct(
                    F.least("s", "t2").alias("u"),
                    F.greatest("s", "t2").alias("v"),
                ),
                F.struct(F.col("t1").alias("u"), F.col("t2").alias("v")),
            )
        ).alias("e")
    ).select("e.u", "e.v")
    return tri_edges.groupBy("u", "v").agg(
        F.count("*").cast("long").alias("support")
    )


def k_truss(edges: DataFrame, k: int, max_rounds: int = 100) -> DataFrame:
    """The k-truss of the undirected entity graph: the maximal subgraph
    where every edge sits in >= k-2 triangles OF THE SUBGRAPH (Cohen
    2008, "Trusses: cohesive subgraphs for social network analysis") —
    a strictly stronger cohesion filter than k-core (every k-truss is a
    (k-1)-core) and the standard way to keep only densely-corroborated
    relation clusters in a noisy extracted KG: an edge attested by many
    mutual neighbors survives, a spurious bridge does not.

    Iterative peeling to fixpoint: per round, per-edge triangle support
    via degree-ordered wedge counting (_edge_support), drop edges under
    k-2, repeat — removal can kill neighbors' triangles, hence the
    loop. Returns (u, v, support) — surviving canonical edges with
    their support INSIDE the truss.

    Scale shape per round: the wedge join is the triangle-count plan
    (fan-out ~|E|^1.5 worst case, sqrt-degree-bounded per vertex), the
    support aggregation map-side combines on edge keys, and the filter
    is a one-column comparison; lineage cut per round. Round count is
    bounded by the truss peeling depth (small on real graphs);
    max_rounds guards adversarial chains."""
    if k < 3:
        raise ValueError(f"k must be >= 3, got {k}")
    und = (
        edges.select(
            F.least("subj_entity_id", "obj_entity_id").alias("u"),
            F.greatest("subj_entity_id", "obj_entity_id").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .transform(_ckpt_nostats)
    )
    prev = und.count()
    for _ in range(max_rounds):
        sup = _edge_support(und)
        kept, _km = _ckpt_metrics(
            sup.where(F.col("support") >= k - 2),
            F.count(F.lit(1)).alias("n"),
        )
        n = int(_km["n"] or 0)
        if n == 0:
            return kept
        if n == prev:
            return kept
        prev = n
        und = kept.select("u", "v").transform(_ckpt_nostats)
    return kept


def k_truss_python(edge_list: list[tuple[int, int]], k: int) -> dict:
    """Flat twin of k_truss: identical peeling over adjacency sets.
    Returns {(u, v): support} with u < v, support inside the truss."""
    adj: dict[int, set] = {}
    for a, b in edge_list:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    while True:
        sup = {}
        for u, ns in adj.items():
            for v in ns:
                if u < v:
                    sup[(u, v)] = len(ns & adj[v])
        doomed = [e for e, s in sup.items() if s < k - 2]
        if not doomed:
            return sup
        for u, v in doomed:
            adj[u].discard(v)
            adj[v].discard(u)


def induce_entity_types(
    edges: DataFrame,
    known_types: DataFrame,
    min_slot_votes: int = 1,
) -> DataFrame:
    """Type induction for UNTYPED entities from predicate usage
    (SDType's core idea — Paulheim & Bizer ISWC 2013: each (predicate,
    slot) an entity occupies votes for the type that slot statistically
    carries; reduced here to the modal-type vote so every number is an
    exact integer and the twin is bit-stable). The KG-construction gap
    this fills: extraction emits mentions, typed gazetteers cover the
    head entities, and the long tail arrives UNTYPED — but a node that
    keeps appearing as the subject of `employs` is an organization
    whether or not the gazetteer knows it.

    ``edges``: (subj_entity_id, predicate, obj_entity_id).
    ``known_types``: (entity_id, type). Returns, for entities with at
    least one typed-slot occurrence and NO known type:

      (entity_id, induced_type, n_votes, n_slot_occurrences,
       confidence_ppm)

    where each OCCURRENCE of the entity in a (predicate, slot) whose
    modal known type is T contributes one vote for T; induced_type =
    argmax votes (ties: lexicographically smallest type);
    confidence_ppm = n_votes * 1e6 div n_slot_occurrences.

    Scale shape: the (predicate, slot) -> modal-type profile aggregates
    over KNOWN entities only and is schema-sized — it broadcasts back
    onto the corpus-sized occurrence table; votes aggregate per
    (entity, type) with map-side combine; the argmax is a window over
    per-entity type counts (bounded by the type vocabulary), and the
    known-type exclusion is one broadcast-able anti-join."""
    occ = edges.select(
        F.col("subj_entity_id").alias("entity_id"),
        "predicate",
        F.lit("subj").alias("slot"),
    ).unionByName(
        edges.select(
            F.col("obj_entity_id").alias("entity_id"),
            "predicate",
            F.lit("obj").alias("slot"),
        )
    )
    from pyspark.sql import Window

    # occ and kt each feed two consumers (profile join + anti-join);
    # without a lineage cut Catalyst clones the whole upstream subtree
    # per consumer — measured 216 parquet scans on the hierarchy-KG
    # driver query. Lazy localCheckpoint materializes each once.
    occ = occ.localCheckpoint(eager=False)
    kt = known_types.select(
        F.col("entity_id").cast("long").alias("entity_id"),
        F.col("type").cast("string").alias("type"),
    ).localCheckpoint(eager=False)
    slot_types = (
        occ.join(kt, "entity_id")
        .groupBy("predicate", "slot", "type")
        .agg(F.count("*").cast("long").alias("n"))
    )
    w_slot = Window.partitionBy("predicate", "slot").orderBy(
        F.desc("n"), F.asc("type")
    )
    modal = (
        slot_types.withColumn("rk", F.row_number().over(w_slot))
        .where((F.col("rk") == 1) & (F.col("n") >= int(min_slot_votes)))
        .select("predicate", "slot", F.col("type").alias("slot_type"))
    )
    untyped = occ.join(kt.select("entity_id"), "entity_id", "left_anti")
    voted = untyped.join(F.broadcast(modal), ["predicate", "slot"], "left")
    totals = voted.groupBy("entity_id").agg(
        F.count("*").cast("long").alias("n_slot_occurrences")
    )
    votes = (
        voted.where(F.col("slot_type").isNotNull())
        .groupBy("entity_id", "slot_type")
        .agg(F.count("*").cast("long").alias("n_votes"))
    )
    w_ent = Window.partitionBy("entity_id").orderBy(
        F.desc("n_votes"), F.asc("slot_type")
    )
    best = (
        votes.withColumn("rk", F.row_number().over(w_ent))
        .where(F.col("rk") == 1)
        .select(
            "entity_id",
            F.col("slot_type").alias("induced_type"),
            "n_votes",
        )
    )
    return best.join(totals, "entity_id").select(
        "entity_id",
        "induced_type",
        "n_votes",
        "n_slot_occurrences",
        F.expr("n_votes * 1000000L div n_slot_occurrences").alias(
            "confidence_ppm"
        ),
    )


def modularity_report(
    edges: DataFrame, communities: DataFrame
) -> DataFrame:
    """Newman modularity of a given community partition, decomposed per
    community in EXACT integers (Newman & Girvan 2004): for the
    undirected distinct entity graph with m edges, community c
    contributes Q_c = e_c/m - (d_c/2m)^2, so

        q_num_c = 4*m*e_c - d_c^2   and   Q = sum(q_num_c) / (4*m^2).

    This returns the integer decomposition — (community_id, n_nodes,
    intra_edges, degree_sum, q_num, q_ppm, m_edges) — so the whole
    table is bit-stable cross-engine. `q_num` is decimal(38,0) because
    4*m*e_c reaches ~4e26 at the 1e12-edge north-rule scale, past
    BIGINT; `q_ppm` = floor(1e6 * Q_c) is the BIGINT-safe normalized
    form (bounded in [-1e6, 1e6] at ANY scale). The floor of the
    possibly-negative quotient is computed by shifting the numerator by
    +4m^2 (one full denominator times 1e6) before the truncating
    integer division and subtracting 1e6 after — truncation equals
    floor on the now-nonnegative numerator, identically in Spark `div`
    and DuckDB `//`, so no engine-specific negative-division semantics
    are in play.

    Conventions match triangle_count/label_propagation_communities:
    self-loops dropped, parallel and reverse duplicates collapsed. The
    `communities` table (entity_id, community_id) is authoritative for
    membership: edges touching an unmapped endpoint are dropped BEFORE
    m is computed (the metric is over the induced subgraph on mapped
    nodes), and mapped nodes with no surviving edge still get counted
    in their community's n_nodes with degree 0.

    Plan: two community-map joins on the edge endpoints (AQE skew-split
    covers hub entities), one node-degree aggregation, two
    community-sized aggregations, and one broadcast one-row m join —
    no data-sized windows, no self-joins."""
    cmap = communities.select("entity_id", "community_id")
    und = (
        edges.select(
            F.least("subj_entity_id", "obj_entity_id").alias("u"),
            F.greatest("subj_entity_id", "obj_entity_id").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    cu = cmap.select(
        F.col("entity_id").alias("u"), F.col("community_id").alias("cu")
    )
    cv = cmap.select(
        F.col("entity_id").alias("v"), F.col("community_id").alias("cv")
    )
    e2 = und.join(cu, "u").join(cv, "v")
    m_row = e2.agg(F.count("*").cast("long").alias("m_edges"))
    deg = (
        e2.select(F.col("u").alias("x"))
        .union(e2.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count("*").cast("long").alias("d"))
    )
    comm_stats = (
        cmap.join(deg, cmap["entity_id"] == deg["x"], "left")
        .groupBy("community_id")
        .agg(
            F.count("*").cast("long").alias("n_nodes"),
            F.coalesce(F.sum("d"), F.lit(0)).cast("long").alias(
                "degree_sum"
            ),
        )
    )
    intra = (
        e2.where(F.col("cu") == F.col("cv"))
        .groupBy(F.col("cu").alias("community_id"))
        .agg(F.count("*").cast("long").alias("intra_edges"))
    )
    dec = "cast(m_edges as decimal(38,0))"
    q_num = (
        f"cast(4 * {dec} * intra_edges"
        " - cast(degree_sum as decimal(38,0)) * degree_sum"
        " as decimal(38,0))"
    )
    # floor((1e6*q_num)/(4m^2)) via the nonnegative shift (docstring);
    # m = 0 (empty induced graph) is defined as q_ppm = 0
    q_ppm = (
        "cast(IF(m_edges = 0, 0,"
        f" (1000000 * ({q_num} + 4 * {dec} * {dec}))"
        f"   div (4 * {dec} * {dec}) - 1000000) as bigint)"
    )
    return (
        comm_stats.join(intra, "community_id", "left")
        .na.fill({"intra_edges": 0})
        .join(F.broadcast(m_row))
        .select(
            "community_id",
            "n_nodes",
            "intra_edges",
            "degree_sum",
            F.expr(q_num).alias("q_num"),
            F.expr(q_ppm).alias("q_ppm"),
            "m_edges",
        )
    )


def louvain_local_move(
    edges: DataFrame, rounds: int = 5
) -> DataFrame:
    """One level of Louvain community detection (Blondel et al. 2008),
    run as DETERMINISTIC synchronous modularity-gain local moving — the
    quality-driven counterpart to label_propagation_communities (LPA
    follows neighbor majorities; this follows exact ΔQ). Every vertex
    starts in its own community; each round every vertex considers the
    communities of its neighbors (plus staying put) and adopts the one
    with the highest modularity gain, ties broken by the SMALLEST
    community id, moving only on a STRICT improvement over staying.

    Naive all-move synchronous updates are not just oscillation-prone —
    measured on the bipartite schema edge graph they DEGRADE modularity
    monotonically (every vertex moves assuming the others stay, so
    symmetric pairs swap and crowds over-merge; Q fell from the
    singleton baseline every round). The standard parallel-Louvain
    remedy (Grappolo's coloring heuristic, in its cheapest form) is
    applied: each round only HALF the vertices are movers —
    xxhash64(id) parity must match the round parity — so no two
    adjacent movers of the same color class invalidate each other's
    gain estimate in the common case. Deterministic, partitioning-
    invariant, twin-replicable; a fixed even ``rounds`` budget gives
    every vertex rounds/2 move opportunities (Louvain's sequential
    sweep is inherently order-dependent — a deterministic parallel
    schedule is the scalable substitute).

    Gains are compared in EXACT integers: moving v into D scores
    gain(D) = 2m*k_vD - k_v * Σtot(D∖v), the standard ΔQ * 2m^2 with
    v-independent terms dropped (decimal(38,0) — the 2m*k product
    passes BIGINT at 1e12 edges). Pinned against an identical-recursion
    python twin in tests/test_louvain.py; community quality is read
    with modularity_report.

    Scale shape per round: one edges×labels join keyed on the neighbor
    vertex (the hub-skew point — AQE skew split, same as LPA), one
    (v, community) count, one community-sized degree-total aggregate
    joined back on the candidate community, one max_by per vertex.
    Lineage broken per round (checkpoint_nostats)."""
    und = (
        edges.select(
            F.least("subj_entity_id", "obj_entity_id").alias("u"),
            F.greatest("subj_entity_id", "obj_entity_id").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    both = und.union(
        und.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).transform(_ckpt_nostats)
    # every vertex of the edge table gets a row (self-loop-only vertices
    # included, own community) — same coverage convention as LPA; their
    # degree is 0 in the simple graph, so deg must LEFT-join onto the
    # vertex set or the round's inner joins would silently drop them
    verts = (
        edges.select(F.col("subj_entity_id").alias("id"))
        .union(edges.select(F.col("obj_entity_id").alias("id")))
        .distinct()
    )
    deg = verts.join(
        both.groupBy(F.col("u").alias("id")).agg(
            F.count("*").cast("long").alias("k")
        ),
        "id",
        "left",
    ).na.fill({"k": 0})
    m_edges = und.count()
    if m_edges == 0:
        return verts.select(
            F.col("id").alias("entity_id"),
            F.col("id").alias("community_id"),
        )
    # labels carry the vertex degree k through every round (round-6):
    # Σtot becomes a plain aggregate (no labels⋈deg join) and the
    # scoring join fetches (own_d, k) with ONE labels join instead of
    # separate deg and cur joins — 3 exchanges per round removed, with
    # bit-identical gain arithmetic.
    labels = deg.select(
        "id", F.col("id").alias("community_id"), "k"
    ).transform(_ckpt_nostats)
    for r in range(rounds):
        lab = labels.select(
            F.col("id").alias("v"), F.col("community_id").alias("nbr_comm")
        )
        # k_vD: edges from v into each neighbor community D
        kvd = (
            both.join(lab, "v")
            .groupBy(F.col("u").alias("id"), F.col("nbr_comm").alias("d"))
            .agg(F.count("*").cast("long").alias("k_vd"))
        )
        # staying is always a candidate, even with no neighbors in C.
        # No (id, d) re-aggregate: the duplicate own-community row (when
        # v has neighbors in its own community) scores a gain <= the
        # true k_vd row's, and both the best_d argmax and the stay-gain
        # max are unchanged by dominated duplicates (round-6: one
        # exchange per round removed; pinned identical by test_louvain).
        own = labels.select(
            "id", F.col("community_id").alias("d"),
            F.lit(0).cast("long").alias("k_vd"),
        )
        cand = kvd.unionByName(own)
        # Σtot(D): degree mass per community under the CURRENT labels
        tot = labels.groupBy(F.col("community_id").alias("d")).agg(
            F.sum("k").cast("long").alias("tot_d")
        )
        scored = (
            cand.join(tot, "d")
            .join(
                labels.select(
                    "id", F.col("community_id").alias("own_d"), "k"
                ),
                "id",
            )
            .withColumn("m", F.lit(m_edges).cast("long"))
            .select(
                "id",
                "d",
                "own_d",
                "k",
                F.expr(
                    "cast(2 * cast(m as decimal(38,0)) * k_vd"
                    " - cast(k as decimal(38,0))"
                    "   * (tot_d - IF(d = own_d, k, 0))"
                    " as decimal(38,0))"
                ).alias("gain"),
            )
        )
        # best candidate vs the stay gain: move only movers (hash-parity
        # color class of this round) with a STRICT improvement
        best = scored.groupBy("id").agg(
            F.expr("max_by(d, struct(gain, -d))").alias("best_d"),
            F.max("gain").alias("best_gain"),
            # the max over own-community rows IS the stay gain: gain is
            # monotone in k_vd and the duplicate own row carries k_vd=0
            F.max(F.when(F.col("d") == F.col("own_d"), F.col("gain"))).alias(
                "stay_gain"
            ),
            F.min("own_d").alias("own_d"),
            F.min("k").alias("k"),
        )
        # mover color from md5 (the twin-replicable cross-engine hash —
        # raw-id parity would correlate with id-construction schemes
        # like the *4+role entity encoding)
        mover = (
            F.expr(
                "cast(conv(substring(md5(cast(id as string)), 1, 7),"
                " 16, 10) as bigint) % 2"
            )
            == F.lit(r % 2)
        )
        labels = best.select(
            "id",
            F.when(
                mover & (F.col("best_gain") > F.col("stay_gain")),
                F.col("best_d"),
            )
            .otherwise(F.col("own_d"))
            .alias("community_id"),
            "k",
        ).transform(_ckpt_nostats)
    return labels.select(F.col("id").alias("entity_id"), "community_id")


def sample_neighborhoods(
    edges: DataFrame,
    seeds: DataFrame,
    fanouts: tuple = (3, 2),
    salt: str = "s",
) -> DataFrame:
    """GraphSAGE-style hop-sampled neighborhoods (Hamilton et al. 2017):
    for each seed entity, sample at most ``fanouts[h-1]`` neighbors per
    frontier vertex at hop h, WITHOUT replacement, over the undirected
    distinct entity graph — the bounded subgraph extraction every
    GNN-on-KG training pipeline runs as data prep (output size is
    |seeds| * prod(fanouts), never graph-sized).

    Sampling is md5-DETERMINISTIC, not RNG-driven (the random_walks
    convention): at hop h, vertex v's neighbors under seed s are ranked
    by md5(seed|hop|v|neighbor|salt) and the top-k kept — reproducible
    across engines, runs, and partitionings, and SQL-expressible, so
    the DuckDB oracle replays the identical sample. Each (seed,
    frontier-vertex) pair draws independently (the per-seed
    independence GraphSAGE assumes); re-visited vertices at later hops
    resample under the new hop tag.

    Returns (seed_id, hop, src, dst): the sampled message-passing edges
    per seed, hop 1 rooted at the seed itself. Per hop: one
    frontier-adjacency equi-join (hub skew bounded by true degree; AQE
    skew-split applies) and one (seed, src)-keyed window rank. Seeds
    absent from the graph contribute nothing (no neighbors to sample).
    """
    if not fanouts or any(f < 1 for f in fanouts):
        raise ValueError(f"sample_neighborhoods: bad fanouts {fanouts!r}")
    und = (
        edges.select(
            F.least("subj_entity_id", "obj_entity_id").alias("u"),
            F.greatest("subj_entity_id", "obj_entity_id").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    adj = und.union(
        und.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).transform(_ckpt_nostats)
    frontier = seeds.select(
        F.col("seed_id"), F.col("seed_id").alias("src")
    ).distinct()
    out = None
    for h, fan in enumerate(fanouts, start=1):
        ranked = (
            frontier.join(adj, frontier["src"] == adj["u"])
            .select("seed_id", "src", F.col("v").alias("dst"))
            .withColumn(
                "rk",
                F.row_number().over(
                    Window.partitionBy("seed_id", "src").orderBy(
                        F.expr(
                            "cast(conv(substring(md5(concat_ws('|',"
                            f" seed_id, {h}, src, dst, '{salt}')), 1, 7),"
                            " 16, 10) as bigint)"
                        ),
                        # md5-prefix collisions are possible; a total
                        # order needs the id tiebreak
                        F.col("dst"),
                    )
                ),
            )
            .where(F.col("rk") <= fan)
            .select("seed_id", F.lit(h).cast("int").alias("hop"),
                    "src", "dst")
        )
        ranked = ranked.transform(_ckpt_nostats)
        out = ranked if out is None else out.unionByName(ranked)
        frontier = ranked.select("seed_id", F.col("dst").alias("src")).distinct()
    return out


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """Degree assortativity decomposition (Newman 2002, "Assortative
    mixing in networks") over the undirected distinct entity graph —
    POSITIVE when hubs attach to hubs (social-network shape), NEGATIVE
    when hubs attach to leaves (the star/bipartite shape most KGs
    have); the one-number structural fingerprint that tells a pipeline
    whether hub-salting pressure concentrates on few reducers.

    Pearson correlation of endpoint degrees over edges reduces to four
    integer sums — with j, k the endpoint degrees of each undirected
    edge and m the edge count:

        s_jk = sum(j*k),  s_sum = sum(j + k),  s_sq = sum(j^2 + k^2)
        r = (4*m*s_jk - s_sum^2) / (2*m*s_sq - s_sum^2)

    Returns ONE row of the EXACT integer components (m_edges, s_jk,
    s_sum, s_sq as decimal(38,0) — degree products reach ~1e26 at
    1e12-edge scale) plus r_ppm, the BIGINT-safe floor(1e6 * r)
    computed with the same nonnegative-shift trick as
    modularity_report (numerator and denominator can both be negative;
    the denominator is >= 0 by Cauchy-Schwarz, zero only for
    degree-regular graphs, where r_ppm is defined as 0). Plan: one
    degree aggregation, two endpoint joins, one one-row total — no
    windows, nothing quadratic. The driver oracle replays it
    bit-exactly in HUGEINT."""
    und = (
        edges.select(
            F.least("subj_entity_id", "obj_entity_id").alias("u"),
            F.greatest("subj_entity_id", "obj_entity_id").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("x"))
        .union(und.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count("*").cast("long").alias("d"))
    )
    du = deg.select(F.col("x").alias("u"), F.col("d").alias("j"))
    dv = deg.select(F.col("x").alias("v"), F.col("d").alias("k"))
    per_edge = und.join(du, "u").join(dv, "v")
    dec = "decimal(38,0)"
    totals = per_edge.agg(
        F.count("*").cast("long").alias("m_edges"),
        F.sum(
            F.expr(f"cast(j as {dec}) * k")
        ).cast(dec).alias("s_jk"),
        F.sum(F.expr(f"cast(j as {dec}) + k")).cast(dec).alias("s_sum"),
        F.sum(
            F.expr(f"cast(j as {dec}) * j + cast(k as {dec}) * k")
        ).cast(dec).alias("s_sq"),
    )
    num = f"(4 * cast(m_edges as {dec}) * s_jk - s_sum * s_sum)"
    den = f"(2 * cast(m_edges as {dec}) * s_sq - s_sum * s_sum)"
    # floor(1e6 * num/den) for possibly-negative num, den > 0: shift the
    # numerator by +den * 2e6 (a bound: |r| <= 1 so |1e6*num| <= 1e6*den
    # < 2e6*den), truncating-divide the nonnegative value, subtract back
    r_ppm = (
        "cast(CASE WHEN m_edges = 0 THEN 0"
        f" WHEN {den} = 0 THEN 0"
        f" ELSE (1000000 * {num} + 2000000 * {den}) div {den} - 2000000"
        " END as bigint)"
    )
    return totals.select(
        "m_edges",
        "s_jk",
        "s_sum",
        "s_sq",
        F.expr(r_ppm).alias("r_ppm"),
    )


def global_clustering(edges: DataFrame) -> DataFrame:
    """Global clustering coefficient / transitivity (Newman 2003,
    eq. 3.3): C = 3 * triangles / wedges over the undirected distinct
    entity graph, with wedges = sum d*(d-1)/2 — how much of the
    graph's two-hop neighborhood closes, the one-number companion to
    the per-vertex kg_local_clustering report. Triangle counting
    reuses :func:`triangle_count`'s degree-ordered orientation (wedge
    fan-out ~sqrt(|E|) per vertex on power-law graphs).

    Returns ONE row (n_triangles, n_wedges, transitivity_ppm):
    n_wedges is decimal(38,0) (a 1e10-degree hub alone contributes
    5e19 wedges — past BIGINT), transitivity_ppm the BIGINT-safe
    truncating 3 * tri * 1e6 div wedges (wedges = 0, a triangle-free
    matching, is defined as 0). The driver oracle replays the brute
    3-join triangle count and the wedge sum in HUGEINT, bit-exact."""
    und = (
        edges.select(
            F.least("subj_entity_id", "obj_entity_id").alias("u"),
            F.greatest("subj_entity_id", "obj_entity_id").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("x"))
        .union(und.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count("*").cast("long").alias("d"))
    )
    # d*(d-1) is always even: integer `div` keeps the whole pipeline in
    # exact integers (no decimal-scale semantics in play)
    wedges = deg.agg(
        F.coalesce(
            F.sum(
                F.expr("cast(d as decimal(38,0)) * (d - 1) div 2")
            ),
            F.lit(0).cast("decimal(38,0)"),
        ).cast("decimal(38,0)").alias("n_wedges")
    )
    tri = triangle_count(edges)
    return tri.crossJoin(F.broadcast(wedges)).select(
        "n_triangles",
        "n_wedges",
        F.expr(
            "cast(CASE WHEN n_wedges = 0 THEN 0 ELSE"
            " (3000000 * cast(n_triangles as decimal(38,0)))"
            " div n_wedges END as bigint)"
        ).alias("transitivity_ppm"),
    )


def reciprocity(edges: DataFrame) -> DataFrame:
    """Edge reciprocity of the DIRECTED distinct entity graph: the
    fraction of (u, v) edges whose reverse (v, u) also holds —
    near-zero on hierarchical/containment predicates, high where a
    symmetric predicate leaks through as two directed assertions (the
    signal behind predicate_inverses' owl:SymmetricProperty induction,
    here as one corpus-level number). Self-loops excluded.

    ONE self-semi-join on the reversed key plus two one-row counts;
    returns (n_directed_edges, n_reciprocal, reciprocity_ppm) in exact
    truncating integers — bit-exact DuckDB twin."""
    e = (
        edges.select(
            F.col("subj_entity_id").alias("u"),
            F.col("obj_entity_id").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    rev = e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    recip = e.join(rev, ["u", "v"], "left_semi")
    totals = e.agg(F.count("*").cast("long").alias("n_directed_edges"))
    n_rec = recip.agg(F.count("*").cast("long").alias("n_reciprocal"))
    return totals.crossJoin(F.broadcast(n_rec)).select(
        "n_directed_edges",
        "n_reciprocal",
        F.expr(
            "cast(CASE WHEN n_directed_edges = 0 THEN 0 ELSE"
            " n_reciprocal * 1000000 div n_directed_edges END as bigint)"
        ).alias("reciprocity_ppm"),
    )


def _min_label_fixpoint(
    verts: DataFrame, edges: DataFrame, src: str, dst: str, max_prop: int
) -> DataFrame:
    """Propagate the MIN vertex id along ``src -> dst`` edges to
    fixpoint: returns (v, label) with label = min id over {v} and every
    vertex that can reach v through edges in that direction.

    Convergence is detected with one SCALAR per iteration: labels only
    ever decrease, so the decimal(38,0) label sum is strictly monotone
    until the fixpoint — no row-level diff join. decimal(38,0) because a
    BIGINT sum overflows once ids are xxhash64 values (|id| ~ 9.2e18
    times millions of vertices; 38 digits holds 9.2e18 * 1e12)."""
    from ..functions.partitioning import checkpoint_with_metrics

    def _sum_expr():
        return F.sum(F.col("label").cast("decimal(38,0)")).alias("s")

    # the convergence scalar rides the round's checkpoint as an
    # observed metric (round 6): one action per round instead of
    # checkpoint + follow-up aggregate job — values identical
    lab, m = checkpoint_with_metrics(
        verts.select("v", F.col("v").alias("label")), _sum_expr()
    )
    prev = m["s"]
    converged = False
    # NOTE: deliberately NOT a compute_dense_region — the per-round
    # state here is a few hundred KB of (v, label) rows and rounds are
    # many; lowering the coalescing floor multiplied task dispatches
    # across ~100 tiny stages and regressed kg_scc 4.9s -> 7.8s /
    # kg_condensation 7.5s -> 10.2s in the round-6 A/B. The region
    # pays off on few-round fan-out joins (betweenness, labeled BFS),
    # not many-round label loops.
    for rnd in range(max_prop):
        prop = edges.join(lab, edges[src] == lab["v"]).select(
            edges[dst].alias("v"), "label"
        )
        base = lab
        # pointer doubling from round 6 on: label(v) is the min over
        # vertices REACHING v (src->dst direction), so label(label(v))
        # also reaches v and folding it in is sound — coverage then
        # doubles per round, so a diameter-D graph needs ~6 + log2(D)
        # rounds instead of D (the round-5 ADVICE finding: a >64-hop
        # cycle silently truncated at the cap). The hop join is NOT
        # free (one extra label-sized shuffle per round), and measured
        # on the R-MAT/KG graphs (diameter < 6) always-on doubling
        # regressed kg_scc ~30% — so the cheap one-hop rounds run
        # first and doubling only engages on genuinely deep graphs.
        if rnd >= 6:
            hop = lab.select(
                F.col("v").alias("_hv"), F.col("label").alias("_hl")
            )
            base = lab.join(
                hop, lab["label"] == hop["_hv"], "left"
            ).select(
                "v",
                F.least(
                    "label", F.coalesce("_hl", "label")
                ).alias("label"),
            )
        lab, m = checkpoint_with_metrics(
            base.unionByName(prop)
            .groupBy("v")
            .agg(F.min("label").alias("label")),
            _sum_expr(),
        )
        s = m["s"]
        if s == prev:
            converged = True
            break
        prev = s
    if not converged:
        import warnings

        warnings.warn(
            f"_min_label_fixpoint hit max_prop={max_prop} before the "
            "label sum stabilized — labels may be non-minimal (with "
            "pointer doubling this needs reachability diameter "
            f"> 2^{max_prop}); raise max_prop",
            stacklevel=2,
        )
    return lab


def strongly_connected_components(
    edges: DataFrame, max_outer: int = 30, max_prop: int = 64
) -> DataFrame:
    """(entity_id, component) over the DIRECTED entity graph, where
    ``component`` is the smallest entity id in the vertex's strongly
    connected component — the cycle structure a KG needs before
    hierarchy checks (a subclass/part-of cycle is a modeling bug) and
    before condensing to a DAG for reachability indexing.

    Trim + forward/backward min-label rounds (the Pregel formulation of
    Orzan's coloring SCC; cf. Slota et al. 2014 FW-BW-Trim). Each outer
    round:

    1. TRIM to fixpoint: a vertex with no in-edge or no out-edge in the
       active subgraph is a singleton SCC. KG periphery (leaf objects,
       root subjects) is most of the graph, so trimming first keeps the
       propagation frontier small.
    2. Propagate min vertex id to fixpoint along forward edges
       (label = min over ancestors+self) and along reversed edges
       (min over descendants+self). Where both labels agree on c, the
       vertex settles with component c: c is then both an ancestor and
       a descendant (same SCC), and since c lower-bounds every member
       on both sides it IS the SCC's min id. The SCC of the globally
       minimal active vertex always settles, so every round makes
       progress. Settled vertices leave the active subgraph; removing
       a whole SCC never splits another, so later rounds still compute
       global SCC minima.

    Self-loop-only vertices never enter (a == b edges dropped); they are
    singleton SCCs by definition and their mentions are upstream data
    bugs worth surfacing separately (constraint_violations).

    Scale shape: every step is a vertex-id-keyed join or map-side-
    combined min aggregation; state is one row per active vertex; per-
    iteration lineage is cut (checkpoint_nostats — the stats-compounding
    lesson, PLANS.md session-7). Exact twin: scc_python (iterative
    Tarjan); relational oracle: mutual-reachability min over a recursive
    closure (kg_scc driver query)."""
    e0 = (
        edges.select(
            F.col("subj_entity_id").alias("a"),
            F.col("obj_entity_id").alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .transform(_ckpt_nostats)
    )
    spark = e0.sparkSession
    act_v = (
        e0.select(F.col("a").alias("v"))
        .unionByName(e0.select(F.col("b").alias("v")))
        .distinct()
        .transform(_ckpt_nostats)
    )
    # settled pieces accumulate in a list and union once at return: each
    # piece is already checkpointed, so the union is a flat plan over
    # LogicalRDD leaves — re-checkpointing the growing union per trim
    # round was O(|done|) EXTRA I/O per round (round-6 job-count find)
    done_parts: list[DataFrame] = [
        local_df(spark, [], "entity_id long, component long")
    ]
    act_e = e0
    from ..functions.partitioning import checkpoint_with_metrics

    _n = lambda: F.count(F.lit(1)).alias("n")  # noqa: E731

    # NOTE: no compute_dense_region here — see _min_label_fixpoint.
    # Emptiness probes ride the checkpoints as observed metrics
    # (round 6): one action per step instead of checkpoint + isEmpty.
    for _ in range(max_outer):
        # TRIM loop: peel acyclic periphery as singleton SCCs (the
        # two-distinct+join shape shuffles ~|V| rows per side thanks to
        # map-side dedup — measured better than a single 2|E|-row
        # degree-flag aggregate on the dense derived graphs)
        act_v_n = None
        while True:
            core, cm = checkpoint_with_metrics(
                act_e.select(F.col("a").alias("v"))
                .distinct()
                .join(act_e.select(F.col("b").alias("v")).distinct(), "v"),
                _n(),
            )
            trivial, tm = checkpoint_with_metrics(
                act_v.join(core, "v", "left_anti"), _n()
            )
            if not tm["n"]:
                act_v = core
                act_v_n = cm["n"]
                break
            done_parts.append(
                trivial.select(
                    F.col("v").alias("entity_id"),
                    F.col("v").alias("component"),
                )
            )
            act_v = core
            act_e = (
                act_e.join(core, act_e["a"] == core["v"], "left_semi")
                .join(
                    core.select(F.col("v").alias("b2")),
                    act_e["b"] == F.col("b2"),
                    "left_semi",
                )
                .transform(_ckpt_nostats)
            )
        if not act_v_n:  # trim's observed count of the surviving core
            break
        # the forward and backward propagations are INDEPENDENT (same
        # inputs, disjoint lineages) and each is a chain of small jobs
        # that underuses the cluster — submit them as concurrent Spark
        # jobs from two threads (the kg_link_prediction multi-fit
        # pattern). Results are byte-identical to the serial order:
        # only job SUBMISSION overlaps, every lineage is unchanged.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as _ex:
            f_fwd = _ex.submit(
                _min_label_fixpoint, act_v, act_e, "a", "b", max_prop
            )
            f_bwd = _ex.submit(
                _min_label_fixpoint, act_v, act_e, "b", "a", max_prop
            )
            fwd = f_fwd.result()
            bwd = f_bwd.result()
        settled = (
            fwd.join(
                bwd.select("v", F.col("label").alias("blabel")), "v"
            )
            .where(F.col("label") == F.col("blabel"))
            .select(
                F.col("v").alias("entity_id"),
                F.col("label").alias("component"),
            )
            .transform(_ckpt_nostats)
        )
        done_parts.append(settled)
        settled_v = settled.select(F.col("entity_id").alias("v"))
        act_v, am = checkpoint_with_metrics(
            act_v.join(settled_v, "v", "left_anti"), _n()
        )
        if not am["n"]:
            break
        act_e = (
            act_e.join(settled_v, act_e["a"] == settled_v["v"], "left_anti")
            .join(
                settled_v.select(F.col("v").alias("b2")),
                act_e["b"] == F.col("b2"),
                "left_anti",
            )
            .transform(_ckpt_nostats)
        )
    done = done_parts[0]
    for part in done_parts[1:]:
        done = done.unionByName(part)
    # one flat checkpoint for consumers (condensation joins this table
    # repeatedly; a many-leaf union plan re-analyzes per use)
    return done.transform(_ckpt_nostats) if len(done_parts) > 2 else done


def scc_python(edge_list: list[tuple[int, int]]) -> dict:
    """Flat twin of strongly_connected_components: iterative Tarjan over
    an adjacency dict (same self-loop drop, same vertex universe).
    Returns {vertex: min id of its SCC}."""
    adj: dict[int, list] = {}
    verts: set = set()
    for a, b in edge_list:
        if a == b:
            continue
        adj.setdefault(a, []).append(b)
        verts.add(a)
        verts.add(b)
    index: dict[int, int] = {}
    low: dict[int, int] = {}
    on_stack: set = set()
    stack: list[int] = []
    out: dict[int, int] = {}
    counter = [0]

    def strongconnect(root: int) -> None:
        work = [(root, 0)]
        while work:
            v, i = work[-1]
            if i == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            advanced = False
            for j in range(i, len(adj.get(v, []))):
                w = adj[v][j]
                if w not in index:
                    work[-1] = (v, j + 1)
                    work.append((w, 0))
                    advanced = True
                    break
                if w in on_stack:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            work.pop()
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    out[w] = m
            if work:
                p, _ = work[-1]
                low[p] = min(low[p], low[v])

    for v in sorted(verts):
        if v not in index:
            strongconnect(v)
    return out


def condensation(
    edges: DataFrame, components: DataFrame | None = None,
    max_iters: int = 64,
) -> DataFrame:
    """Condense the directed entity graph by its SCCs into a DAG and
    layer it: one row per component with (component, n_vertices,
    out_components, depth) where ``depth`` is the longest path (in
    condensation edges) ENDING at the component — the topological layer
    a reachability index or a hierarchy-repair pass processes the KG in.
    The condensation of any directed graph is acyclic (a cycle of SCCs
    would be one SCC), so the longest-path layering is well defined.

    ``components`` defaults to strongly_connected_components(edges);
    pass a precomputed table to reuse it.

    Scale shape: component mapping is two joins against the (vertex ->
    component) table keyed on vertex id; depth is an iterative max-label
    relaxation d(c) = max(d(c), d(pred)+1) over the DISTINCT component
    edges — state one row per component, convergence by the monotone
    increasing decimal(38,0) depth sum (same one-scalar trick as the SCC
    labels, mirrored), iterations bounded by the condensation's longest
    path which is <= the number of SCCs and tiny in practice."""
    if components is None:
        components = strongly_connected_components(edges)
    comp = components.select(
        F.col("entity_id").alias("v"), "component"
    ).transform(_ckpt_nostats)
    e = (
        edges.select(
            F.col("subj_entity_id").alias("a"),
            F.col("obj_entity_id").alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    ce = (
        e.join(comp.withColumnRenamed("v", "a"), "a")
        .withColumnRenamed("component", "ca")
        .join(
            comp.select(
                F.col("v").alias("b"), F.col("component").alias("cb")
            ),
            "b",
        )
        .where(F.col("ca") != F.col("cb"))
        .select("ca", "cb")
        .distinct()
        .transform(_ckpt_nostats)
    )
    comps = comp.select("component").distinct().transform(_ckpt_nostats)
    depth, _dm = _ckpt_metrics(
        comps.withColumn("depth", F.lit(0).cast("long")),
        F.sum(F.col("depth").cast("decimal(38,0)")).alias("s"),
    )
    prev = _dm["s"]
    for _ in range(max_iters):
        relaxed = ce.join(
            depth, ce["ca"] == depth["component"]
        ).select(
            F.col("cb").alias("component"),
            (F.col("depth") + F.lit(1)).cast("long").alias("depth"),
        )
        depth, _dm = _ckpt_metrics(
            depth.unionByName(relaxed)
            .groupBy("component")
            .agg(F.max("depth").alias("depth")),
            F.sum(F.col("depth").cast("decimal(38,0)")).alias("s"),
        )
        s = _dm["s"]
        if s == prev:
            break
        prev = s
    sizes = comp.groupBy("component").agg(
        F.count("*").cast("long").alias("n_vertices")
    )
    outdeg = ce.groupBy(F.col("ca").alias("component")).agg(
        F.count("*").cast("long").alias("out_components")
    )
    return (
        sizes.join(outdeg, "component", "left")
        .join(depth, "component", "left")
        .select(
            "component",
            "n_vertices",
            F.coalesce("out_components", F.lit(0)).cast("long").alias(
                "out_components"
            ),
            F.coalesce("depth", F.lit(0)).cast("long").alias("depth"),
        )
    )


def condensation_python(edge_list: list[tuple[int, int]]) -> dict:
    """Flat twin of condensation: Tarjan SCCs (scc_python) + longest-path
    relaxation over the condensed DAG. Returns
    {component: (n_vertices, out_components, depth)}."""
    comp = scc_python(edge_list)
    ce: set = set()
    for a, b in edge_list:
        if a == b:
            continue
        ca, cb = comp[a], comp[b]
        if ca != cb:
            ce.add((ca, cb))
    comps = sorted(set(comp.values()))
    depth = {c: 0 for c in comps}
    changed = True
    while changed:
        changed = False
        for ca, cb in ce:
            if depth[ca] + 1 > depth[cb]:
                depth[cb] = depth[ca] + 1
                changed = True
    n_v: dict[int, int] = {}
    for v, c in comp.items():
        n_v[c] = n_v.get(c, 0) + 1
    outd: dict[int, int] = {}
    for ca, _cb in ce:
        outd[ca] = outd.get(ca, 0) + 1
    return {c: (n_v[c], outd.get(c, 0), depth[c]) for c in comps}


def boruvka_msf(
    edges: DataFrame, weight_col: str = "weight", max_rounds: int = 40
) -> dict:
    """Minimum spanning forest of the undirected weighted entity graph
    by Borůvka rounds — the single-linkage backbone of an entity-
    similarity graph (cutting the MSF at threshold t IS single-linkage
    clustering at t, so one forest serves every threshold downstream).

    Edges are compared by the TOTAL order (weight, u, v) — ties cannot
    happen, so the forest is the unique MSF under that order and the
    Kruskal twin (msf_python) can assert exact edge-set equality.

    Per round (Borůvka 1926; the textbook O(log V)-round distributed
    formulation):

    1. every component selects its minimum crossing edge (one min-by-
       struct aggregation over both orientations of the crossing edges);
    2. selected edges join the forest (deduped: a mutual-min pair is
       selected from both sides);
    3. components contract: parent(c) = the selected neighbor component,
       mutual-min 2-cycles break toward the smaller id (the only cycles
       a total order allows), then pointer jumping to the root in
       O(log depth) iterations — all joins on component ids.

    Rounds halve (at least) the component count, so max_rounds = 40
    covers any graph a BIGINT can index. Returns {"edges": MSF edges
    (u, v, weight), "components": final (entity_id, component) with
    component = min entity id of the tree}.

    Scale shape: state is one row per vertex (comp) + one per surviving
    crossing edge; every step is keyed on vertex/component id;
    per-round lineage cut. Skew: a hub component's min-edge aggregation
    is a map-side-combined min, never a fan-out."""
    und = (
        edges.select(
            F.least("subj_entity_id", "obj_entity_id").alias("u"),
            F.greatest("subj_entity_id", "obj_entity_id").alias("v"),
            F.col(weight_col).alias("w"),
        )
        .where(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.min("w").alias("w"))  # parallel edges: cheapest survives
        .transform(_ckpt_nostats)
    )
    spark = und.sparkSession
    comp = (
        und.select(F.col("u").alias("x"))
        .unionByName(und.select(F.col("v").alias("x")))
        .distinct()
        .select(F.col("x").alias("vtx"), F.col("x").alias("c"))
        .transform(_ckpt_nostats)
    )
    forest = local_df(spark, [], "u long, v long, w double")
    for _ in range(max_rounds):
        cu = comp.select(F.col("vtx").alias("u"), F.col("c").alias("cu"))
        cv = comp.select(F.col("vtx").alias("v"), F.col("c").alias("cv"))
        cross, _m = _ckpt_metrics(
            und.join(cu, "u").join(cv, "v")
            .where(F.col("cu") != F.col("cv")),
            F.count(F.lit(1)).alias("n"),
        )
        if not _m["n"]:
            break
        both = cross.select(
            F.col("cu").alias("c"), F.col("cv").alias("other"),
            "u", "v", "w",
        ).unionByName(
            cross.select(
                F.col("cv").alias("c"), F.col("cu").alias("other"),
                "u", "v", "w",
            )
        )
        sel = (
            both.groupBy("c")
            .agg(
                F.min(F.struct("w", "u", "v", "other")).alias("m")
            )
            .select(
                "c",
                F.col("m.u").alias("u"),
                F.col("m.v").alias("v"),
                F.col("m.w").alias("w"),
                F.col("m.other").alias("other"),
            )
            .transform(_ckpt_nostats)
        )
        forest = forest.unionByName(
            sel.select("u", "v", "w").distinct()
        ).transform(_ckpt_nostats)
        # contraction: parent = selected neighbor; break mutual-min
        # 2-cycles toward the smaller id, then pointer-jump to roots
        parent = sel.select("c", F.col("other").alias("p"))
        par2 = parent.select(
            F.col("c").alias("p"), F.col("p").alias("pp")
        )
        parent = (
            parent.join(par2, "p", "left")
            .select(
                "c",
                F.when(
                    (F.col("pp") == F.col("c")) & (F.col("c") < F.col("p")),
                    F.col("c"),
                ).otherwise(F.col("p")).alias("p"),
            )
            .transform(_ckpt_nostats)
        )
        for _ in range(max_rounds):
            gp = parent.select(
                F.col("c").alias("p"), F.col("p").alias("gp")
            )
            # the change probe is knowable IN-ROW during the doubling
            # step (new p differs from old p iff the grandparent hop
            # moved it), so it rides the checkpoint as an observed
            # metric instead of a separate join-probe job
            nxt, _pm = _ckpt_metrics(
                parent.join(gp, "p", "left")
                .select(
                    "c",
                    F.coalesce("gp", "p").alias("p"),
                    # exact mirror of the old probe: a row counts as
                    # moved iff its NEW pointer is non-root (!= c) AND
                    # differs from the old one (gp present and != p)
                    (
                        (F.coalesce("gp", "p") != F.col("c"))
                        & F.col("gp").isNotNull()
                        & (F.col("gp") != F.col("p"))
                    ).alias("_moved"),
                )
                .select("c", "p", "_moved"),
                F.sum(F.col("_moved").cast("long")).alias("moved"),
            )
            nxt = nxt.drop("_moved")
            parent = nxt
            if not int(_pm["moved"] or 0):
                break
        comp = (
            comp.join(
                parent.select(F.col("c"), F.col("p")), "c", "left"
            )
            .select("vtx", F.coalesce("p", "c").alias("c"))
            .transform(_ckpt_nostats)
        )
    # the contraction root is SOME tree member (the smaller end of the
    # last mutual-min pair), not necessarily the tree minimum —
    # normalize labels to min(vtx) per tree for the stable contract
    label = comp.groupBy("c").agg(F.min("vtx").alias("component"))
    return {
        "edges": forest,
        "components": comp.join(label, "c").select(
            F.col("vtx").alias("entity_id"), "component"
        ),
    }


def msf_python(weighted_edges: list[tuple[int, int, float]]) -> dict:
    """Kruskal twin of boruvka_msf under the identical (w, u, v) total
    order (u/v canonicalized u < v, cheapest parallel edge kept).
    Returns {"edges": sorted [(u, v, w)], "components": {vtx: min id of
    its tree}}."""
    best: dict = {}
    for a, b, w in weighted_edges:
        if a == b:
            continue
        u, v = (a, b) if a < b else (b, a)
        if (u, v) not in best or w < best[(u, v)]:
            best[(u, v)] = w
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in best:
        parent.setdefault(u, u)
        parent.setdefault(v, v)
    out = []
    for (u, v), w in sorted(best.items(), key=lambda t: (t[1], t[0])):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
            out.append((u, v, w))
    comps: dict = {}
    for x in parent:
        comps[x] = find(x)
    # normalize roots to the min id of each tree (union-by-min keeps
    # this already, but make it explicit)
    members: dict = {}
    for x, r in comps.items():
        members.setdefault(r, []).append(x)
    final = {}
    for r, xs in members.items():
        m = min(xs)
        for x in xs:
            final[x] = m
    return {"edges": sorted(out), "components": final}


def temporal_reachability(
    edges: DataFrame, seeds: DataFrame, max_rounds: int = 40
) -> DataFrame:
    """Earliest-arrival TIME-RESPECTING reachability (Holme & Saramäki
    2012 temporal-network semantics): a path may only traverse edges
    with non-decreasing timestamps, and ``arrival(v)`` is the smallest
    timestamp at which any such path from a seed reaches v. On
    transcript KGs this is the influence chain: "which entities could
    this fact have propagated to, and by which turn" — plain
    reachability overcounts by ignoring that causality can't go back in
    time.

    ``edges``: (subj_entity_id, obj_entity_id, ts); ``seeds``:
    (entity_id). Seeds arrive at -1 (before every real timestamp >= 0).

    Fixpoint relaxation: candidate arrivals are one join per round
    (edges keyed on the source endpoint, filtered to ts >= arrival(u)),
    folded by min. Arrival times only decrease, so the decimal(38,0)
    arrival sum is strictly monotone — the same one-scalar convergence
    as the SCC labels; a decreased arrival(u) can enable earlier
    departures, which is exactly what the next round relaxes. State is
    one row per reached vertex. Twin: temporal_reachability_python;
    oracle: recursive CTE over (v, t) pairs — bounded by |E| since each
    row is witnessed by one edge."""
    e = edges.select(
        F.col("subj_entity_id").alias("u"),
        F.col("obj_entity_id").alias("v"),
        F.col("ts").cast("long").alias("t"),
    ).transform(_ckpt_nostats)
    arr = (
        seeds.select(F.col("entity_id").alias("v"))
        .distinct()
        .withColumn("arrival", F.lit(-1).cast("long"))
        .transform(_ckpt_nostats)
    )
    prev = None
    for _ in range(max_rounds):
        cand = (
            e.join(arr, e["u"] == arr["v"])
            .where(F.col("t") >= F.col("arrival"))
            .select(e["v"].alias("v"), F.col("t").alias("arrival"))
        )
        arr, _am = _ckpt_metrics(
            arr.unionByName(cand)
            .groupBy("v")
            .agg(F.min("arrival").alias("arrival")),
            F.sum(F.col("arrival").cast("decimal(38,0)")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        sig = (_am["s"], _am["n"])
        if sig == prev:
            break
        prev = sig
    return arr.select(F.col("v").alias("entity_id"), "arrival")


def temporal_reachability_python(
    edge_list: list[tuple[int, int, int]], seed_ids: list[int]
) -> dict:
    """Flat twin: identical fixpoint over an adjacency dict. Returns
    {entity_id: earliest arrival} (seeds at -1)."""
    arr = {s: -1 for s in seed_ids}
    changed = True
    while changed:
        changed = False
        for u, v, t in edge_list:
            au = arr.get(u)
            if au is not None and t >= au and (
                v not in arr or t < arr[v]
            ):
                arr[v] = t
                changed = True
    return arr


def densest_subgraph(
    edges: DataFrame, eps_pct: int = 10, max_rounds: int = 200
) -> DataFrame:
    """Densest-subgraph extraction by batched peeling (Bahmani, Kumar &
    Vassilvitskii 2012, "Densest Subgraph in Streaming and MapReduce"):
    repeatedly delete EVERY vertex whose degree is <= (1 + eps) times
    the current AVERAGE DEGREE 2|E|/|V| (some vertex is always at or
    below average degree, so the peel set is never empty and the loop
    provably progresses), remembering the densest
    intermediate subgraph — a (2 + 2*eps)-approximation of the densest
    subgraph in O(log n / eps) rounds (vs Charikar's sequential
    one-vertex-at-a-time peel). The KG use: the mutually-entangled core
    of an entity graph (spam clusters, boilerplate hubs, tight
    communities) that degree thresholds alone cannot isolate.

    All density comparisons are EXACT integer cross-multiplications
    (deg * |V| * 100 <= 2 * |E| * (100 + eps_pct); best-density tracking by
    e1 * v2 vs e2 * v1), so the python twin (densest_subgraph_python)
    asserts bit-identical vertex sets — no float drift, no tolerance.

    Returns the best subgraph's vertices as (entity_id, n_vertices,
    n_edges) with the counts constant per row (density = n_edges /
    n_vertices). Scale shape per round: one degree aggregation + two
    semi-joins (the k_core peel plan), lineage cut per round; the
    number of rounds is logarithmic by the peeling lemma."""
    und = _undirected(edges).transform(_ckpt_nostats)
    # _undirected doubles each edge; |E| = rows / 2
    cur = und
    best = None  # (e_cnt, v_cnt, DataFrame of vertices)
    for _ in range(max_rounds):
        # the vertex/edge tallies ride the degree table's checkpoint as
        # observed metrics (one action instead of checkpoint-free deg +
        # a separate aggregate job + a best-snapshot checkpoint: the
        # checkpointed deg table IS the snapshot)
        deg, _dm = _ckpt_metrics(
            cur.groupBy("a").agg(F.count("*").cast("long").alias("deg")),
            F.count(F.lit(1)).alias("vc"),
            F.sum("deg").alias("es"),
        )
        v_cnt, e2_cnt = int(_dm["vc"] or 0), int(_dm["es"] or 0)
        e_cnt = e2_cnt // 2
        if v_cnt == 0:
            break
        if best is None or e_cnt * best[1] > best[0] * v_cnt:
            best = (e_cnt, v_cnt, deg.select("a"))
        # peel: deg <= (1 + eps) * 2E / V (average degree), exactly:
        # deg * V * 100 <= 2E * (100 + eps_pct)
        keep, _m = _ckpt_metrics(
            deg.where(
                F.col("deg") * F.lit(v_cnt) * 100
                > F.lit(2 * e_cnt * (100 + eps_pct))
            ).select("a"),
            F.count(F.lit(1)).alias("n"),
        )
        if not _m["n"]:
            break
        cur = (
            cur.join(keep, "a", "left_semi")
            .join(
                keep.select(F.col("a").alias("b")), "b", "left_semi"
            )
            .transform(_ckpt_nostats)
        )
    if best is None:
        spark = edges.sparkSession
        return local_df(
            spark, [], "entity_id long, n_vertices long, n_edges long"
        )
    e_cnt, v_cnt, verts = best
    return verts.select(
        F.col("a").alias("entity_id"),
        F.lit(v_cnt).cast("long").alias("n_vertices"),
        F.lit(e_cnt).cast("long").alias("n_edges"),
    )


def densest_subgraph_python(
    edge_list: list[tuple[int, int]], eps_pct: int = 10
) -> dict:
    """Flat twin of densest_subgraph: identical batched peel and exact
    integer density bookkeeping. Returns {"vertices": sorted list,
    "n_vertices": int, "n_edges": int}."""
    adj: dict[int, set] = {}
    for a, b in edge_list:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    best = None  # (e, v, vertex set)
    while adj:
        v_cnt = len(adj)
        e_cnt = sum(len(ns) for ns in adj.values()) // 2
        if best is None or e_cnt * best[1] > best[0] * v_cnt:
            best = (e_cnt, v_cnt, sorted(adj))
        doomed = [
            x
            for x, ns in adj.items()
            if len(ns) * v_cnt * 100 <= 2 * e_cnt * (100 + eps_pct)
        ]
        if not doomed:
            break
        for x in doomed:
            for n in adj.pop(x):
                if n in adj:
                    adj[n].discard(x)
        # drop isolated leftovers of this round's peel
        for x in [x for x, ns in adj.items() if not ns]:
            adj.pop(x)
    if best is None:
        return {"vertices": [], "n_vertices": 0, "n_edges": 0}
    return {
        "vertices": best[2],
        "n_vertices": best[1],
        "n_edges": best[0],
    }


def coreness(edges: DataFrame, max_iters: int = 200) -> DataFrame:
    """Full core decomposition: (entity_id, coreness) where coreness(v)
    is the largest k such that v belongs to the k-core — the per-vertex
    refinement of k_core membership, and the standard KG importance
    tier (embedding pipelines keep cores, serve tiers by coreness).

    Computed by the h-index fixpoint (Lü, Chen, Ren, Zhang, Zhou &
    Stanley 2016, "The H-index of a network node and its relation to
    degree and coreness", Nat. Commun.): start at degree and repeat
    c(v) <- H({c(u): u neighbor of v}), the largest h such that at
    least h neighbors have value >= h. The sequence is monotonically
    non-increasing and converges EXACTLY to coreness — no peeling
    order, no global sequential dependency, just a local aggregate per
    round: the formulation that distributes.

    Spark shape per round: one join to fetch neighbor values + one
    per-vertex window h-index (max over rn of min(value at rank rn,
    rn) on the DESC-ordered neighbor values — partitioned BY VERTEX,
    a hub's partition is its neighbor list); values only decrease, so
    the decimal(38,0) sum is the one-scalar convergence signal.
    Twin: coreness_python runs the CLASSIC min-degree peel — a
    different algorithm converging to the same numbers, so agreement
    cross-validates both."""
    from pyspark.sql import Window

    und = _undirected(edges).transform(_ckpt_nostats)
    c, _cm = _ckpt_metrics(
        und.groupBy("a").agg(F.count("*").cast("long").alias("c")),
        F.sum(F.col("c").cast("decimal(38,0)")).alias("s"),
    )
    prev = _cm["s"]
    w = Window.partitionBy("a").orderBy(F.desc("cb"), F.asc("b"))
    for _ in range(max_iters):
        nv = und.join(
            c.select(F.col("a").alias("b"), F.col("c").alias("cb")), "b"
        ).select("a", "b", "cb")
        c = (
            nv.select(
                "a",
                F.least(
                    F.col("cb"), F.row_number().over(w).cast("long")
                ).alias("h"),
            )
            .groupBy("a")
            .agg(F.max("h").alias("c"))
        )
        c, _cm = _ckpt_metrics(
            c, F.sum(F.col("c").cast("decimal(38,0)")).alias("s")
        )
        s = _cm["s"]
        if s == prev:
            break
        prev = s
    return c.select(F.col("a").alias("entity_id"), F.col("c").alias("coreness"))


def coreness_python(edge_list: list[tuple[int, int]]) -> dict:
    """Classic peeling twin (Batagelj-Zaversnik order): repeatedly
    remove a minimum-degree vertex; its degree at removal (monotone
    max'd) is its coreness. Returns {vertex: coreness}."""
    adj: dict[int, set] = {}
    for a, b in edge_list:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    core: dict[int, int] = {}
    k = 0
    while adj:
        v = min(adj, key=lambda x: (len(adj[x]), x))
        k = max(k, len(adj[v]))
        core[v] = k
        for n in adj.pop(v):
            adj[n].discard(v)
        # vertices isolated by this removal have degree 0 <= k and would
        # be picked next by the min rule anyway: same coreness k
        for x in [x for x, ns in adj.items() if not ns]:
            core[x] = k
            adj.pop(x)
    return core


def weighted_sssp(
    edges: DataFrame,
    seeds: DataFrame,
    cost_col: str = "cost",
    max_hops: int = 6,
) -> DataFrame:
    """Hop-bounded weighted single-source (multi-seed) shortest paths
    by Bellman-Ford relaxation: (entity_id, dist) with dist = the
    cheapest total cost over directed paths of <= max_hops edges from
    any seed (seeds at 0) — the weighted complement to bfs_distances,
    scoring KG proximity by evidence-tier cost instead of raw hops.
    The hop bound is the practical KG-path-scoring contract (an
    unbounded Bellman-Ford needs |V| rounds at 100 TB; influence
    beyond ~6 hops is noise) AND what keeps the relational oracle
    finite.

    Exactly max_hops relaxation rounds (early exit on fixpoint): after
    round k the table holds the min cost within k hops, so the early
    exit never changes the answer. Each round is one source-keyed join
    + a min fold; distances only decrease, so the decimal(38,0)
    (sum, count) pair is the convergence signal. State: one row per
    reached vertex. Twin: weighted_sssp_python (hop-DP); oracle:
    recursive (v, d, hop) enumeration — finite because hop <= max_hops
    and integer costs come from a small quantized tier set."""
    e = edges.select(
        F.col("subj_entity_id").alias("u"),
        F.col("obj_entity_id").alias("v"),
        F.col(cost_col).cast("long").alias("w"),
    ).transform(_ckpt_nostats)
    dist = (
        seeds.select(F.col("entity_id").alias("v"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("long"))
        .transform(_ckpt_nostats)
    )
    prev = None
    for _ in range(max_hops):
        cand = (
            e.join(dist, e["u"] == dist["v"])
            .select(
                e["v"].alias("v"),
                (F.col("dist") + F.col("w")).cast("long").alias("dist"),
            )
        )
        dist = (
            dist.unionByName(cand)
            .groupBy("v")
            .agg(F.min("dist").alias("dist"))
            .transform(_ckpt_nostats)
        )
        s = dist.agg(
            F.sum(F.col("dist").cast("decimal(38,0)")), F.count("*")
        ).collect()[0]
        sig = (s[0], s[1])
        if sig == prev:
            break
        prev = sig
    return dist.select(F.col("v").alias("entity_id"), "dist")


def weighted_sssp_python(
    edge_list: list[tuple[int, int, int]],
    seed_ids: list[int],
    max_hops: int = 6,
) -> dict:
    """Flat hop-DP twin. Returns {entity_id: min cost within max_hops
    hops} (seeds 0)."""
    dist = {s: 0 for s in seed_ids}
    for _ in range(max_hops):
        nxt = dict(dist)
        for u, v, w in edge_list:
            if u in dist:
                d = dist[u] + w
                if v not in nxt or d < nxt[v]:
                    nxt[v] = d
        if nxt == dist:
            break
        dist = nxt
    return dist


def _triad_canon_map() -> dict:
    """code -> class name for all 64 raw triad codes. Raw code bits for
    an ORDERED triple (t1 < t2 < t3): bit0 t1->t2, bit1 t2->t1,
    bit2 t1->t3, bit3 t3->t1, bit4 t2->t3, bit5 t3->t2. Canonical class
    = min code over the 6 vertex relabelings; names follow the
    Holland-Leinhardt M-A-N convention with the 021-style orientation
    rule applied uniformly: D = the two asymmetric edges share their
    SOURCE, U = share their TARGET, C = chain; 111U/D = the asymmetric
    edge leaves/enters the mutual dyad."""
    from itertools import permutations

    pairs = [(0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1)]

    def recode(code, perm):
        edges = {
            (a, b)
            for i, (a, b) in enumerate(pairs)
            if (code >> i) & 1
        }
        edges2 = {(perm[a], perm[b]) for a, b in edges}
        out = 0
        for i, (a, b) in enumerate(pairs):
            if (a, b) in edges2:
                out |= 1 << i
        return out

    names = {
        0: "003", 1: "012", 3: "102", 5: "021D", 6: "021C",
        10: "021U", 7: "111U", 11: "111D", 15: "201", 21: "030T",
        25: "030C", 23: "120U", 27: "120C", 30: "120D", 31: "210",
        63: "300",
    }
    canon = {}
    for code in range(64):
        c = min(recode(code, p) for p in permutations(range(3)))
        canon[code] = names[c]
    return canon


def triad_census(edges: DataFrame) -> DataFrame:
    """Directed triad census (Holland & Leinhardt 1976) over CONNECTED
    triples — every unordered vertex triple with at least two adjacent
    pairs, classified into its isomorphism class (13 connected classes
    of the 16; 003/012/102 have < 2 adjacent pairs and are derivable
    from edge totals). The standard motif profile of a directed graph:
    ratios like 030T/030C (transitivity vs cyclicity) and 120/210 mass
    are the structural fingerprint KG-quality monitoring tracks across
    builds.

    Plan: pair-state table (unordered pair -> 2-bit state) from one
    distinct projection; wedge enumeration via three join patterns on
    the shared vertex (each triple found once per adjacent pair-pair,
    deduped); 6-bit code assembled from three pair-state lookups;
    class via the broadcast 64-row canonical map; one count per class.
    Wedge volume is sum-of-degrees-squared over the PAIR graph — the
    same budget as any motif count; cap the graph upstream, not here.
    Returns (triad_class, n_triads)."""
    spark = edges.sparkSession
    e = (
        edges.select(
            F.col("subj_entity_id").alias("u"),
            F.col("obj_entity_id").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    # 2-bit pair state: e is distinct, so each direction contributes
    # its bit at most once and the sum IS the bitwise-or
    ps = (
        e.select(
            F.least("u", "v").alias("x"),
            F.greatest("u", "v").alias("y"),
            F.when(F.col("u") < F.col("v"), F.lit(1))
            .otherwise(F.lit(2))
            .alias("b"),
        )
        .groupBy("x", "y")
        .agg(F.sum(F.col("b")).cast("int").alias("s"))
        .transform(_ckpt_nostats)
    )
    p1 = ps.select(
        F.col("x").alias("a1"), F.col("y").alias("b1")
    )
    p2 = ps.select(
        F.col("x").alias("a2"), F.col("y").alias("b2")
    )
    trip = (
        p1.join(p2, (F.col("b1") == F.col("a2")))
        .select(
            F.col("a1").alias("t1"),
            F.col("b1").alias("t2"),
            F.col("b2").alias("t3"),
        )
        .unionByName(
            p1.join(
                p2,
                (F.col("a1") == F.col("a2"))
                & (F.col("b1") < F.col("b2")),
            ).select(
                F.col("a1").alias("t1"),
                F.col("b1").alias("t2"),
                F.col("b2").alias("t3"),
            )
        )
        .unionByName(
            p1.join(
                p2,
                (F.col("b1") == F.col("b2"))
                & (F.col("a1") < F.col("a2")),
            ).select(
                F.col("a1").alias("t1"),
                F.col("a2").alias("t2"),
                F.col("b1").alias("t3"),
            )
        )
        .distinct()
        .transform(_ckpt_nostats)
    )
    s12 = ps.select(
        F.col("x").alias("t1"), F.col("y").alias("t2"),
        F.col("s").alias("s12"),
    )
    s13 = ps.select(
        F.col("x").alias("t1"), F.col("y").alias("t3"),
        F.col("s").alias("s13"),
    )
    s23 = ps.select(
        F.col("x").alias("t2"), F.col("y").alias("t3"),
        F.col("s").alias("s23"),
    )
    coded = (
        trip.join(s12, ["t1", "t2"], "left")
        .join(s13, ["t1", "t3"], "left")
        .join(s23, ["t2", "t3"], "left")
        .select(
            (
                F.coalesce("s12", F.lit(0))
                + F.coalesce("s13", F.lit(0)) * 4
                + F.coalesce("s23", F.lit(0)) * 16
            ).alias("code")
        )
    )
    cmap = _triad_canon_map()
    lookup = local_df(
        spark, [(k, v) for k, v in cmap.items()], "code int, triad_class string"
    )
    return (
        coded.join(F.broadcast(lookup), "code")
        .groupBy("triad_class")
        .agg(F.count("*").cast("long").alias("n_triads"))
    )


def triad_census_python(edge_list: list[tuple[int, int]]) -> dict:
    """Brute-force twin: enumerate every vertex triple of the graph,
    classify through the same canonical map, keep classes with >= 2
    adjacent pairs. Returns {class: count}."""
    from itertools import combinations

    e = {(a, b) for a, b in edge_list if a != b}
    verts = sorted({x for t in e for x in t})
    cmap = _triad_canon_map()
    out: dict = {}
    for t1, t2, t3 in combinations(verts, 3):
        code = (
            (1 if (t1, t2) in e else 0)
            | (2 if (t2, t1) in e else 0)
            | (4 if (t1, t3) in e else 0)
            | (8 if (t3, t1) in e else 0)
            | (16 if (t2, t3) in e else 0)
            | (32 if (t3, t2) in e else 0)
        )
        # adjacent pairs = nonzero 2-bit groups; connected = >= 2
        npairs = sum(
            1 for sh in (0, 2, 4) if (code >> sh) & 3
        )
        if npairs < 2:
            continue
        name = cmap[code]
        out[name] = out.get(name, 0) + 1
    return out
