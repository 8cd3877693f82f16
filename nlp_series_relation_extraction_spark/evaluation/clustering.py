"""Entity-resolution clustering quality: pairwise P/R/F1 and B-cubed.

The reference scores TRIPLES (run_evaluation.py's exact-match P/R/F1 —
our evaluation/metrics.py twin); it has no entity-canonicalization
stage, so it never scores CLUSTERINGS. Our pipeline does (linking.py,
predicates.py), and the standard ER report is pairwise precision/
recall/F1 (Menestrina 2010's pairwise merge-distance family) plus
B-cubed (Bagga & Baldwin 1998) — B³ weights items, not pairs, so one
giant wrong merge can't dominate the score the way it dominates
pairwise.

Everything reduces to the pred x gold CONTINGENCY TABLE — never to
pair enumeration:

* cell (i, j): n_ij = items in pred cluster i and gold cluster j;
  pairwise tp = sum C(n_ij, 2); predicted pairs = sum_i C(n_i., 2);
  gold pairs = sum_j C(n_.j, 2).
* B³: sum of per-item precision = sum_ij n_ij^2 / n_i.; recall
  likewise over n_.j.

Three hash aggregates over the assignment table — O(cells) rows
shuffled, zero quadratic anywhere: a trillion-item clustering costs
the same three shuffles. All statistics are integer ppm (per-cell
integer division, truncating — bias < 1 ppm per cell), so the numbers
are bit-stable cross-engine and the DuckDB oracle replays them with
the same integer ops. When a side has no pairs at all (all-singleton
clustering) the corresponding pairwise ratio is defined as 1.0 — the
convention that an empty claim set makes no errors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_PPM = 1_000_000


def clustering_eval(
    assign: DataFrame,
    item_col: str = "item_id",
    pred_col: str = "pred_cluster",
    gold_col: str = "gold_cluster",
) -> DataFrame:
    """(item, pred_cluster, gold_cluster) -> ONE row of clustering
    quality: (n_items, tp_pairs, pred_pairs, gold_pairs,
    pair_precision_ppm, pair_recall_ppm, pair_f1_ppm, b3_precision_ppm,
    b3_recall_ppm, b3_f1_ppm). Items are deduplicated on ``item_col``
    first (an item has exactly one assignment per side)."""
    a = (
        assign.select(
            F.col(item_col).alias("it"),
            F.col(pred_col).cast("string").alias("pc"),
            F.col(gold_col).cast("string").alias("gc"),
        )
        # deterministic dedup (min per side): an arbitrary-row pick would
        # be engine-dependent on malformed multi-assignment input
        .groupBy("it")
        .agg(F.min("pc").alias("pc"), F.min("gc").alias("gc"))
    )
    cells = a.groupBy("pc", "gc").agg(F.count("*").alias("n_ij"))
    pred_sz = a.groupBy("pc").agg(F.count("*").alias("n_i"))
    gold_sz = a.groupBy("gc").agg(F.count("*").alias("n_j"))
    # contingency cells join their row/column totals; both totals tables
    # are cluster-count-sized (<= cells), broadcastable in practice but
    # left to Catalyst/AQE — at extreme cluster counts sort-merge with
    # skew splitting is the right physical plan, not a forced broadcast
    joined = cells.join(pred_sz, "pc").join(gold_sz, "gc")
    agg = joined.agg(
        F.sum(F.expr("n_ij * (n_ij - 1) div 2")).cast("long").alias("tp"),
        F.sum(
            F.expr(f"{_PPM} * n_ij * n_ij div n_i")
        ).cast("long").alias("sum_b3p_ppm"),
        F.sum(
            F.expr(f"{_PPM} * n_ij * n_ij div n_j")
        ).cast("long").alias("sum_b3r_ppm"),
    )
    pred_pairs = pred_sz.agg(
        F.sum(F.expr("n_i * (n_i - 1) div 2")).cast("long").alias("pp")
    )
    gold_pairs = gold_sz.agg(
        F.sum(F.expr("n_j * (n_j - 1) div 2")).cast("long").alias("gp")
    )
    n_items = a.agg(F.count("*").cast("long").alias("n"))
    # four one-row aggregates cross-joined: each side is a single row, so
    # the "cross join" is a driver-free scalar combine, not a data join
    row = (
        agg.crossJoin(pred_pairs).crossJoin(gold_pairs).crossJoin(n_items)
    )
    # every ratio is integer `div` in BOTH engines: a float division
    # would truncate in Spark's cast-to-long but ROUND in DuckDB's, and
    # a boundary value would hash-mismatch
    scored = row.select(
        "n", "tp", "pp", "gp", "sum_b3p_ppm", "sum_b3r_ppm",
        F.expr(
            f"CASE WHEN pp = 0 THEN {_PPM} ELSE {_PPM} * tp div pp END"
        ).cast("long").alias("prec"),
        F.expr(
            f"CASE WHEN gp = 0 THEN {_PPM} ELSE {_PPM} * tp div gp END"
        ).cast("long").alias("rec"),
        F.expr("sum_b3p_ppm div n").cast("long").alias("b3p"),
        F.expr("sum_b3r_ppm div n").cast("long").alias("b3r"),
    )
    return scored.select(
        F.col("n").alias("n_items"),
        F.col("tp").alias("tp_pairs"),
        F.col("pp").alias("pred_pairs"),
        F.col("gp").alias("gold_pairs"),
        F.col("prec").alias("pair_precision_ppm"),
        F.col("rec").alias("pair_recall_ppm"),
        F.expr(
            "CASE WHEN prec + rec = 0 THEN 0"
            " ELSE 2 * prec * rec div (prec + rec) END"
        ).cast("long").alias("pair_f1_ppm"),
        F.col("b3p").alias("b3_precision_ppm"),
        F.col("b3r").alias("b3_recall_ppm"),
        F.expr(
            "CASE WHEN b3p + b3r = 0 THEN 0"
            " ELSE 2 * b3p * b3r div (b3p + b3r) END"
        ).cast("long").alias("b3_f1_ppm"),
    )


def clustering_eval_sql(
    assign_sql: str,
    item_col: str = "item_id",
    pred_col: str = "pred_cluster",
    gold_col: str = "gold_cluster",
) -> str:
    """DuckDB twin of :func:`clustering_eval` over an assignment
    subquery — identical integer-ppm arithmetic, cell for cell."""
    return f"""
WITH a AS (
  SELECT {item_col} AS it,
         cast({pred_col} AS VARCHAR) AS pc,
         cast({gold_col} AS VARCHAR) AS gc
  FROM ({assign_sql})
), d AS (SELECT it, min(pc) AS pc, min(gc) AS gc FROM a GROUP BY it),
cells AS (SELECT pc, gc, count(*) AS n_ij FROM d GROUP BY pc, gc),
ps AS (SELECT pc, count(*) AS n_i FROM d GROUP BY pc),
gs AS (SELECT gc, count(*) AS n_j FROM d GROUP BY gc),
j AS (SELECT c.n_ij, ps.n_i, gs.n_j
      FROM cells c JOIN ps USING (pc) JOIN gs USING (gc)),
t AS (
  SELECT cast(sum(n_ij * (n_ij - 1) // 2) AS BIGINT) AS tp,
         cast(sum(1000000 * n_ij * n_ij // n_i) AS BIGINT) AS sum_b3p_ppm,
         cast(sum(1000000 * n_ij * n_ij // n_j) AS BIGINT) AS sum_b3r_ppm
  FROM j
), pp_t AS (SELECT cast(sum(n_i * (n_i - 1) // 2) AS BIGINT) AS pp FROM ps),
gp_t AS (SELECT cast(sum(n_j * (n_j - 1) // 2) AS BIGINT) AS gp FROM gs),
n_t AS (SELECT cast(count(*) AS BIGINT) AS n FROM d),
row_t AS (SELECT * FROM t, pp_t, gp_t, n_t),
scored AS (
  SELECT n, tp, pp, gp,
    CASE WHEN pp = 0 THEN 1000000 ELSE 1000000 * tp // pp END AS prec,
    CASE WHEN gp = 0 THEN 1000000 ELSE 1000000 * tp // gp END AS rec,
    sum_b3p_ppm // n AS b3p, sum_b3r_ppm // n AS b3r
  FROM row_t
)
SELECT n AS n_items, tp AS tp_pairs, pp AS pred_pairs, gp AS gold_pairs,
  cast(prec AS BIGINT) AS pair_precision_ppm,
  cast(rec AS BIGINT) AS pair_recall_ppm,
  cast(CASE WHEN prec + rec = 0 THEN 0
       ELSE 2 * prec * rec // (prec + rec) END AS BIGINT) AS pair_f1_ppm,
  cast(b3p AS BIGINT) AS b3_precision_ppm,
  cast(b3r AS BIGINT) AS b3_recall_ppm,
  cast(CASE WHEN b3p + b3r = 0 THEN 0
       ELSE 2 * b3p * b3r // (b3p + b3r) END AS BIGINT) AS b3_f1_ppm
FROM scored
"""


def muc_eval(
    assign: DataFrame,
    item_col: str = "item_id",
    pred_col: str = "pred_cluster",
    gold_col: str = "gold_cluster",
) -> DataFrame:
    """MUC link-based clustering score (Vilain et al. MUC-6 1995) —
    the third classic next to pairwise and B³, and the one coreference
    evaluation reports first. MUC counts the MINIMUM spanning links a
    clustering implies (|C| - 1 per cluster) and asks how many of the
    gold links the prediction preserves: recall = Σ_K (|K| - p(K)) /
    Σ_K (|K| - 1) where p(K) = number of predicted clusters gold
    cluster K is scattered across; precision is the mirror. Linkwise
    scoring means singletons contribute NOTHING (their link count is
    0) — the known MUC blind spot B³ covers, which is why the report
    family wants all three.

    Returns ONE row: (n_items, pred_links, gold_links,
    muc_precision_ppm, muc_recall_ppm, muc_f1_ppm). All-singleton
    sides define their ratio as 1e6 (no links claimed, none wrong) —
    the same empty-claim convention as pairwise. Truncating integer
    ppm throughout.

    Scale shape: identical to clustering_eval — everything reduces to
    the pred x gold contingency cells (three hash aggregates, O(cells)
    shuffled rows, zero pair enumeration), then one-row combines."""
    a = (
        assign.select(
            F.col(item_col).alias("it"),
            F.col(pred_col).cast("string").alias("pc"),
            F.col(gold_col).cast("string").alias("gc"),
        )
        .groupBy("it")
        .agg(F.min("pc").alias("pc"), F.min("gc").alias("gc"))
    )
    cells = a.groupBy("pc", "gc").agg(F.count("*").alias("n_ij"))
    # per gold cluster: size and how many pred clusters it scatters over
    gold_side = cells.groupBy("gc").agg(
        F.sum("n_ij").alias("n_j"), F.count("*").alias("parts_j")
    )
    pred_side = cells.groupBy("pc").agg(
        F.sum("n_ij").alias("n_i"), F.count("*").alias("parts_i")
    )
    rec_t = gold_side.agg(
        F.sum(F.expr("n_j - parts_j")).cast("long").alias("rec_num"),
        F.sum(F.expr("n_j - 1")).cast("long").alias("gold_links"),
    )
    prec_t = pred_side.agg(
        F.sum(F.expr("n_i - parts_i")).cast("long").alias("prec_num"),
        F.sum(F.expr("n_i - 1")).cast("long").alias("pred_links"),
    )
    n_items = a.agg(F.count("*").cast("long").alias("n"))
    row = rec_t.crossJoin(prec_t).crossJoin(n_items)
    scored = row.select(
        "n",
        "pred_links",
        "gold_links",
        F.expr(
            f"CASE WHEN pred_links = 0 THEN {_PPM}"
            f" ELSE {_PPM} * prec_num div pred_links END"
        ).cast("long").alias("prec"),
        F.expr(
            f"CASE WHEN gold_links = 0 THEN {_PPM}"
            f" ELSE {_PPM} * rec_num div gold_links END"
        ).cast("long").alias("rec"),
    )
    return scored.select(
        F.col("n").alias("n_items"),
        "pred_links",
        "gold_links",
        F.col("prec").alias("muc_precision_ppm"),
        F.col("rec").alias("muc_recall_ppm"),
        F.expr(
            "CASE WHEN prec + rec = 0 THEN 0"
            " ELSE 2 * prec * rec div (prec + rec) END"
        ).cast("long").alias("muc_f1_ppm"),
    )


def muc_eval_sql(
    assign_sql: str,
    item_col: str = "item_id",
    pred_col: str = "pred_cluster",
    gold_col: str = "gold_cluster",
) -> str:
    """DuckDB twin of :func:`muc_eval` — identical contingency-cell
    arithmetic."""
    return f"""
WITH a AS (
  SELECT {item_col} AS it,
         cast({pred_col} AS VARCHAR) AS pc,
         cast({gold_col} AS VARCHAR) AS gc
  FROM ({assign_sql})
), d AS (SELECT it, min(pc) AS pc, min(gc) AS gc FROM a GROUP BY it),
cells AS (SELECT pc, gc, count(*) AS n_ij FROM d GROUP BY pc, gc),
gside AS (SELECT gc, sum(n_ij) AS n_j, count(*) AS parts_j
          FROM cells GROUP BY gc),
pside AS (SELECT pc, sum(n_ij) AS n_i, count(*) AS parts_i
          FROM cells GROUP BY pc),
rec_t AS (SELECT cast(sum(n_j - parts_j) AS BIGINT) AS rec_num,
                 cast(sum(n_j - 1) AS BIGINT) AS gold_links FROM gside),
prec_t AS (SELECT cast(sum(n_i - parts_i) AS BIGINT) AS prec_num,
                  cast(sum(n_i - 1) AS BIGINT) AS pred_links FROM pside),
n_t AS (SELECT cast(count(*) AS BIGINT) AS n FROM d),
scored AS (
  SELECT n, pred_links, gold_links,
    CASE WHEN pred_links = 0 THEN 1000000
         ELSE 1000000 * prec_num // pred_links END AS prec,
    CASE WHEN gold_links = 0 THEN 1000000
         ELSE 1000000 * rec_num // gold_links END AS rec
  FROM rec_t, prec_t, n_t
)
SELECT n AS n_items, pred_links, gold_links,
  cast(prec AS BIGINT) AS muc_precision_ppm,
  cast(rec AS BIGINT) AS muc_recall_ppm,
  cast(CASE WHEN prec + rec = 0 THEN 0
       ELSE 2 * prec * rec // (prec + rec) END AS BIGINT) AS muc_f1_ppm
FROM scored
"""


def _hungarian_max(weights: list[list[int]]) -> int:
    """Optimal-assignment VALUE for a rectangular integer weight matrix
    (rows x cols, maximize; unmatched pairs implicitly weight 0).
    Potential-based shortest-augmenting-path Hungarian, O(n^3), pure
    integer arithmetic — the optimum VALUE is unique even when multiple
    argmax assignments tie, which is all CEAF consumes, so no
    tie-breaking policy is needed for determinism."""
    if not weights or not weights[0]:
        return 0
    r, c = len(weights), len(weights[0])
    n = max(r, c)
    # pad to square; maximize -> minimize via (maxw - w)
    maxw = max(max(row) for row in weights)
    cost = [
        [
            maxw - (weights[i][j] if i < r and j < c else 0)
            for j in range(n)
        ]
        for i in range(n)
    ]
    INF = float("inf")
    u = [0] * (n + 1)
    v = [0] * (n + 1)
    p = [0] * (n + 1)  # p[j] = row matched to column j (1-based)
    way = [0] * (n + 1)
    for i in range(1, n + 1):
        p[0] = i
        j0 = 0
        minv = [INF] * (n + 1)
        used = [False] * (n + 1)
        while True:
            used[j0] = True
            i0, delta, j1 = p[j0], INF, 0
            for j in range(1, n + 1):
                if not used[j]:
                    cur = cost[i0 - 1][j - 1] - u[i0] - v[j]
                    if cur < minv[j]:
                        minv[j] = cur
                        way[j] = j0
                    if minv[j] < delta:
                        delta = minv[j]
                        j1 = j
            for j in range(n + 1):
                if used[j]:
                    u[p[j]] += delta
                    v[j] -= delta
                else:
                    minv[j] -= delta
            j0 = j1
            if p[j0] == 0:
                break
        while j0:
            p[j0] = p[way[j0]]
            j0 = way[j0]
    total = 0
    for j in range(1, n + 1):
        i = p[j]
        if 1 <= i <= r and 1 <= j <= c:
            total += weights[i - 1][j - 1]
    return total


def ceaf_eval(
    assign: DataFrame,
    item_col: str = "item_id",
    pred_col: str = "pred_cluster",
    gold_col: str = "gold_cluster",
    max_component_clusters: int = 512,
) -> DataFrame:
    """CEAF clustering scores (Luo EMNLP 2005) — the optimal-alignment
    member of the coreference report family (pairwise + B³ + MUC live
    in clustering_eval/muc_eval; MUC+B³+CEAF-e average to the CoNLL
    score). CEAF one-to-one-aligns gold and predicted clusters to
    maximize total similarity Φ*, under two phi functions:

    * phi3 (mention-based, CEAF-m): phi = |K ∩ R|; P = R = Φ3*/n.
    * phi4 (entity-based, CEAF-e): phi = 2|K ∩ R|/(|K|+|R|);
      P = Φ4*/|pred clusters|, R = Φ4*/|gold clusters|.

    phi4 is quantized per PAIR to truncating integer ppm before the
    matching (the same per-cell truncation discipline as B³: bias
    < 1 ppm per matched pair, bit-stable cross-engine and
    partitioning-invariant — integer Hungarian has a unique optimum
    VALUE).

    Scale shape: the optimal alignment is global, but the nonzero
    contingency cells decompose the cluster bipartite graph into
    CONNECTED COMPONENTS, and an assignment-problem optimum over a
    block-diagonal matrix is the sum of per-block optima — so the
    Hungarian runs PER COMPONENT inside applyInPandas (components are
    the "a gold entity overlaps a handful of predicted entities"
    neighborhoods — tiny in practice), with component ids from the
    linking CC machinery over the cluster graph (cluster-count-sized,
    never item-sized). Components with a single pred or single gold
    cluster (1xN / Mx1 — the overwhelming majority on hub-free data)
    never reach the UDF at all: one-to-one matching keeps exactly one
    pair there, so their optimum is a JVM-side max over the component's
    cells. A RECTANGULAR component (>= 2 clusters on both sides) wider
    than ``max_component_clusters`` on either side fails loud rather
    than going cubic silently (the default 512 bounds one component's
    Hungarian at ~1e8 integer steps; a bigger cap is a deliberate
    choice — note that a single promiscuous cluster, e.g. a catch-all
    'unknown' entity, is exactly what inflates a component, and
    per-document evaluation is the standard way to keep CEAF local). Returns ONE row: (n_items,
    n_pred_clusters, n_gold_clusters, ceaf_m_ppm, ceaf_e_precision_ppm,
    ceaf_e_recall_ppm, ceaf_e_f1_ppm)."""
    from ..operators.linking import connected_components

    a = (
        assign.select(
            F.col(item_col).alias("it"),
            F.col(pred_col).cast("string").alias("pc"),
            F.col(gold_col).cast("string").alias("gc"),
        )
        .groupBy("it")
        .agg(F.min("pc").alias("pc"), F.min("gc").alias("gc"))
    )
    cells = a.groupBy("pc", "gc").agg(
        F.count("*").cast("long").alias("n_ij")
    )
    # bipartite cluster graph: hash-id the two sides into one long id
    # space (a collision merely merges two components — block-diagonal
    # optima are additive, so the matching VALUE is unchanged)
    cells = cells.withColumn(
        "pid", F.xxhash64(F.concat(F.lit("P|"), F.col("pc")))
    ).withColumn("gid", F.xxhash64(F.concat(F.lit("G|"), F.col("gc"))))
    edges = cells.select(
        F.col("pid").alias("a_id"), F.col("gid").alias("b_id")
    )
    verts = edges.select(F.col("a_id").alias("mention_id")).union(
        edges.select(F.col("b_id").alias("mention_id"))
    ).distinct()
    comp = connected_components(verts, edges).withColumnRenamed(
        "mention_id", "pid"
    )
    with_comp = cells.join(comp, "pid").select(
        "component_id", "pc", "gc", "n_ij"
    )
    # TRIVIAL components first, JVM-side: when a component has a single
    # pred cluster (1xN) or a single gold cluster (Mx1), one-to-one
    # matching can keep only ONE pair — the max-weight cell — so no
    # Hungarian is needed. These are the overwhelming majority on
    # hub-free data (a 15k-component sf0.1 run spent ~30s of ~38s on
    # per-group pandas overhead before this split; the UDF now sees
    # only genuinely rectangular components).
    wp = Window.partitionBy("component_id", "pc")
    wg = Window.partitionBy("component_id", "gc")
    enriched = (
        with_comp.withColumn("n_i", F.sum("n_ij").over(wp))
        .withColumn("n_j", F.sum("n_ij").over(wg))
        .withColumn(
            "w_e",
            F.expr(f"2 * n_ij * {_PPM}L div (n_i + n_j)").cast("long"),
        )
        .withColumn(
            "n_pred",
            F.size(
                F.collect_set("pc").over(Window.partitionBy("component_id"))
            ),
        )
        .withColumn(
            "n_gold",
            F.size(
                F.collect_set("gc").over(Window.partitionBy("component_id"))
            ),
        )
    )
    trivial = (
        enriched.where((F.col("n_pred") == 1) | (F.col("n_gold") == 1))
        .groupBy("component_id")
        .agg(
            F.max("n_ij").cast("long").alias("phi_m"),
            F.max("w_e").cast("long").alias("phi_e_ppm"),
            F.min("n_pred").cast("long").alias("n_pred"),
            F.min("n_gold").cast("long").alias("n_gold"),
        )
        .drop("component_id")
    )
    rect = enriched.where(
        (F.col("n_pred") > 1) & (F.col("n_gold") > 1)
    ).select("component_id", "pc", "gc", "n_ij")

    import pandas as pd

    def solve(pdf: pd.DataFrame) -> pd.DataFrame:
        preds = sorted(pdf["pc"].unique())
        golds = sorted(pdf["gc"].unique())
        if (
            len(preds) > max_component_clusters
            or len(golds) > max_component_clusters
        ):
            raise ValueError(
                "ceaf_eval: contingency component has "
                f"{len(preds)}x{len(golds)} clusters, beyond "
                f"max_component_clusters={max_component_clusters}; "
                "raise the cap or pre-split the evaluation (e.g. per "
                "document) if this is expected"
            )
        pi = {p: i for i, p in enumerate(preds)}
        gi = {g: i for i, g in enumerate(golds)}
        m = [[0] * len(golds) for _ in preds]
        for pc, gc, nij in zip(pdf["pc"], pdf["gc"], pdf["n_ij"]):
            m[pi[pc]][gi[gc]] = int(nij)
        n_i = [sum(row) for row in m]
        n_j = [sum(m[i][j] for i in range(len(preds)))
               for j in range(len(golds))]
        w_e = [
            [
                (2 * m[i][j] * _PPM) // (n_i[i] + n_j[j])
                for j in range(len(golds))
            ]
            for i in range(len(preds))
        ]
        return pd.DataFrame(
            {
                "phi_m": [_hungarian_max(m)],
                "phi_e_ppm": [_hungarian_max(w_e)],
                "n_pred": [len(preds)],
                "n_gold": [len(golds)],
            }
        )

    per_comp = rect.groupBy("component_id").applyInPandas(
        solve,
        schema="phi_m long, phi_e_ppm long, n_pred long, n_gold long",
    ).unionByName(trivial)
    totals = per_comp.agg(
        F.coalesce(F.sum("phi_m"), F.lit(0)).cast("long").alias("phi_m"),
        F.coalesce(F.sum("phi_e_ppm"), F.lit(0)).cast("long").alias(
            "phi_e"
        ),
        F.coalesce(F.sum("n_pred"), F.lit(0)).cast("long").alias("r"),
        F.coalesce(F.sum("n_gold"), F.lit(0)).cast("long").alias("k"),
    )
    n_items = a.agg(F.count("*").cast("long").alias("n"))
    scored = totals.crossJoin(F.broadcast(n_items)).select(
        "n",
        "r",
        "k",
        "phi_m",
        F.expr(
            f"CASE WHEN r = 0 THEN {_PPM} ELSE phi_e div r END"
        ).cast("long").alias("prec_e"),
        F.expr(
            f"CASE WHEN k = 0 THEN {_PPM} ELSE phi_e div k END"
        ).cast("long").alias("rec_e"),
    )
    return scored.select(
        F.col("n").alias("n_items"),
        F.col("r").alias("n_pred_clusters"),
        F.col("k").alias("n_gold_clusters"),
        F.expr(
            f"CASE WHEN n = 0 THEN {_PPM}"
            f" ELSE {_PPM} * phi_m div n END"
        ).cast("long").alias("ceaf_m_ppm"),
        F.col("prec_e").alias("ceaf_e_precision_ppm"),
        F.col("rec_e").alias("ceaf_e_recall_ppm"),
        F.expr(
            "CASE WHEN prec_e + rec_e = 0 THEN 0"
            " ELSE 2 * prec_e * rec_e div (prec_e + rec_e) END"
        ).cast("long").alias("ceaf_e_f1_ppm"),
    )
