"""Deduplication operators for large-scale training-data pipelines.

All variants are pure DataFrame/Catalyst plans (no Python UDFs) and are
formulated to be *cross-engine deterministic* — hashing is md5-hex-string
based and similarity comparisons are integer arithmetic, so a DuckDB oracle
produces bit-identical results (the driver's correctness gate).

* exact dedup        — md5(content) group-by (hash partial agg, one shuffle)
* minhash + LSH      — shingle -> k md5-string minhashes -> banded
                       signatures -> bucket self-join -> candidate pairs.
                       Shuffles: one agg by doc, one self-join by band key.
                       At 100TB the band join is the scale path: candidates
                       are near-linear in corpus size for fixed bands.
* n-gram jaccard     — inverted-index pair generation (explode shingles,
                       self-join on shingle, count = intersection) with
                       integer threshold test inter*10 >= t*10*(|a|+|b|-inter).
* simhash            — 16-bit sign-aggregated md5-nibble fingerprint;
                       near-dups share the value (or a band of it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from .partitioning import checkpoint_nostats as _ckpt_nostats

# --- shingling ---------------------------------------------------------------


def word_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, shingle) rows: distinct word n-grams (space-joined).

    Documents with fewer than n words emit NO shingles (matching the DuckDB
    oracle's empty generate_series(1,0)) — a plain greatest(...,0) guard
    would feed sequence(1,0), which Spark evaluates as the DESCENDING
    [1, 0] and slice(words, 0, n) then throws.
    """
    words = F.split(F.col(text_col), " ")
    if n == 1:
        sh = F.array_distinct(words)
    else:
        w = f"split({text_col}, ' ')"
        sh = F.array_distinct(
            F.expr(
                f"case when size({w}) >= {n} then "
                f"transform(sequence(1, size({w}) - {n - 1}),"
                f" i -> concat_ws(' ', slice({w}, i, {n}))) "
                f"else array() end"
            )
        )
    from .partitioning import ensure_parallelism

    # the explode multiplies rows ~50x BEFORE the first shuffle: make sure
    # it isn't running on a single small-file input split (no-op at scale)
    return ensure_parallelism(df).select(
        F.col(id_col).alias("id"), F.explode(sh).alias("shingle")
    )


# --- exact -------------------------------------------------------------------


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per distinct content hash with canonical id + group size."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_md5"))
        .agg(F.min(id_col).alias("canonical_id"), F.count("*").alias("n_dups"))
    )


# --- minhash + LSH -----------------------------------------------------------


def minhash_signatures(
    shingled: DataFrame, num_hashes: int = 8
) -> DataFrame:
    """k md5-string minhashes per id. Hash family: md5(i || '#' || shingle);
    the min is taken lexicographically on the hex string — identical in any
    engine with md5, no 64-bit arithmetic needed."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}#"), F.col("shingle")))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return shingled.groupBy("id").agg(*aggs)


def band_signatures(
    signatures: DataFrame, bands: int = 4, rows_per_band: int = 2
) -> DataFrame:
    """(id, band, sig) rows from minhash signatures — the LSH bucket keys.
    This is the table a production dedup pipeline PERSISTS as its index:
    incremental batches join against it instead of re-pairing the corpus
    (see incremental_near_dup)."""
    band_rows = []
    for b in range(bands):
        cols = [
            F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)
        ]
        band_rows.append(
            F.struct(F.lit(b).alias("band"), F.concat_ws("|", *cols).alias("sig"))
        )
    return signatures.select(
        "id", F.explode(F.array(*band_rows)).alias("bk")
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.sig").alias("sig"))


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = 4, rows_per_band: int = 2
) -> DataFrame:
    """Banded LSH: ids sharing any band signature become a candidate pair.
    Returns (a_id, b_id, n_shared_bands)."""
    banded = band_signatures(signatures, bands, rows_per_band)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, ["band", "sig"])
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
        .agg(F.count("*").alias("n_shared_bands"))
    )


# --- cluster canonicalization ------------------------------------------------


def near_dup_clusters(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    rows_per_band: int = 2,
    max_iter: int = 15,
) -> DataFrame:
    """(doc_id, cluster_id): transitive near-dup clusters — minhash-LSH
    candidate pairs as edges, connected components (min-label propagation)
    as the cluster assignment. cluster_id is the min doc id reachable, so
    A~B, B~C collapses all three even when A and C share no band (the
    transitivity real dedup pipelines need: near-dup chains are common in
    mirrored / templated web text).

    Scale shape: the edge set is the banded-LSH self-join (near-linear in
    corpus size for fixed bands), and the component loop is
    O(cluster diameter) rounds over ONLY the docs that touch an edge —
    the overwhelming singleton majority never enters the iteration
    (operators/linking.py:connected_components, incl. hub salting)."""
    from ..operators.linking import connected_components

    sh = word_shingles(docs, id_col, text_col, n=n)
    # materialize the pair edges ONCE: connected_components consumes the
    # edge set from several actions (vertex union, isolated anti-join,
    # size count, per-round propagation) and each would otherwise re-run
    # the full shingle -> minhash -> band self-join (measured 15.3s -> ~6s
    # at sf0.1). At cluster scale this is the persisted candidate-pair
    # table every dedup pipeline materializes anyway.
    pairs = (
        lsh_candidate_pairs(
            minhash_signatures(sh, num_hashes), bands, rows_per_band
        )
        .select("a_id", "b_id")
        .transform(_ckpt_nostats)
    )
    labels = connected_components(
        docs.select(F.col(id_col).alias("mention_id")),
        pairs,
        max_iter=max_iter,
    )
    return labels.select(
        F.col("mention_id").alias("doc_id"),
        F.col("component_id").alias("cluster_id"),
    )


def near_dedup_keep(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", **kw
) -> DataFrame:
    """Keep-one-per-cluster canonicalization: the min doc id of every
    near-dup cluster survives (singletons survive trivially); all other
    cluster members are dropped. Left-semi join keeps the full original
    rows without reshuffling the corpus on content."""
    keep = (
        near_dup_clusters(docs, id_col, text_col, **kw)
        .where(F.col("doc_id") == F.col("cluster_id"))
        .select(F.col("doc_id").alias(id_col))
    )
    return docs.join(keep, id_col, "left_semi")


# --- incremental (batch-vs-corpus) -------------------------------------------


def doc_band_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    rows_per_band: int = 2,
) -> DataFrame:
    """documents -> (id, band, sig) LSH index rows (shingle -> minhash ->
    band), the persisted state of the incremental dedup pipeline."""
    return band_signatures(
        minhash_signatures(word_shingles(docs, id_col, text_col, n), num_hashes),
        bands,
        rows_per_band,
    )


def incremental_near_dup(
    index: DataFrame, new_bands: DataFrame
) -> DataFrame:
    """Deduplicate a NEW batch against an existing corpus without ever
    re-pairing the corpus with itself — the daily-increment path every
    production dedup runs (the corpus-side cost of the batch variant grows
    with total corpus size; this grows with batch size x collision rate).

    ``index``: the persisted (id, band, sig) table of previously KEPT
    docs (doc_band_signatures output). ``new_bands``: same for the
    incoming batch. Returns (doc_id, status) for every new doc:

    * ``dup_of_corpus`` — shares an LSH band with any indexed doc;
    * ``dup_in_batch``  — survives the corpus check but shares a band
      with a LOWER-id surviving batch doc (greedy pair-drop, matching
      the curation funnel's near-dup stage);
    * ``kept``          — append these docs' band rows to the index.

    Survivor-only indexing means a batch doc dropped as dup_of_corpus
    never shadows later batches — exactly the batch pipeline's semantics
    when the near-dup relation is closed under pairing (identical docs);
    for chain-shaped near-dups the greedy order is the batch arrival
    order, which is the standard (and documented) incremental trade.

    Scale shape: one shuffle join of the (small) batch band table against
    the index on (band, sig) — with the index bucketed/partitioned on
    (band, sig) this is a co-located probe; hot bands (boilerplate
    shingles) are index-side rows that AQE skew-splitting spreads. The
    within-batch self-join touches only the batch."""
    ids = new_bands.select("id").distinct()
    cross = (
        new_bands.alias("n")
        .join(
            index.alias("e"),
            (F.col("n.band") == F.col("e.band"))
            & (F.col("n.sig") == F.col("e.sig")),
        )
        .select(F.col("n.id").alias("id"))
        .distinct()
    )
    remaining = new_bands.join(cross, "id", "left_anti")
    a = remaining.alias("a")
    b = remaining.alias("b")
    within = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("b.id").alias("id"))
        .distinct()
    )
    return (
        ids.join(cross.withColumn("_c", F.lit(1)), "id", "left")
        .join(within.withColumn("_w", F.lit(1)), "id", "left")
        .select(
            F.col("id").alias("doc_id"),
            F.when(F.col("_c") == 1, F.lit("dup_of_corpus"))
            .when(F.col("_w") == 1, F.lit("dup_in_batch"))
            .otherwise(F.lit("kept"))
            .alias("status"),
        )
    )


# --- n-gram jaccard ----------------------------------------------------------


def jaccard_pairs(
    shingled: DataFrame, threshold_pct: int = 50, max_df: int | None = None
) -> DataFrame:
    """Near-dup pairs by shingle-set jaccard >= threshold_pct/100, via an
    inverted index (shingle self-join). Pure integer comparison:
    100*inter >= pct*(|a| + |b| - inter).

    ``max_df`` drops shingles occurring in more than that many documents
    before pair generation — the standard stopword guard that keeps the
    inverted-index join near-linear at corpus scale (a shingle shared by k
    docs emits k^2 candidate rows). Sizes are computed BEFORE the cap so the
    jaccard denominator stays exact; the cap only loses candidate pairs
    whose overlap is dominated by ultra-common shingles.
    """
    sizes = shingled.groupBy("id").agg(F.count("*").alias("sz"))
    if max_df is not None:
        hot = (
            shingled.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .where(F.col("df") > max_df)
        )
        shingled = shingled.join(F.broadcast(hot), "shingle", "left_anti")
    a = shingled.alias("a")
    b = shingled.alias("b")
    inter = (
        a.join(b, "shingle")
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("a_id"), F.col("sz").alias("a_sz"))
    sb = sizes.select(F.col("id").alias("b_id"), F.col("sz").alias("b_sz"))
    return (
        inter.join(sa, "a_id")
        .join(sb, "b_id")
        .where(
            100 * F.col("inter")
            >= threshold_pct * (F.col("a_sz") + F.col("b_sz") - F.col("inter"))
        )
        .select("a_id", "b_id", "inter", "a_sz", "b_sz")
    )


# --- simhash -----------------------------------------------------------------

_HIGH_NIBBLE = ("8", "9", "a", "b", "c", "d", "e", "f")


def simhash16(shingled: DataFrame) -> DataFrame:
    """16-bit simhash per id from word/shingle md5 nibbles: bit k is the
    sign of sum over shingles of (+1 if hex digit k of md5(shingle) has its
    high bit set else -1). Deterministic across engines (ties -> 0)."""
    nibble_in = ",".join(f"'{c}'" for c in _HIGH_NIBBLE)
    sums = [
        F.sum(
            F.expr(
                f"case when substring(md5(shingle), {k + 1}, 1) in ({nibble_in})"
                " then 1 else -1 end"
            )
        ).alias(f"s{k}")
        for k in range(16)
    ]
    per_doc = shingled.groupBy("id").agg(*sums)
    bit_expr = " + ".join(
        f"(case when s{k} > 0 then {1 << k} else 0 end)" for k in range(16)
    )
    return per_doc.select(
        "id", F.expr(f"cast({bit_expr} as bigint)").alias("simhash")
    )


def simhash_sql(id_col: str, text_col: str, table: str) -> str:
    """DuckDB oracle SQL mirroring simhash16 over single-word shingles."""
    nibble_in = ",".join(f"'{c}'" for c in _HIGH_NIBBLE)
    sums = ", ".join(
        f"sum(case when substring(md5(shingle), {k + 1}, 1) in ({nibble_in})"
        f" then 1 else -1 end) as s{k}"
        for k in range(16)
    )
    bit_expr = " + ".join(
        f"(case when s{k} > 0 then {1 << k} else 0 end)" for k in range(16)
    )
    return f"""
WITH shingled AS (
  SELECT {id_col} AS id, unnest(list_distinct(string_split({text_col}, ' '))) AS shingle
  FROM {table}
), per_doc AS (
  SELECT id, {sums} FROM shingled GROUP BY id
)
SELECT id, cast({bit_expr} AS BIGINT) AS simhash FROM per_doc
"""


def duplicate_span_stats(
    df: DataFrame, id_col: str, text_col: str, n: int = 10
) -> DataFrame:
    """(id, n_spans, n_dup_spans, dup_span_ppm): per document, how many of
    its word n-gram spans also occur ELSEWHERE in the corpus (other
    documents, or repeated within this one) — the exact-substring
    deduplication signal of Lee et al. 2022 ("Deduplicating Training Data
    Makes Language Models Better"), where training spans duplicated across
    the corpus are dropped or down-weighted. A true suffix array finds
    maximal spans; fixed-n span hashing is the distributed approximation
    production pipelines run (n=10..50 words), and the span POSITIONS are
    recoverable by keeping the (id, pos) explode below.

    Plan: positional (not distinct) n-gram explode -> md5 span keys ->
    corpus-wide span-count aggregation (map-side combined; hot boilerplate
    spans collapse per mapper) -> join back span occurrences against the
    duplicated-key set -> per-doc counts. Two shuffles; the join's build
    side is only the DUPLICATED keys (corpus-dependent but far smaller
    than the span stream; for web boilerplate it is the long tail that
    vanishes, not the head). Integer ppm output — bit-exact oracle."""
    w = f"split({text_col}, ' ')"
    grams = F.expr(
        f"case when size({w}) >= {n} then "
        f"transform(sequence(1, size({w}) - {n - 1}),"
        f" i -> concat_ws(' ', slice({w}, i, {n}))) "
        f"else array() end"
    )
    from .partitioning import ensure_parallelism

    occ = ensure_parallelism(df).select(
        F.col(id_col).alias("id"), F.explode_outer(grams).alias("g")
    ).select("id", F.md5("g").alias("h"))
    # collapse the (corpus-sized) span stream to per-(id, h) counts ONCE
    # and materialize: totals, the corpus-wide key counts, and the dup
    # probe all derive from this far smaller table — without the
    # checkpoint, each consumer would re-run the explode+md5 pass over
    # the full corpus (Catalyst does not dedupe common subtrees).
    pg = (
        occ.groupBy("id", "h")
        .agg(F.count("h").cast("bigint").alias("k"))
        .transform(_ckpt_nostats)
    )
    dup_keys = (
        pg.where(F.col("h").isNotNull())
        .groupBy("h")
        .agg(F.sum("k").alias("c"))
        .where(F.col("c") > 1)
        .select("h")
    )
    dup_occ = pg.join(dup_keys, "h", "left_semi").groupBy("id").agg(
        F.sum("k").cast("bigint").alias("n_dup_spans")
    )
    totals = pg.groupBy("id").agg(
        F.coalesce(
            F.sum(F.when(F.col("h").isNotNull(), F.col("k"))),
            F.lit(0),
        )
        .cast("bigint")
        .alias("n_spans")
    )
    return totals.join(dup_occ, "id", "left").select(
        "id",
        "n_spans",
        F.coalesce("n_dup_spans", F.lit(0).cast("bigint")).alias(
            "n_dup_spans"
        ),
        F.expr(
            "case when n_spans = 0 then 0L else"
            " (coalesce(n_dup_spans, 0L) * 1000000) div n_spans end"
        ).alias("dup_span_ppm"),
    )


def containment_pairs(
    shingled: DataFrame,
    threshold_ppm: int = 500_000,
    max_df: int | None = None,
) -> DataFrame:
    """ASYMMETRIC near-dup: shingle-set containment C(A in B) =
    |A ∩ B| / |A| (Broder 1997's second resemblance measure). Jaccard
    misses the quote/subset case — a short document wholly contained in
    a long one scores inter/(big union) — while containment of the
    SMALLER side is 1.0 there; this is the detector for quotes,
    boilerplate inclusion, and partial copies that symmetric dedup
    passes over.

    Same inverted-index plan and ``max_df`` stopword-shingle guard as
    :func:`jaccard_pairs` (sizes computed BEFORE the cap so the
    denominator stays exact). Per unordered candidate pair the
    CONTAINED side is the smaller shingle set (ties: smaller id), and
    containment_ppm = inter * 1e6 div contained_sz — truncating
    integers end to end, so the DuckDB oracle is bit-exact.

    Returns (contained_id, container_id, inter, contained_sz,
    container_sz, containment_ppm) for pairs at or above
    ``threshold_ppm``."""
    if not 0 <= threshold_ppm <= 1_000_000:
        raise ValueError(
            f"containment_pairs: bad threshold_ppm {threshold_ppm}"
        )
    sizes = shingled.groupBy("id").agg(F.count("*").alias("sz"))
    if max_df is not None:
        hot = (
            shingled.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .where(F.col("df") > max_df)
        )
        shingled = shingled.join(F.broadcast(hot), "shingle", "left_anti")
    a = shingled.alias("a")
    b = shingled.alias("b")
    inter = (
        a.join(b, "shingle")
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("a_id"), F.col("sz").alias("a_sz"))
    sb = sizes.select(F.col("id").alias("b_id"), F.col("sz").alias("b_sz"))
    sized = inter.join(sa, "a_id").join(sb, "b_id")
    a_contained = (F.col("a_sz") < F.col("b_sz")) | (
        (F.col("a_sz") == F.col("b_sz")) & (F.col("a_id") < F.col("b_id"))
    )
    oriented = sized.select(
        F.when(a_contained, F.col("a_id")).otherwise(F.col("b_id")).alias(
            "contained_id"
        ),
        F.when(a_contained, F.col("b_id")).otherwise(F.col("a_id")).alias(
            "container_id"
        ),
        "inter",
        F.when(a_contained, F.col("a_sz")).otherwise(F.col("b_sz")).alias(
            "contained_sz"
        ),
        F.when(a_contained, F.col("b_sz")).otherwise(F.col("a_sz")).alias(
            "container_sz"
        ),
    ).withColumn(
        "containment_ppm",
        F.expr("inter * 1000000L div contained_sz").cast("long"),
    )
    return oriented.where(F.col("containment_ppm") >= threshold_ppm)


def _ppjoin_prefixes(shingled: DataFrame, threshold_pct: int) -> DataFrame:
    """(id, shingle) restricted to each document's PREFIX under the
    global (df asc, shingle asc) rarest-first order: the first
    sz - ceil(t*sz) + 1 tokens. Prefix-filter guarantee (Chaudhuri
    2006 / Bayardo 2007): two sets with jaccard >= t = pct/100 must
    share at least one prefix token, so the prefix inverted index
    loses no qualifying pair. Integer ceil: (pct*sz + 99) div 100."""
    from pyspark.sql import Window

    sizes = shingled.groupBy("id").agg(F.count("*").alias("sz"))
    df = shingled.groupBy("shingle").agg(F.count("*").alias("df"))
    w = Window.partitionBy("id").orderBy(F.asc("df"), F.asc("shingle"))
    return (
        shingled.join(df, "shingle")
        .select("id", "shingle", F.row_number().over(w).alias("pos"))
        .join(sizes, "id")
        .where(
            F.col("pos")
            <= F.col("sz")
            - F.expr(f"({threshold_pct} * sz + 99) div 100")
            + 1
        )
        .select("id", "shingle")
    )


def ppjoin_pairs(
    shingled: DataFrame, threshold_pct: int = 50
) -> DataFrame:
    """EXACT set-similarity self-join by prefix filtering (the
    AllPairs/PPJoin family — Bayardo 2007 "Scaling Up All Pairs
    Similarity Search", Xiao 2008 PPJoin): identical result to
    jaccard_pairs with NO df cap, but candidates come from an inverted
    index over each document's RAREST-token prefix only, then verify
    exactly. Unlike the minhash/LSH and capped-inverted-index passes
    this loses nothing and approximates nothing — the complement for
    compliance-grade dedup where a missed 90%-duplicate is a data leak.

    Scale shape: the candidate join fans out per PREFIX token, and
    prefix tokens are the globally rarest — the hot-shingle k^2 blowup
    the max_df cap guards against cannot involve a hot token unless a
    document is almost entirely hot tokens. Verification joins the full
    shingle sets for candidate pairs only (keyed on (id, shingle)).
    The window rank is per-document (never global); the df table is a
    shingle-keyed aggregation.

    Returns (a_id, b_id, inter, a_sz, b_sz) with the same integer
    threshold semantics as jaccard_pairs:
    100*inter >= pct*(a_sz + b_sz - inter)."""
    # pin the prefix self-join's partition count (round 6): the
    # candidate generation per shingle group is compute-dense but
    # byte-tiny, so AQE's byte-based coalescing ran it on ~3 tasks
    # (2.7s stages in the event log — same class as edit_distance_join).
    # repartition(N, shingle) BEFORE the checkpoint makes the
    # materialized table carry hash(shingle) partitioning, so the
    # self-join needs no exchange at all and runs at N tasks; the
    # explicit repartition(N, keys) before dropDuplicates replaces the
    # dedup exchange the same way.
    n_part = shingled.sparkSession.sparkContext.defaultParallelism
    pre = (
        _ppjoin_prefixes(shingled, threshold_pct)
        .repartition(n_part, "shingle")
        .transform(_ckpt_nostats)
    )
    cand = (
        pre.alias("a")
        .join(pre.alias("b"), "shingle")
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id")
        )
        .repartition(n_part, "a_id", "b_id")
        .dropDuplicates(["a_id", "b_id"])
    )
    sizes = shingled.groupBy("id").agg(F.count("*").alias("sz"))
    sa = shingled.select(F.col("id").alias("a_id"), "shingle")
    sb = shingled.select(F.col("id").alias("b_id"), "shingle")
    inter = (
        cand.join(sa, "a_id")
        .join(sb, ["b_id", "shingle"])
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(
            sizes.select(F.col("id").alias("a_id"), F.col("sz").alias("a_sz")),
            "a_id",
        )
        .join(
            sizes.select(F.col("id").alias("b_id"), F.col("sz").alias("b_sz")),
            "b_id",
        )
        .where(
            100 * F.col("inter")
            >= threshold_pct * (F.col("a_sz") + F.col("b_sz") - F.col("inter"))
        )
    )
    return out.select("a_id", "b_id", "inter", "a_sz", "b_sz")
