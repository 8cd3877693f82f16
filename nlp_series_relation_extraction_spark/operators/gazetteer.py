"""Distributed gazetteer entity matching — dictionary-driven mention
detection when the dictionary does NOT fit in a broadcast.

The reference's labeler (dataset/data_utils.py:114-161) substring-scans
each sentence against a per-example SPO vocabulary that rides inside the
row; a real KG-construction pipeline instead matches EVERY document
against ONE corpus-wide gazetteer (Wikidata labels, product catalogs:
1e7-1e9 names). At that size `broadcast()` is off the table, so the
match must be a JOIN — and the join key decides everything:

* anchoring every phrase on its FIRST token floods the shuffle with
  stopword candidates ("the big lebowski" anchors on "the");
* anchoring on the phrase's RAREST token (min corpus occurrence count,
  ties broken by the earliest offset) makes the candidate volume
  sum-of-rarest-counts — the inverted-index trick ElasticSearch
  percolators and Aho-Corasick sharding both reduce to.

Stages (all DataFrame ops, no UDFs, no collect):
  1. token stream: posexplode(split(text)) — one narrow pass;
  2. corpus token counts: alphabet-sized aggregate;
  3. gazetteer prep: explode phrase tokens, LEFT-join counts (absent
     token -> count 0 -> phrase can never match, candidates vanish),
     per-phrase argmin((count, offset)) window picks the anchor;
  4. candidate generation: token-stream ⋈ anchors on the token value
     (the one big shuffle — skew-safe to the extent rare anchors are
     rare; an all-stopword phrase still hot-keys and would want the
     salted_join from operators/linking.py);
  5. span verify: candidates re-join the doc token array on doc id
     (co-partitioned) and compare slice(toks, start, n) = phrase
     tokens — array equality, JVM-side;
  6. maximal-match dedup: drop matches strictly contained in a longer
     match of the same document (per-doc overlap self-join; per-doc
     match counts are small by construction).

Every stage is SQL-expressible, so the whole operator carries a
bit-exact DuckDB twin in plans/queries.py (gazetteer_match).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _token_stream(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, pos, tok): 0-based positional whitespace tokens, empty
    tokens kept (positions must stay aligned with the raw split array
    the verifier slices)."""
    return docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "tok"),
    )


def prepare_gazetteer(
    docs: DataFrame,
    gazetteer: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    entity_col: str = "entity_id",
    name_col: str = "name",
) -> DataFrame:
    """Anchor every gazetteer phrase on its rarest-in-corpus token.
    Returns (entity_id, name, g_toks, n_toks, anchor, anchor_offset)
    with anchor_offset 0-based. Phrases with empty names are dropped;
    a phrase containing a token absent from the corpus keeps count 0
    and simply generates no candidates downstream."""
    counts = (
        _token_stream(docs, id_col, text_col)
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").cast("long").alias("tok_count"))
    )
    g = gazetteer.select(
        F.col(entity_col).alias("entity_id"),
        F.col(name_col).alias("name"),
        F.split(F.col(name_col), " ").alias("g_toks"),
    ).where(F.size("g_toks") >= 1)
    g_tok = g.select(
        "entity_id",
        "name",
        "g_toks",
        F.size("g_toks").alias("n_toks"),
        F.posexplode("g_toks").alias("offset", "gtok"),
    ).where(F.col("gtok") != "")
    ranked = g_tok.join(
        counts, g_tok["gtok"] == counts["tok"], "left"
    ).select(
        "entity_id",
        "name",
        "g_toks",
        "n_toks",
        "offset",
        "gtok",
        F.coalesce(F.col("tok_count"), F.lit(0)).alias("cnt"),
    )
    w = Window.partitionBy("entity_id", "name").orderBy("cnt", "offset")
    # pin the window's exchange: the per-phrase argmin sorts MANY tiny
    # (entity, name) groups — byte-small, so AQE coalesced the window
    # stage to ONE task (round-6 event log: a 4.1s single-task Window
    # stage). repartition(N, keys) satisfies the window's required
    # distribution, so this replaces the implicit exchange, it does not
    # add one.
    n_part = docs.sparkSession.sparkContext.defaultParallelism
    return (
        ranked.repartition(n_part, "entity_id", "name")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "entity_id",
            "name",
            "g_toks",
            "n_toks",
            F.col("gtok").alias("anchor"),
            F.col("offset").alias("anchor_offset"),
        )
    )


def gazetteer_match(
    docs: DataFrame,
    gazetteer: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    entity_col: str = "entity_id",
    name_col: str = "name",
) -> DataFrame:
    """Match every document against the gazetteer; returns one row per
    maximal mention: (doc_id, start_tok, end_tok, entity_id, name)
    with 0-based inclusive token spans. Matches strictly contained in
    a longer match of the same document are dropped (maximal munch);
    equal spans from distinct gazetteer entries are all kept — span
    disambiguation is entity linking's job, not detection's."""
    anchors = prepare_gazetteer(
        docs, gazetteer, id_col, text_col, entity_col, name_col
    )
    toks = _token_stream(docs, id_col, text_col)
    cand = (
        toks.join(anchors, toks["tok"] == anchors["anchor"])
        .select(
            "id",
            (F.col("pos") - F.col("anchor_offset")).alias("start_tok"),
            "entity_id",
            "name",
            "g_toks",
            "n_toks",
        )
        .where(F.col("start_tok") >= 0)
    )
    doc_arrays = docs.select(
        F.col(id_col).alias("id"),
        F.split(F.col(text_col), " ").alias("toks"),
    )
    verified = (
        cand.join(doc_arrays, "id")
        .where(
            F.expr("slice(toks, start_tok + 1, n_toks)") == F.col("g_toks")
        )
        .select(
            F.col("id").alias(id_col),
            "start_tok",
            (F.col("start_tok") + F.col("n_toks") - 1).alias("end_tok"),
            "entity_id",
            "name",
        )
        .distinct()
    )
    # maximal munch via two running-max windows instead of the per-doc
    # containment self-join (round 6, guide §3 "exploding joins": the
    # anti-join built M^2 span pairs per document; sorting once is
    # O(M log M)). A span m is strictly contained in a longer span s of
    # the same doc iff s.start <= m.start, s.end >= m.end and s is
    # strictly longer — equivalently, ordering spans by start:
    #   * some span with start < m.start has end >= m.end (it is then
    #     strictly longer automatically), or
    #   * some span with start = m.start has end > m.end.
    # Both are running maxima of end over RANGE frames keyed on
    # start_tok; equal spans from distinct gazetteer entries survive
    # (neither test fires), preserving the join's exact semantics.
    w_prev = (
        Window.partitionBy(id_col)
        .orderBy("start_tok")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_same = (
        Window.partitionBy(id_col)
        .orderBy("start_tok")
        .rangeBetween(0, 0)
    )
    return (
        verified.withColumn("_mx_prev", F.max("end_tok").over(w_prev))
        .withColumn("_mx_same", F.max("end_tok").over(w_same))
        .where(
            F.coalesce(
                F.col("_mx_prev") < F.col("end_tok"), F.lit(True)
            )
            & (F.col("_mx_same") <= F.col("end_tok"))
        )
        .drop("_mx_prev", "_mx_same")
    )
