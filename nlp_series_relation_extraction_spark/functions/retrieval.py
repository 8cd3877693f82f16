"""Distributed BM25 retrieval over chunked documents (the RAG index path).

Completes the chunking story (functions/curation.py:chunk_documents): build
an inverted index over the chunk corpus, score a query set with BM25
(Robertson/Sparck Jones idf in the Lucene "+1" form, k1 = 1.2, b = 0.75),
return the top-k chunks per query.

Determinism discipline (the repo's oracle convention, cf. functions/lm.py):
the ONLY implementation-defined operation in BM25 is the idf logarithm —
everything else is integer counts and single-expression IEEE float math
that Spark and DuckDB evaluate bit-identically. So idf is quantized to an
integer ppm immediately after the ln, each matched term's score is
quantized to integer milli-points, and the final score is a SUM OF
INTEGERS — order-insensitive, bit-exact cross-engine, hash-matchable.

Scale shape (100 TB chunk corpus):
* index build = one shuffle: explode terms, hash-aggregate (chunk, term)
  tf with map-side combine; df aggregates the (already compressed) posting
  table, not the corpus.
* scoring joins the posting table against the query-term table — the query
  side is tiny and BROADCAST, so the corpus-sized side never shuffles for
  the join; the only corpus-sized exchange is the per-(query, chunk) score
  aggregation, keyed by (query_id, doc_id, chunk_idx) — naturally spread.
* hot stopword terms both skew the join AND carry near-zero idf;
  ``max_df_ratio`` prunes terms present in more than that fraction of
  chunks (KenLM/stopword practice), bounding the posting fan-out a single
  query term can trigger.
* top-k per query is a window over each query's candidate set — partitioned
  by query_id, so parallelism = number of queries; candidate sets are
  already score-aggregated (small).
"""

from __future__ import annotations

from .smalldf import local_df

from pyspark.sql import DataFrame, Window, functions as F

BM25_K1 = 1.2
BM25_B = 0.75


def chunk_postings(chunks: DataFrame) -> DataFrame:
    """(doc_id, chunk_idx, term, tf, dl): the inverted-index posting table.
    One shuffle (partial-agg combined)."""
    toks = chunks.select(
        "doc_id",
        "chunk_idx",
        F.split("chunk_text", " ").alias("ws"),
    ).select(
        "doc_id",
        "chunk_idx",
        F.size("ws").alias("dl"),
        F.explode("ws").alias("term"),
    )
    return toks.groupBy("doc_id", "chunk_idx", "dl", "term").agg(
        F.count("*").cast("long").alias("tf")
    )


def bm25_topk(
    chunks: DataFrame,
    queries: DataFrame,
    k: int = 5,
    max_df_ratio: float = 0.5,
) -> DataFrame:
    """Top-k BM25 chunks per query.

    ``chunks``: (doc_id, chunk_idx, chunk_text); ``queries``:
    (query_id, query_text). Returns (query_id, rank, doc_id, chunk_idx,
    score_milli) with rank 1..k, ties broken by (doc_id, chunk_idx)."""
    # materialize the posting table ONCE: it feeds the avgdl collect, the
    # df/idf branch, AND the match branch — uncached, the explode+groupBy
    # (the corpus-scale shuffle) would re-run for each.
    post = chunk_postings(chunks).localCheckpoint(eager=True)
    n_chunks = chunks.count()
    stats = post.select("doc_id", "chunk_idx", "dl").distinct()
    dl_sum = stats.agg(F.sum("dl")).collect()[0][0]
    if n_chunks == 0 or dl_sum is None:
        # empty corpus, or no indexable text at all (every chunk_text
        # NULL explodes to zero postings): no index, no matches
        return local_df(chunks.sparkSession, 
            [],
            "query_id long, rank int, doc_id long, chunk_idx int,"
            " score_milli long",
        )
    avgdl = float(int(dl_sum)) / float(n_chunks)
    df = post.groupBy("term").agg(
        F.countDistinct("doc_id", "chunk_idx").cast("long").alias("df")
    )
    # idf quantized to ppm right after the one implementation-defined op
    # (ln); everything downstream is integer or single-expression IEEE.
    idf = df.where(
        F.col("df").cast("double") <= F.lit(float(max_df_ratio)) * F.lit(float(n_chunks))
    ).select(
        "term",
        F.round(
            F.log(
                (
                    (F.lit(float(n_chunks)) - F.col("df").cast("double") + F.lit(0.5))
                    / (F.col("df").cast("double") + F.lit(0.5))
                )
                + F.lit(1.0)
            )
            * F.lit(1_000_000.0),
            0,
        )
        .cast("long")
        .alias("idf_ppm"),
    )
    qterms = (
        queries.select(
            "query_id", F.explode(F.split("query_text", " ")).alias("term")
        )
        .distinct()
    )
    # restrict the vocab-sized idf table to the query terms FIRST (qterms
    # broadcasts into the idf scan, map-side), then broadcast the
    # query-term-sized result into the postings join: the posting table
    # never moves, and nothing vocab-sized is ever force-broadcast (a web
    # corpus vocabulary wouldn't fit).
    q_idf = idf.join(F.broadcast(qterms), "term")
    matched = post.join(F.broadcast(q_idf), "term")
    term_score = matched.select(
        "query_id",
        "doc_id",
        "chunk_idx",
        F.round(
            F.col("idf_ppm").cast("double")
            / F.lit(1_000_000.0)
            * (
                F.col("tf").cast("double") * F.lit(BM25_K1 + 1.0)
                / (
                    F.col("tf").cast("double")
                    + F.lit(BM25_K1)
                    * (
                        F.lit(1.0 - BM25_B)
                        + F.lit(BM25_B) * F.col("dl").cast("double") / F.lit(avgdl)
                    )
                )
            )
            * F.lit(1_000.0),
            0,
        )
        .cast("long")
        .alias("s_milli"),
    )
    scored = term_score.groupBy("query_id", "doc_id", "chunk_idx").agg(
        F.sum("s_milli").cast("long").alias("score_milli")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_milli"), "doc_id", "chunk_idx"
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "chunk_idx", "score_milli")
    )


def bm25_sql(
    chunks_cte: str,
    queries_cte: str,
    k: int = 5,
    max_df_ratio: float = 0.5,
) -> str:
    """DuckDB twin of bm25_topk. ``chunks_cte`` must yield
    (doc_id, chunk_idx, chunk_text); ``queries_cte`` (query_id, query_text).
    Same quantization points -> bit-identical score_milli."""
    return f"""
WITH chunks AS ({chunks_cte}),
qs AS ({queries_cte}),
toks AS (
  SELECT doc_id, chunk_idx,
         len(string_split(chunk_text, ' ')) AS dl,
         unnest(string_split(chunk_text, ' ')) AS term
  FROM chunks
),
post AS (
  SELECT doc_id, chunk_idx, dl, term, cast(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, chunk_idx, dl, term
),
nstat AS (SELECT cast(count(*) AS BIGINT) AS n FROM chunks),
avgstat AS (
  SELECT sum(dl)::DOUBLE / (SELECT n FROM nstat)::DOUBLE AS avgdl
  FROM (SELECT DISTINCT doc_id, chunk_idx, dl FROM post)
),
dft AS (
  SELECT term, cast(count(*) AS BIGINT) AS df
  FROM (SELECT DISTINCT term, doc_id, chunk_idx FROM post) GROUP BY term
),
idf AS (
  SELECT term,
         cast(round(ln(((SELECT n FROM nstat)::DOUBLE - df::DOUBLE + 0.5::DOUBLE)
                       / (df::DOUBLE + 0.5::DOUBLE) + 1.0::DOUBLE)
                    * 1000000.0::DOUBLE) AS BIGINT) AS idf_ppm
  FROM dft
  WHERE df::DOUBLE <= {max_df_ratio!r}::DOUBLE * (SELECT n FROM nstat)::DOUBLE
),
qterms AS (
  SELECT DISTINCT query_id, unnest(string_split(query_text, ' ')) AS term
  FROM qs
),
term_score AS (
  SELECT q.query_id, p.doc_id, p.chunk_idx,
         cast(round(i.idf_ppm::DOUBLE / 1000000.0::DOUBLE
             * (p.tf::DOUBLE * {BM25_K1 + 1.0!r}::DOUBLE
                / (p.tf::DOUBLE + {BM25_K1!r}::DOUBLE
                   * ({1.0 - BM25_B!r}::DOUBLE
                      + {BM25_B!r}::DOUBLE * p.dl::DOUBLE
                        / (SELECT avgdl FROM avgstat))))
             * 1000.0::DOUBLE) AS BIGINT) AS s_milli
  FROM post p JOIN qterms q ON p.term = q.term JOIN idf i ON p.term = i.term
),
scored AS (
  SELECT query_id, doc_id, chunk_idx,
         cast(sum(s_milli) AS BIGINT) AS score_milli
  FROM term_score GROUP BY query_id, doc_id, chunk_idx
),
ranked AS (
  SELECT *, cast(row_number() OVER (
           PARTITION BY query_id
           ORDER BY score_milli DESC, doc_id, chunk_idx) AS INT) AS rank
  FROM scored
)
SELECT query_id, rank, doc_id, chunk_idx, score_milli
FROM ranked WHERE rank <= {k}
"""


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    top_n: int = 3,
    min_term_len: int = 3,
) -> DataFrame:
    """(doc_id, rank, term, tfidf_ppm): each document's top-n keywords by
    TF-IDF — the classic corpus-keyword / document-signature stage (and
    the feature map a TF-IDF + k-means topic-clustering pipeline feeds).

    Same determinism discipline as bm25_topk: idf = ln((N+1)/(df+1)) is
    the only libm call, quantized to integer ppm immediately; the score
    is tf * idf_ppm — pure BIGINT, hash-matchable against the DuckDB twin
    (tfidf_sql). Ties break by term ascending, so ranks are total.

    Scale shape: token explode -> one hash-aggregate to (doc, term, tf)
    with map-side combine; df aggregates the compressed posting table;
    the tf-df join keys on term across two already-aggregated tables; the
    top-n window partitions by doc_id (parallelism = documents). N is a
    one-scalar count (broadcast into the expression, not a data collect).
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("term"),
    ).where(
        (F.length("term") >= min_term_len) & F.col("term").rlike("^[a-z]+$")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.count()  # one-scalar stat
    scored = tf.join(dfreq, "term").select(
        "doc_id",
        "term",
        (
            F.col("tf")
            * F.floor(
                F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df") + 1.0))
                * 1_000_000.0
            ).cast("long")
        ).alias("tfidf_ppm"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf_ppm").desc(), F.col("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_n)
        .select("doc_id", "rank", "term", "tfidf_ppm")
    )


def tfidf_sql(
    docs_sql: str = "SELECT doc_id, text FROM documents",
    top_n: int = 3,
    min_term_len: int = 3,
) -> str:
    """DuckDB twin of tfidf_top_terms over the same token/idf/rank rules."""
    return f"""
WITH docs AS ({docs_sql}),
toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM docs
),
ft AS (
  SELECT doc_id, term, count(*) AS tf FROM toks
  WHERE length(term) >= {min_term_len} AND regexp_matches(term, '^[a-z]+$')
  GROUP BY doc_id, term
),
dfreq AS (SELECT term, count(*) AS df FROM ft GROUP BY term),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM docs),
scored AS (
  SELECT f.doc_id, f.term,
         f.tf * CAST(floor(ln((n.n_docs + 1.0) / (d.df + 1.0))
                           * 1000000.0) AS BIGINT) AS tfidf_ppm
  FROM ft f JOIN dfreq d ON f.term = d.term CROSS JOIN n
),
ranked AS (
  SELECT doc_id, term, tfidf_ppm,
         CAST(row_number() OVER (
           PARTITION BY doc_id ORDER BY tfidf_ppm DESC, term
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT doc_id, rank, term, tfidf_ppm FROM ranked WHERE rank <= {top_n}
"""


# --- ranking-quality evaluation (nDCG@k / MRR / P@k / R@k) ----------------


def _discounts_ppm(k: int) -> list[int]:
    """round(1e6 / log2(rank+1)) for ranks 1..k — the ONE transcendental
    in nDCG, computed once driver-side and embedded as an integer literal
    table in BOTH engines, so every downstream value is exact integer
    math (the repo's oracle discipline, cf. bm25_topk's idf_ppm)."""
    import math

    return [round(1_000_000 / math.log2(r + 1)) for r in range(1, k + 1)]


def ranking_eval(
    results: DataFrame, qrels: DataFrame, k: int = 5
) -> DataFrame:
    """Per-query retrieval-quality report: trec_eval's core metrics over
    a ranked run and graded relevance judgments.

    ``results``: (query_id, rank, unit) — one retrieval run, rank 1..n,
    ``unit`` the retrieval-unit key (a doc id, or doc:chunk composite).
    ``qrels``: (query_id, unit, grade) — graded judgments, grade >= 0,
    (query_id, unit) unique (caller contract; grade 0 = judged
    non-relevant). Returns one row per query THAT HAS >=1 relevant
    judgment (trec_eval's convention — unjudged queries are excluded,
    not scored 0):

      (query_id, n_rel, rel_ret, ndcg_ppm, rr_ppm, p_at_k_ppm,
       recall_ppm)

    * ndcg_ppm: burst-gain DCG@k (gain = 2^grade - 1, discount =
      1/log2(rank+1) as the precomputed integer-ppm table) over ideal
      DCG@k (judgments sorted grade desc, ties by unit asc), scaled to
      ppm with truncating integer division — bit-exact cross-engine.
    * rr_ppm: 1e6 div (first rank with grade > 0); 0 if none retrieved.
    * p_at_k_ppm / recall_ppm: relevant-retrieved@k over k / over n_rel.

    Scale shape (100 TB corpus, millions of queries): the run is already
    top-k-per-query (k rows/query); qrels are sparse. One equi-join on
    (query_id, unit) aligns run rows with judgments; per-query aggregates
    hash-shuffle on query_id; the ideal-DCG window partitions by
    query_id over the judgment rows only (parallelism = queries, rows
    per query = that query's judgment count, never corpus-sized). The
    discount table is a k-entry array literal — no join, whole-stage
    codegen."""
    disc = _discounts_ppm(k)
    disc_arr = F.array(*[F.lit(v).cast("long") for v in disc])
    run = results.where(F.col("rank") <= k).select(
        "query_id",
        F.col("rank").cast("int").alias("rank"),
        "unit",
    )
    judged = qrels.select(
        "query_id", "unit", F.col("grade").cast("int").alias("grade")
    )
    # run rows with their judgment grade (unjudged retrieved -> grade 0)
    hits = run.join(judged, ["query_id", "unit"], "left").select(
        "query_id",
        "rank",
        F.coalesce(F.col("grade"), F.lit(0)).alias("grade"),
    )
    gained = hits.select(
        "query_id",
        "rank",
        "grade",
        (
            (F.expr("shiftleft(1L, grade)") - F.lit(1).cast("long"))
            * F.element_at(disc_arr, F.col("rank"))
        ).alias("g_ppm"),
    )
    per_q = gained.groupBy("query_id").agg(
        F.sum("g_ppm").cast("long").alias("dcg_ppm"),
        F.sum(F.when(F.col("grade") > 0, 1).otherwise(0))
        .cast("long")
        .alias("rel_ret"),
        F.min(F.when(F.col("grade") > 0, F.col("rank"))).alias(
            "first_rel_rank"
        ),
    )
    # ideal DCG: this query's judgments sorted by grade desc (ties unit
    # asc for determinism), top k through the same discount table
    iw = Window.partitionBy("query_id").orderBy(
        F.desc("grade"), F.col("unit")
    )
    ideal = (
        judged.where(F.col("grade") > 0)
        .withColumn("irank", F.row_number().over(iw))
        .where(F.col("irank") <= k)
        .groupBy("query_id")
        .agg(
            F.sum(
                (F.expr("shiftleft(1L, grade)") - F.lit(1).cast("long"))
                * F.element_at(disc_arr, F.col("irank"))
            )
            .cast("long")
            .alias("idcg_ppm")
        )
    )
    totals = judged.where(F.col("grade") > 0).groupBy("query_id").agg(
        F.count("*").cast("long").alias("n_rel")
    )
    # inner joins: only queries with >=1 relevant judgment are scored;
    # per_q is left-joined so a query whose run retrieved NOTHING judged
    # still reports (rel_ret 0, ndcg 0, rr 0)
    out = (
        totals.join(ideal, "query_id")
        .join(per_q, "query_id", "left")
        .select(
            "query_id",
            "n_rel",
            F.coalesce(F.col("rel_ret"), F.lit(0).cast("long")).alias(
                "rel_ret"
            ),
            F.expr(
                "(coalesce(dcg_ppm, 0L) * 1000000L) div idcg_ppm"
            ).alias("ndcg_ppm"),
            F.coalesce(
                F.expr("1000000L div first_rel_rank").cast("long"),
                F.lit(0).cast("long"),
            ).alias("rr_ppm"),
            F.expr(
                f"(coalesce(rel_ret, 0L) * 1000000L) div {k}L"
            ).alias("p_at_k_ppm"),
            F.expr(
                "(coalesce(rel_ret, 0L) * 1000000L) div n_rel"
            ).alias("recall_ppm"),
        )
    )
    return out


def ranking_eval_sql(results_cte: str, qrels_cte: str, k: int = 5) -> str:
    """DuckDB twin of ranking_eval — same integer discount table, same
    truncating ppm divisions, bit-identical rows."""
    disc = _discounts_ppm(k)
    disc_lit = "[" + ", ".join(f"{v}::BIGINT" for v in disc) + "]"
    return f"""
WITH run0 AS ({results_cte}),
jud AS (SELECT query_id, unit, cast(grade AS INT) AS grade
        FROM ({qrels_cte})),
run AS (SELECT query_id, cast(rank AS INT) AS rank, unit
        FROM run0 WHERE rank <= {k}),
hits AS (
  SELECT r.query_id, r.rank, coalesce(j.grade, 0) AS grade
  FROM run r LEFT JOIN jud j
    ON r.query_id = j.query_id AND r.unit = j.unit
),
per_q AS (
  SELECT query_id,
         cast(sum(((1::BIGINT << grade) - 1)
                  * ({disc_lit})[rank]) AS BIGINT) AS dcg_ppm,
         cast(sum(CASE WHEN grade > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS rel_ret,
         min(CASE WHEN grade > 0 THEN rank END) AS first_rel_rank
  FROM hits GROUP BY query_id
),
ideal AS (
  SELECT query_id,
         cast(sum(((1::BIGINT << grade) - 1)
                  * ({disc_lit})[irank]) AS BIGINT) AS idcg_ppm
  FROM (
    SELECT query_id, grade, unit,
           cast(row_number() OVER (
             PARTITION BY query_id ORDER BY grade DESC, unit
           ) AS INT) AS irank
    FROM jud WHERE grade > 0
  ) WHERE irank <= {k} GROUP BY query_id
),
totals AS (
  SELECT query_id, cast(count(*) AS BIGINT) AS n_rel
  FROM jud WHERE grade > 0 GROUP BY query_id
)
SELECT * FROM (
SELECT t.query_id AS query_id, t.n_rel AS n_rel,
       coalesce(p.rel_ret, 0::BIGINT) AS rel_ret,
       cast((coalesce(p.dcg_ppm, 0::BIGINT) * 1000000)
            // i.idcg_ppm AS BIGINT) AS ndcg_ppm,
       coalesce(cast(1000000 // p.first_rel_rank AS BIGINT), 0::BIGINT)
         AS rr_ppm,
       cast((coalesce(p.rel_ret, 0::BIGINT) * 1000000) // {k} AS BIGINT)
         AS p_at_k_ppm,
       cast((coalesce(p.rel_ret, 0::BIGINT) * 1000000) // t.n_rel
            AS BIGINT) AS recall_ppm
FROM totals t
JOIN ideal i ON t.query_id = i.query_id
LEFT JOIN per_q p ON t.query_id = p.query_id
)
"""
