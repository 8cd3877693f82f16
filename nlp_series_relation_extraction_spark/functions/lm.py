"""Distributed n-gram language-model quality scoring (the CCNet recipe:
score every document by an n-gram LM and filter/bucket on the score —
the standard statistical-quality gate of pretraining pipelines, next to
the heuristic signals in functions/textstats.py).

Model: word-bigram LM with add-one smoothing,

    P(w2 | w1) = (c(w1, w2) + 1) / (c1(w1) + V)

where ``c1(w1)`` is w1's count as a LEFT context (so each conditional
distribution sums to exactly 1) and ``V`` is the corpus unigram vocabulary
size. Scores are conditional probabilities quantized to ppm with INTEGER
division — ``(1000000 * (c2+1)) div (c1+V)`` — so the whole path is
cross-engine deterministic and carries a bit-identical DuckDB oracle
(the repo's quantized-integer convention, cf. cents / ANN dots).

Scale shape (100 TB corpus):
* training = ONE shuffle: explode the bigram stream, hash-aggregate
  counts. Hot stopword bigrams are combined map-side (partial agg)
  before the exchange, so skew is bounded by (num map tasks x distinct
  hot keys), not occurrence counts. Context counts and vocabulary size
  aggregate the (already compressed) count tables, not the corpus.
* scoring = two joins keyed on (w1,w2) / (w1). The LM side is one row
  per key; the probe side concentrates on hot keys — exactly the case
  AQE's skew-join splitting handles (oversized probe partitions split,
  the single matching build row replicates). ``min_count`` prunes the
  model's long tail (standard KenLM practice) — pruned bigrams fall
  back to the unseen-pair smoothing mass, and a pruned model small
  enough to broadcast turns scoring into two map-side joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def bigram_stream(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, w1, w2): every adjacent whitespace-token pair, positional
    (duplicates kept — these are LM events, not shingle sets). Documents
    with fewer than 2 tokens emit nothing (the sequence(1,0)-is-descending
    guard, cf. word_shingles)."""
    w = f"split({text_col}, ' ')"
    pairs = F.expr(
        f"case when size({w}) >= 2 then "
        f"transform(sequence(1, size({w}) - 1),"
        f" i -> struct(element_at({w}, i) as w1, element_at({w}, i + 1) as w2)) "
        f"else array() end"
    )
    return docs.select(
        F.col(id_col).alias("id"), F.explode(pairs).alias("bg")
    ).select("id", "bg.w1", "bg.w2")


def train_bigram_lm(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 1,
) -> dict:
    """Train the bigram LM on a corpus. Returns
    ``{"bigrams": (w1, w2, c2), "contexts": (w1, c1), "vocab_size": int}``.

    ``min_count`` drops bigrams seen fewer times from the model table
    (contexts and V stay exact — pruning only moves tail pairs onto the
    smoothing floor, it never changes the denominator)."""
    bg = bigram_stream(docs, id_col, text_col)
    bigrams = bg.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    contexts = bigrams.groupBy("w1").agg(
        F.sum("c2").cast("long").alias("c1")
    )
    vocab_size = (
        docs.select(
            F.explode(F.split(F.col(text_col), " ")).alias("tok")
        )
        .agg(F.countDistinct("tok"))
        .collect()[0][0]
    )
    if min_count > 1:
        bigrams = bigrams.where(F.col("c2") >= min_count)
    return {
        "bigrams": bigrams,
        "contexts": contexts,
        "vocab_size": int(vocab_size),
    }


def lm_doc_scores(
    docs: DataFrame,
    lm: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document under a trained bigram LM:
    (doc_id, n_bigrams, n_known, sum_q_ppm, min_q_ppm) where q is the
    add-one conditional probability of each bigram event in ppm (integer
    division — see module docstring). High sum/n ~ fluent in-domain text;
    a low min flags a single out-of-model junk transition; n_known is the
    model hit count. Documents with < 2 tokens emit no row (no events)."""
    v = lm["vocab_size"]
    bg = bigram_stream(docs, id_col, text_col)
    b = lm["bigrams"].select("w1", "w2", "c2")
    c = lm["contexts"].select(F.col("w1").alias("_cw"), "c1")
    scored = (
        bg.join(b, ["w1", "w2"], "left")
        .join(c, bg["w1"] == c["_cw"], "left")
        .select(
            "id",
            F.col("c2").isNotNull().alias("known"),
            F.expr(
                f"(1000000 * (coalesce(c2, 0) + 1))"
                f" div (coalesce(c1, 0) + {v})"
            ).alias("q"),
        )
    )
    return scored.groupBy(F.col("id").alias(id_col)).agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.sum(F.when(F.col("known"), 1).otherwise(0))
        .cast("long")
        .alias("n_known"),
        F.sum("q").cast("long").alias("sum_q_ppm"),
        F.min("q").cast("long").alias("min_q_ppm"),
    )


def lm_score_self(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """Train on the corpus and score the same corpus (the in-domain
    calibration run; for the real CCNet gate, train on a clean reference
    corpus and pass held-out docs to lm_doc_scores)."""
    # a small parquet corpus arrives as ONE split; every pass (bigram
    # count, vocab count, scoring probe) would explode bigrams on a single
    # core before its first shuffle. Round-robin the rows up to the
    # session's core count first (no-op at real scale, where the input has
    # many splits; results are partitioning-invariant).
    from .partitioning import ensure_parallelism as _spread

    docs = _spread(docs)
    lm = train_bigram_lm(docs, id_col, text_col, min_count=min_count)
    return lm_doc_scores(docs, lm, id_col, text_col)


def lm_sql(table: str, id_col: str = "doc_id", text_col: str = "text") -> str:
    """DuckDB oracle mirroring lm_score_self (min_count=1), bit-identical:
    same integer ppm quantization, same add-one denominators."""
    return f"""
WITH toks AS (
  SELECT {id_col} AS id, string_split({text_col}, ' ') AS ws FROM {table}
), bg AS (
  SELECT id,
    unnest(list_transform(
      generate_series(1, greatest(len(ws) - 1, 0)), i -> ws[i])) AS w1,
    unnest(list_transform(
      generate_series(1, greatest(len(ws) - 1, 0)), i -> ws[i + 1])) AS w2
  FROM toks
), bcnt AS (
  SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2
), ctx AS (
  SELECT w1, cast(sum(c2) AS BIGINT) AS c1 FROM bcnt GROUP BY w1
), vocab AS (
  SELECT count(DISTINCT tok) AS v
  FROM (SELECT unnest(ws) AS tok FROM toks)
), scored AS (
  SELECT bg.id,
         b.c2 IS NOT NULL AS known,
         (1000000 * (coalesce(b.c2, 0) + 1))
           // (coalesce(c.c1, 0) + vocab.v) AS q
  FROM bg
  LEFT JOIN bcnt b ON bg.w1 = b.w1 AND bg.w2 = b.w2
  LEFT JOIN ctx c ON bg.w1 = c.w1
  CROSS JOIN vocab
)
SELECT id AS {id_col},
       cast(count(*) AS BIGINT) AS n_bigrams,
       cast(sum(CASE WHEN known THEN 1 ELSE 0 END) AS BIGINT) AS n_known,
       cast(sum(q) AS BIGINT) AS sum_q_ppm,
       cast(min(q) AS BIGINT) AS min_q_ppm
FROM scored GROUP BY id ORDER BY {id_col}
"""
