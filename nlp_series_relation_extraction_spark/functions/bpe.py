"""Distributed BPE vocabulary induction (tokenizer training) over a corpus.

Classic byte-pair-encoding merge learning, Spark-first:

* word counts — one aggregation over the corpus (the skew firewall: every
  later stage works on DISTINCT words weighted by count, so a 100TB corpus
  collapses to its vocabulary before any per-word work);
* per step: adjacent-pair counts (JVM ``transform`` + explode, weighted),
  global argmax (count desc, then (a, b) asc — deterministic tie-break),
  then one pass merging that pair in every word via an ``F.aggregate``
  fold (greedy left-to-right: in a run of identical tokens, the 1st+2nd
  merge, 3rd+4th merge, ... — the standard BPE semantics);
* the driver collects ONE row per step (the argmax — index training, like
  the trainers' gradient rows), embeds the pair in the next step's plan,
  and localCheckpoints the word table so plans stay flat.

The merge table (step, a, b, pair_count) is the learned tokenizer
artifact; plans/queries.py carries a DuckDB oracle that re-derives every
step in SQL (windowed gaps-and-islands reproduce the greedy fold exactly).
"""

from __future__ import annotations

from .smalldf import local_df

from pyspark.sql import DataFrame, functions as F
from .partitioning import checkpoint_nostats as _ckpt_nostats


def _char_tokens(col: str):
    return F.expr(
        f"transform(sequence(1, length({col})), i -> substring({col}, i, 1))"
    )


def _merge_fold(tokens_col, a: str, b: str):
    """Greedy left-to-right merge of adjacent (a, b) into a||b via an array
    fold. Token values are compared with Column literals (no SQL-string
    quoting of corpus content)."""
    merged = F.concat(F.lit(a), F.lit(b))

    def step(acc, t):
        can_merge = (
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (t == F.lit(b))
        )
        return F.when(
            can_merge,
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(merged)
            ),
        ).otherwise(F.concat(acc, F.array(t)))

    return F.aggregate(
        tokens_col, F.expr("cast(array() as array<string>)"), step
    )


def train_bpe(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    merges_per_pass: int = 1,
) -> dict:
    """Learn ``n_merges`` BPE merges. Returns ``{"merges": [(step, a, b,
    pair_count), ...], "words": final tokenized word DataFrame}``. Stops
    early when no adjacent pair remains. Corpus-level: no per-document id
    is involved (apply_bpe is the per-document side).

    ``merges_per_pass`` folds up to k TOKEN-DISJOINT merges per Spark pass
    (one pair-count aggregation + one driver collect per pass instead of
    per merge — a 32k-vocab build becomes ~thousands of jobs, not 32k).
    Within a pass the top candidates are accepted in rank order, skipping
    any pair sharing a token (as input or as the produced token) with an
    already-accepted pair; disjoint merges cannot create or destroy each
    other's adjacencies, so each accepted pair's recorded count equals the
    sequential one.

    INVARIANT (when batched == sequential): batched training reproduces
    k=1 training exactly iff, within every pass, no merge CREATED by an
    earlier accepted pair (a pair involving its merged token, e.g. (x, ab)
    after merging (a, b)) would outrank a later accepted pair in the
    sequential ordering. That holds whenever accepted counts are separated
    from created-pair counts (typical for natural-language tails); when it
    does not, batched training is still a valid BPE (deterministic,
    monotone counts) but may order merges differently — pin k=1 where
    byte-exact sequential parity matters (the driver oracle does)."""
    words = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .select("word", "cnt", _char_tokens("word").alias("tokens"))
        .transform(_ckpt_nostats)
    )
    merges: list[tuple[int, str, str, int]] = []
    cur = words
    while len(merges) < n_merges:
        k = min(max(merges_per_pass, 1), n_merges - len(merges))
        pair_col = F.expr(
            "transform(sequence(1, size(tokens) - 1),"
            " i -> struct(element_at(tokens, i) as a,"
            "            element_at(tokens, i + 1) as b))"
        )
        # headroom over k: skipped overlapping candidates still leave
        # enough accepted pairs in most passes
        top = (
            cur.where(F.size("tokens") >= 2)
            .select("cnt", F.explode(pair_col).alias("p"))
            .groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("pair_count"))
            .orderBy(F.desc("pair_count"), F.asc("a"), F.asc("b"))
            .limit(max(4 * k, k))
            .collect()
        )
        if not top:
            break
        accepted: list[tuple[str, str, int]] = []
        used: set[str] = set()
        for r in top:
            if len(accepted) == k:
                break
            if r.a in used or r.b in used:
                continue
            accepted.append((r.a, r.b, int(r.pair_count)))
            used.update((r.a, r.b, r.a + r.b))
        # rank-1 never overlaps (used starts empty) -> progress guaranteed
        tokens_col = F.col("tokens")
        for a, b, c in accepted:
            merges.append((len(merges), a, b, c))
            tokens_col = _merge_fold(tokens_col, a, b)
        cur = cur.select(
            "word", "cnt", tokens_col.alias("tokens")
        ).transform(_ckpt_nostats)
    return {"merges": merges, "words": cur}


def bpe_merges_df(
    docs: DataFrame, text_col: str = "text", n_merges: int = 8
) -> DataFrame:
    """The learned merge table as a DataFrame:
    (step int, a string, b string, pair_count bigint)."""
    res = train_bpe(docs, text_col, n_merges)
    spark = docs.sparkSession
    return local_df(
        spark, res["merges"], "step int, a string, b string, pair_count long"
    )


def apply_bpe(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple],
) -> DataFrame:
    """Tokenize with learned merges -> (id, n_bpe_tokens, n_words).

    The inference side of the tokenizer: the merge rules fold over the
    DISTINCT word table (vocabulary-sized), producing a word -> token-count
    dimension that broadcast-joins back to the exploded corpus — per-word
    work never scales with corpus size, only with vocabulary."""
    word_occ = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), " ")).alias("word"),
    ).where(F.length("word") > 0)
    tokens_col = _char_tokens("word")
    for m in merges:
        a, b = m[1], m[2]
        tokens_col = _merge_fold(tokens_col, a, b)
    word_dim = (
        word_occ.select("word").distinct()
        .select("word", F.size(tokens_col).alias("word_tokens"))
    )
    return (
        word_occ.join(F.broadcast(word_dim), "word")
        .groupBy("id")
        .agg(
            F.sum("word_tokens").alias("n_bpe_tokens"),
            F.count("*").alias("n_words"),
        )
    )


def wordpiece_vocab(words: DataFrame) -> list[str]:
    """Turn a trained BPE word table (train_bpe's ``words``: word, cnt,
    tokens) into a wordpiece vocabulary for core.tokenization.tokenize_unit:
    the first piece of each word kept plain, continuation pieces
    ``##``-prefixed (BERT's convention), all lowercased. Driver-sized
    collect — this is the tokenizer ARTIFACT (like the merges table), not a
    data-path collect; ship it to executors in the UDF closure."""
    pieces = (
        words.select(F.posexplode("tokens").alias("i", "tok"))
        .select(
            F.when(F.col("i") == 0, F.lower("tok"))
            .otherwise(F.concat(F.lit("##"), F.lower("tok")))
            .alias("piece")
        )
        .distinct()
        .orderBy("piece")
        .collect()
    )
    return [r.piece for r in pieces]


def bpe_merges_sql(table: str, text_col: str, n_merges: int = 8) -> str:
    """DuckDB oracle re-deriving the same merge table: each step computes
    weighted adjacent-pair counts, takes the same deterministically
    tie-broken argmax, and applies the greedy fold via gaps-and-islands
    windows (consecutive overlapping matches — only possible when a == b —
    merge at even run ranks, exactly the left-to-right fold)."""
    parts = [
        f"""
tok0 AS MATERIALIZED (
  SELECT word, cnt, pos, token FROM (
    SELECT word, cnt,
           generate_subscripts(string_split_regex(word, ''), 1) AS pos,
           unnest(string_split_regex(word, '')) AS token
    FROM (
      SELECT word, count(*) AS cnt FROM (
        SELECT unnest(string_split({text_col}, ' ')) AS word FROM {table}
      ) WHERE length(word) > 0 GROUP BY word
    )
  )
)"""
    ]
    for i in range(n_merges):
        parts.append(f"""
pairs{i} AS MATERIALIZED (
  SELECT t.token AS a,
         lead(t.token) OVER (PARTITION BY t.word ORDER BY t.pos) AS b,
         t.cnt
  FROM tok{i} t
), best{i} AS MATERIALIZED (
  SELECT a, b, cast(sum(cnt) AS BIGINT) AS pair_count
  FROM pairs{i} WHERE b IS NOT NULL
  GROUP BY a, b ORDER BY pair_count DESC, a ASC, b ASC LIMIT 1
), m{i} AS MATERIALIZED (
  SELECT t.*, CASE WHEN t.token = (SELECT a FROM best{i})
                    AND lead(t.token) OVER (PARTITION BY t.word ORDER BY t.pos)
                        = (SELECT b FROM best{i})
              THEN 1 ELSE 0 END AS is_m
  FROM tok{i} t
), runs{i} AS MATERIALIZED (
  SELECT word, pos,
         pos - row_number() OVER (PARTITION BY word ORDER BY pos) AS grp
  FROM m{i} WHERE is_m = 1
), mp{i} AS MATERIALIZED (
  SELECT word, pos FROM (
    SELECT word, pos,
           row_number() OVER (PARTITION BY word, grp ORDER BY pos) - 1 AS r
    FROM runs{i}
  ) WHERE r % 2 = 0
), out{i} AS (
  -- the merged partner comes from a positional self-join, NOT lead():
  -- window functions evaluate after WHERE, so lead over the filtered rows
  -- would skip past the consumed token
  SELECT m.word, m.cnt,
         row_number() OVER (PARTITION BY m.word ORDER BY m.pos) AS pos,
         CASE WHEN me.pos IS NOT NULL THEN m.token || nxt.token
              ELSE m.token END AS token
  FROM m{i} m
  LEFT JOIN mp{i} me ON me.word = m.word AND me.pos = m.pos
  LEFT JOIN m{i} nxt ON nxt.word = m.word AND nxt.pos = m.pos + 1
  LEFT JOIN mp{i} prev ON prev.word = m.word AND prev.pos = m.pos - 1
  WHERE prev.pos IS NULL
), tok{i + 1} AS MATERIALIZED (SELECT word, cnt, pos, token FROM out{i})""")
    selects = " UNION ALL ".join(
        f"SELECT {i} AS step, a, b, pair_count FROM best{i}"
        for i in range(n_merges)
    )
    return (
        "WITH " + ",".join(parts) + f"\nSELECT * FROM ({selects}) ORDER BY step"
    )


def bpe_token_counts_sql(
    table: str, id_col: str, text_col: str, n_merges: int = 8
) -> str:
    """DuckDB oracle for apply_bpe: reuse the merge-learning CTE chain, then
    per-word token counts from the final token table joined back to the
    exploded corpus."""
    learn = bpe_merges_sql(table, text_col, n_merges)
    with_block = learn[: learn.rindex("\nSELECT")]
    return f"""{with_block},
word_tokens AS (
  SELECT word, count(*) AS wt FROM tok{n_merges} GROUP BY word
), docs_words AS (
  SELECT {id_col} AS id, unnest(string_split({text_col}, ' ')) AS word
  FROM {table}
)
SELECT id, cast(sum(wt) AS BIGINT) AS n_bpe_tokens,
       count(*) AS n_words
FROM docs_words JOIN word_tokens USING (word)
WHERE length(word) > 0
GROUP BY id ORDER BY id
"""
