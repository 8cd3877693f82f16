"""Training-data curation: the standard quality -> dedup funnel, composed
from this package's operators into one DataFrame pipeline.

    documents
      -> language filter (keep target lang, functions.textstats.lang_id)
      -> quality filter  (min words, max punctuation ratio)
      -> exact dedup     (md5 canonical: keep the min doc id per content)
      -> near-dup drop   (word-shingle jaccard pairs on the SURVIVORS;
                          the higher id of every pair is dropped)

Every stage is pure Catalyst + integer arithmetic, so the whole funnel is
cross-engine deterministic and carries a DuckDB oracle in plans/queries.py.
Scale shape: two aggregations (lang/quality are per-row), one md5 group-by,
and the capped inverted-index join — no all-pairs stage anywhere.
"""

from __future__ import annotations

from .smalldf import local_df

from pyspark.sql import DataFrame, functions as F


def deterministic_sample(
    df: DataFrame, key_col: str, keep_of_256: int
) -> DataFrame:
    """Hash-based deterministic sampling: keep rows whose md5(key)'s first
    two hex chars, read as 0..255, fall below ``keep_of_256`` (fraction =
    keep_of_256/256). A pure string comparison — identical in any engine
    with md5, reproducible across runs and cluster layouts, and
    join-stable: the same key always samples the same way, so sampled
    fact/dim tables stay mutually consistent (unlike rand()-based
    sampling)."""
    if not 0 <= keep_of_256 <= 256:
        raise ValueError(f"keep_of_256 must be in [0, 256], got {keep_of_256}")
    if keep_of_256 == 256:
        return df  # keep-everything endpoint: a 3-char '100' cutoff would
        # compare lexicographically against the 2-char prefix and keep ~1/16
    cutoff = format(keep_of_256, "02x")
    return df.where(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 2) < F.lit(cutoff)
    )


def balanced_sample(
    df: DataFrame, group_col: str, key_col: str, cap_per_group: int
) -> DataFrame:
    """Per-group deterministic downsampling to ~``cap_per_group`` rows —
    the data-mixing / language-rebalancing step of a pretraining pipeline
    (cap the dominant language or source, keep the tails whole).

    Each group's keep-rate (in 256ths) is ``min(256, (256*cap) div n_g)``
    and rows keep when their md5(key) 2-hex prefix sorts below the group's
    cutoff — the same join-stable hash sampling as deterministic_sample,
    so re-runs, different cluster layouts, and downstream joins all see
    the same rows. Expected kept size per group is cap (binomial, exact
    only in expectation — this is rate-based sampling, not a top-k).

    Scale shape: the group-count aggregation produces one row per group
    (languages/sources — broadcast-sized by construction) and broadcasts
    back onto the corpus scan; the data rows are never shuffled. All
    arithmetic is integer (``div``), so a DuckDB oracle is bit-identical.
    """
    if cap_per_group < 0:
        raise ValueError(f"cap_per_group must be >= 0, got {cap_per_group}")
    rates = (
        df.groupBy(group_col)
        .agg(F.count("*").alias("_n_g"))
        .select(
            group_col,
            F.expr(f"least(256L, (256 * {cap_per_group}) div _n_g)").alias(
                "_rate"
            ),
        )
    )
    out = df.join(F.broadcast(rates), group_col)
    # rate == 256 must short-circuit: hex(256) = '100' compares
    # lexicographically BELOW 2-hex prefixes >= '10' (the keep-everything
    # trap documented on deterministic_sample)
    return out.where(
        (F.col("_rate") >= 256)
        | (
            F.substring(F.md5(F.col(key_col).cast("string")), 1, 2)
            < F.lpad(F.lower(F.hex(F.col("_rate"))), 2, "0")
        )
    ).drop("_rate", "_n_g")


def contamination_hits(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 13,
) -> DataFrame:
    """(doc_id, n_hit_ngrams): per document, how many of its DISTINCT word
    n-grams appear anywhere in the benchmark/eval corpus — the standard
    train/test decontamination signal (n=13 word-grams is the GPT-3/LLaMA
    convention; pass a smaller n for short documents).

    Scale shape: the benchmark side collapses to its distinct n-gram SET
    (eval suites are tiny next to a 100TB corpus) and BROADCASTS into the
    corpus-side n-gram stream — one map-side semi-join per corpus n-gram,
    one aggregation on doc id; the corpus is never shuffled on content."""
    from .dedup import word_shingles

    doc_grams = word_shingles(docs, id_col, text_col, n=n)
    bench_grams = (
        word_shingles(
            benchmark.select(F.col(bench_text_col).alias("text")).withColumn(
                "bid", F.lit(0)
            ),
            "bid",
            "text",
            n=n,
        )
        .select("shingle")
        .distinct()
    )
    return (
        doc_grams.join(F.broadcast(bench_grams), "shingle")
        .groupBy(F.col("id").alias("doc_id"))
        .agg(F.count("*").alias("n_hit_ngrams"))
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 13,
) -> DataFrame:
    """Drop every document sharing at least one word n-gram with the
    benchmark corpus (broadcast anti-join against contamination_hits)."""
    hits = contamination_hits(
        docs, benchmark, id_col, text_col, bench_text_col, n
    ).select(F.col("doc_id").alias(id_col))
    return docs.join(hits, id_col, "left_anti")


def pack_sequences(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_len: int = 2048,
    num_partitions: int | None = None,
) -> DataFrame:
    """GPT-style concat-and-chunk sequence packing assignment:
    documents concatenate in deterministic doc_id order into one token
    stream cut into fixed ``seq_len`` windows. Returns
    (doc_id, n_tokens, start_offset, first_seq, last_seq) — which training
    sequences each document lands in (documents straddle boundaries, the
    standard causal-LM packing).

    Scale shape — a DISTRIBUTED prefix sum, not a global window:
    repartitionByRange(doc_id) keeps ranges ordered by partition id, the
    running offset is a per-partition window cumsum plus a broadcast base
    from the (num-partitions-sized) per-partition totals. No single-
    partition global sort anywhere; the one collect is partition-count
    rows. Token count = whitespace tokens (swap in apply_bpe's counts for
    a trained tokenizer)."""
    from pyspark.sql.window import Window

    d = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.coalesce(F.col(text_col), F.lit("")), " "))
        .cast("long")
        .alias("n_tokens"),
    )
    if num_partitions:
        d = d.repartitionByRange(num_partitions, "doc_id")
    else:
        d = d.repartitionByRange("doc_id")
    d = d.withColumn("pid", F.spark_partition_id())
    w = (
        Window.partitionBy("pid")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = d.withColumn(
        "local_off", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    ).localCheckpoint(eager=True)  # pids are physical: pin them before the
    # two consumers (totals + join) can replan the upstream differently
    totals = d.groupBy("pid").agg(F.sum("n_tokens").alias("tot")).collect()
    base, acc = [], 0
    for r in sorted(totals, key=lambda r: r.pid):
        base.append((r.pid, acc))
        acc += int(r.tot)
    base_df = local_df(d.sparkSession, base, "pid int, base long")
    out = d.join(F.broadcast(base_df), "pid").select(
        "doc_id",
        "n_tokens",
        (F.col("base") + F.col("local_off")).alias("start_offset"),
    )
    return out.select(
        "doc_id",
        "n_tokens",
        "start_offset",
        F.floor(F.col("start_offset") / seq_len).alias("first_seq"),
        F.floor(
            (F.col("start_offset") + F.greatest(F.col("n_tokens"), F.lit(1)) - 1)
            / seq_len
        ).alias("last_seq"),
    )


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 256,
    overlap: int = 64,
) -> DataFrame:
    """RAG/serving-style chunking: sliding whitespace-token windows of
    ``chunk_tokens`` with ``overlap`` tokens of context between adjacent
    chunks (step = chunk_tokens - overlap). Returns
    (doc_id, chunk_idx, start_token, n_chunk_tokens, chunk_text); every
    document emits >= 1 chunk (short docs emit themselves).

    Chunk count is exact integer arithmetic —
    1 + ceil_div(n - chunk_tokens, step) when n > chunk_tokens — so a
    DuckDB oracle is bit-identical. Pure Catalyst (transform + explode):
    no shuffle at all, chunking is embarrassingly row-parallel and
    pipelines into whatever consumes it (embedding UDF, sink)."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap < chunk_tokens, got {overlap}/{chunk_tokens}"
        )
    step = chunk_tokens - overlap
    w = f"split({text_col}, ' ')"
    n = f"size({w})"
    k = (
        f"case when {n} <= {chunk_tokens} then 1 "
        f"else ({n} - {chunk_tokens} + {step - 1}) div {step} + 1 end"
    )
    chunks = F.expr(
        f"transform(sequence(0, {k} - 1), k -> struct("
        f"  cast(k as int) as chunk_idx,"
        f"  cast(1 + k * {step} as int) as start_token,"
        f"  cast(least({chunk_tokens}, {n} - k * {step}) as int)"
        f"    as n_chunk_tokens,"
        f"  concat_ws(' ', slice({w}, 1 + k * {step}, {chunk_tokens}))"
        f"    as chunk_text))"
    )
    return docs.select(
        F.col(id_col).alias("doc_id"), F.explode(chunks).alias("c")
    ).select("doc_id", "c.*")


def curate_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang: str = "en",
    min_words: int = 10,
    max_punct_pct: int = 10,
    jaccard_pct: int = 30,
    shingle_n: int = 3,
    max_df: int = 100,
) -> DataFrame:
    """(doc_id, n_words, reason='kept') for every surviving document.

    Filters are integer-exact: punctuation threshold is
    ``100 * n_punct <= max_punct_pct * n_chars``.
    """
    from .dedup import exact_dedup, jaccard_pairs, word_shingles
    from .textstats import lang_id, quality_stats

    ids = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))

    lang_keep = (
        lang_id(docs, id_col, text_col)
        .where(F.col("lang_pred") == lang)
        .select(F.col("id").alias("doc_id"))
    )
    q = quality_stats(docs, id_col, text_col)
    quality_keep = q.where(
        (F.col("n_words") >= min_words)
        & (100 * F.col("n_punct") <= max_punct_pct * F.col("n_chars_actual"))
    ).select(F.col("id").alias("doc_id"), "n_words")

    # exact dedup: only the canonical (min id) row of each content hash
    canon = exact_dedup(docs, id_col, text_col).select(
        F.col("canonical_id").alias("doc_id")
    )

    survivors = (
        ids.join(lang_keep, "doc_id")
        .join(quality_keep, "doc_id")
        .join(canon, "doc_id")
    )

    # near-dup removal among survivors: higher id of every jaccard pair out.
    # Shingles materialized once (sizes + df cap + both join sides consume
    # them — the persisted-shingle-stage pattern).
    sh = word_shingles(survivors, "doc_id", "text", n=shingle_n).localCheckpoint(
        eager=True
    )
    dupes = (
        jaccard_pairs(sh, threshold_pct=jaccard_pct, max_df=max_df)
        .select(F.col("b_id").alias("doc_id"))
        .distinct()
    )
    return (
        survivors.join(dupes, "doc_id", "left_anti")
        .select("doc_id", F.col("n_words").cast("long"), F.lit("kept").alias("reason"))
        .orderBy("doc_id")
    )


def group_split(
    df: DataFrame,
    group_col: str,
    val_ppm: int = 50_000,
    test_ppm: int = 50_000,
    salt: str = "split",
) -> DataFrame:
    """Leakage-safe train/val/test assignment: the split is a pure
    integer function of the GROUP key's md5, so every row of a group
    (conversation, domain, author...) lands in the same split — the
    guard against the eval-contamination mode where near-duplicate rows
    of one source straddle train and test (the reason Lee 2022-style
    dedup papers insist on grouped splits). Adds a ``split`` column.

    Mechanics: frac_ppm = (first-7-hex-digits of md5(group|salt) as an
    integer) * 1e6 div 16^7 — a uniform integer in [0, 1e6) — then
    test if frac_ppm < test_ppm, val if < test_ppm + val_ppm, else
    train. All integer arithmetic, so any md5-capable engine agrees
    bit-for-bit; changing ``salt`` redraws the entire assignment. Pure
    map stage — no shuffle, no per-group state."""
    if val_ppm < 0 or test_ppm < 0 or val_ppm + test_ppm > 1_000_000:
        raise ValueError(
            f"bad split fractions: val_ppm={val_ppm} test_ppm={test_ppm}"
        )
    frac = F.expr(
        "cast(conv(substring(md5(concat(cast("
        + group_col
        + " as string), '|', '"
        + salt
        + "')), 1, 7), 16, 10) as bigint) * 1000000 div 268435456"
    )
    return df.withColumn(
        "split",
        F.when(frac < F.lit(test_ppm), "test")
        .when(frac < F.lit(test_ppm + val_ppm), "val")
        .otherwise("train"),
    )


def _hashed_bigram_stream(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int,
) -> DataFrame:
    """(id, bucket): every adjacent whitespace-token pair of every
    document, hashed into ``n_buckets`` via the first 7 hex digits of
    md5 (the repo's cross-engine integer-hash idiom, cf. group_split)
    — DSIR's hashed bag-of-bigrams featurization. Positional events
    (duplicates kept): the importance weight counts occurrences."""
    from .lm import bigram_stream

    return bigram_stream(docs, id_col, text_col).select(
        "id",
        F.expr(
            "cast(conv(substring(md5(concat(w1, ' ', w2)), 1, 7), 16, 10)"
            f" as bigint) % {int(n_buckets)}"
        ).alias("bucket"),
    )


def dsir_weights(
    docs: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 512,
    min_ratio_ppm: int = 1_000_000,
) -> DataFrame:
    """Data Selection with Importance Resampling (DSIR, Xie et al.
    2023, arXiv:2302.03169) — integer-exact variant. Fit two
    add-one-smoothed hashed-bigram bag models, one on the ``target``
    domain sample and one on the raw ``docs`` corpus, then score every
    raw document by its bigram events' importance ratios:

      p_ppb(b)     = (count(b) + 1) * 1e9 div (total + n_buckets)
      ratio_ppm(b) = p_target_ppb(b) * 1e6 div max(p_raw_ppb(b), 1)

    Output per document: (id, n_events, sum_ratio_ppm, mean_ratio_ppm,
    selected) where mean is the truncating per-event mean and
    ``selected`` = mean_ratio_ppm >= min_ratio_ppm (default: events
    more target-like than raw on average). The paper's multiplicative
    log-weight orders documents the same way for near-flat ratios; the
    additive ppm form keeps every quantity BIGINT so any md5-capable
    engine reproduces it bit-for-bit (repo-wide oracle practice).
    Documents with < 2 tokens emit no row (no events — same contract
    as lm_doc_scores).

    Scale shape: two bucket-count aggregations whose outputs are
    ``n_buckets``-sized (map-side combine collapses the corpus to the
    feature alphabet), one-row totals broadcast-crossJoined into the
    ratio table, the ratio table BROADCAST to the event stream (no
    shuffle on the big side beyond the per-doc groupBy), and one
    doc-keyed aggregation. No collect on the data path; overflow-safe
    to ~1e3 events/doc at ratio ceiling 1e15 (documented bound)."""
    if n_buckets < 2:
        raise ValueError(f"dsir_weights: n_buckets must be >= 2: {n_buckets}")
    from pyspark.sql.functions import broadcast

    raw_ev = _hashed_bigram_stream(docs, id_col, text_col, n_buckets)
    tgt_ev = _hashed_bigram_stream(target, id_col, text_col, n_buckets)

    raw_cnt = raw_ev.groupBy("bucket").agg(
        F.count("*").cast("long").alias("c_raw")
    )
    tgt_cnt = tgt_ev.groupBy("bucket").agg(
        F.count("*").cast("long").alias("c_tgt")
    )
    raw_tot = raw_cnt.agg(F.sum("c_raw").cast("long").alias("n_raw"))
    tgt_tot = tgt_cnt.agg(
        F.coalesce(F.sum("c_tgt"), F.lit(0)).cast("long").alias("n_tgt")
    )
    # scored events only ever hit buckets present in the raw corpus, so
    # the raw count table is the ratio table's spine; absent target
    # buckets smooth to count 0.
    ratio = (
        raw_cnt.join(broadcast(tgt_cnt), "bucket", "left")
        .crossJoin(broadcast(raw_tot))
        .crossJoin(broadcast(tgt_tot))
        .select(
            "bucket",
            F.expr(
                "(coalesce(c_tgt, 0) + 1) * 1000000000"
                f" div (n_tgt + {int(n_buckets)})"
            ).alias("_p_tgt_ppb"),
            F.expr(
                f"(c_raw + 1) * 1000000000 div (n_raw + {int(n_buckets)})"
            ).alias("_p_raw_ppb"),
        )
        .select(
            "bucket",
            F.expr(
                "_p_tgt_ppb * 1000000 div greatest(_p_raw_ppb, 1)"
            ).alias("ratio_ppm"),
        )
    )
    scored = raw_ev.join(broadcast(ratio), "bucket").groupBy(
        F.col("id").alias(id_col)
    ).agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum("ratio_ppm").cast("long").alias("sum_ratio_ppm"),
    )
    return scored.select(
        id_col,
        "n_events",
        "sum_ratio_ppm",
        F.expr("sum_ratio_ppm div n_events").alias("mean_ratio_ppm"),
        (
            F.expr("sum_ratio_ppm div n_events") >= F.lit(int(min_ratio_ppm))
        ).alias("selected"),
    )


def dsir_sql(
    table: str,
    target_where: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 512,
    min_ratio_ppm: int = 1_000_000,
) -> str:
    """DuckDB oracle mirroring dsir_weights bit-for-bit: same md5
    bucket hash, same ppb/ppm integer quantization, same truncating
    divisions. ``target_where`` is the SQL predicate that defines the
    target-domain sample of ``table``."""
    B = int(n_buckets)
    bg = f"""
  SELECT {id_col} AS id,
         cast(concat('0x', substring(md5(concat(w1, ' ', w2)), 1, 7))
              AS BIGINT) % {B} AS bucket
  FROM (
    SELECT {id_col},
      unnest(list_transform(
        generate_series(1, greatest(len(ws) - 1, 0)), i -> ws[i])) AS w1,
      unnest(list_transform(
        generate_series(1, greatest(len(ws) - 1, 0)), i -> ws[i + 1])) AS w2
    FROM (SELECT {id_col}, string_split({text_col}, ' ') AS ws
          FROM {table}{{where}})
  )"""
    raw_bg = bg.format(where="")
    tgt_bg = bg.format(where=f" WHERE {target_where}")
    return f"""
WITH raw_ev AS ({raw_bg}
), tgt_ev AS ({tgt_bg}
), raw_cnt AS (
  SELECT bucket, cast(count(*) AS BIGINT) AS c_raw
  FROM raw_ev GROUP BY bucket
), tgt_cnt AS (
  SELECT bucket, cast(count(*) AS BIGINT) AS c_tgt
  FROM tgt_ev GROUP BY bucket
), tot AS (
  SELECT (SELECT cast(sum(c_raw) AS BIGINT) FROM raw_cnt) AS n_raw,
         (SELECT cast(coalesce(sum(c_tgt), 0) AS BIGINT) FROM tgt_cnt)
           AS n_tgt
), ratio AS (
  SELECT r.bucket,
         ((coalesce(t.c_tgt, 0) + 1) * 1000000000 // (tot.n_tgt + {B}))
           * 1000000
           // greatest((r.c_raw + 1) * 1000000000 // (tot.n_raw + {B}), 1)
           AS ratio_ppm
  FROM raw_cnt r LEFT JOIN tgt_cnt t ON r.bucket = t.bucket, tot
), scored AS (
  SELECT id AS {id_col},
         cast(count(*) AS BIGINT) AS n_events,
         cast(sum(ratio_ppm) AS BIGINT) AS sum_ratio_ppm
  FROM raw_ev JOIN ratio USING (bucket)
  GROUP BY id
)
SELECT {id_col}, n_events, sum_ratio_ppm,
       cast(sum_ratio_ppm // n_events AS BIGINT) AS mean_ratio_ppm,
       sum_ratio_ppm // n_events >= {int(min_ratio_ppm)} AS selected
FROM scored
"""


def k_anonymity_report(
    df: DataFrame,
    qi_cols: list,
    k_threshold: int = 5,
) -> DataFrame:
    """Re-identification risk screen (Sweeney 2002's k-anonymity):
    group rows by the quasi-identifier combination and bucket the
    group sizes — a corpus is k-anonymous over ``qi_cols`` iff every
    group has >= k members. Output, one row per occupied size bucket:

      (k_bucket in {'1','2-4','5-19','20+'}, n_groups, n_rows,
       at_risk, rows_share_ppm)

    at_risk = the bucket's minimum size < k_threshold;
    rows_share_ppm = this bucket's rows * 1e6 div total rows — sum it
    over at_risk buckets for the headline release-risk mass. The screen that runs before a transcript corpus
    leaves its enclave; pairs with redact_pii (the column fix) the
    way quality pairs with dedup.

    Scale shape: one QI-keyed aggregation (map-side combined) whose
    output is group-count-sized, then a 4-bucket rollup + a one-row
    total broadcast. No joins on the data."""
    if not qi_cols:
        raise ValueError("k_anonymity_report: qi_cols must be non-empty")
    if k_threshold < 2:
        raise ValueError(
            f"k_anonymity_report: k_threshold must be >= 2: {k_threshold}"
        )
    groups = df.groupBy(*qi_cols).agg(F.count("*").cast("long").alias("k"))
    bucket = (
        F.when(F.col("k") == 1, "1")
        .when(F.col("k") <= 4, "2-4")
        .when(F.col("k") <= 19, "5-19")
        .otherwise("20+")
    )
    lo = (
        F.when(F.col("k_bucket") == "1", 1)
        .when(F.col("k_bucket") == "2-4", 2)
        .when(F.col("k_bucket") == "5-19", 5)
        .otherwise(20)
    )
    agg = groups.select(bucket.alias("k_bucket"), "k").groupBy(
        "k_bucket"
    ).agg(
        F.count("*").cast("long").alias("n_groups"),
        F.sum("k").cast("long").alias("n_rows"),
    )
    from pyspark.sql.functions import broadcast

    total = agg.agg(F.sum("n_rows").cast("long").alias("_total"))
    return (
        agg.withColumn("at_risk", lo < F.lit(int(k_threshold)))
        .crossJoin(broadcast(total))
        .select(
            "k_bucket",
            "n_groups",
            "n_rows",
            "at_risk",
            F.expr("n_rows * 1000000 div _total").alias(
                "rows_share_ppm"
            ),
        )
    )


def mixture_weights(
    df: DataFrame,
    group_col: str,
    temperature: str = "sqrt",
) -> DataFrame:
    """Temperature-based data-mixture weights (the multilingual /
    multi-source sampling rule of mBERT/XLM-R: p_s proportional to
    n_s^alpha): per source, the sampling share that upweights small
    sources without letting head sources drown the mixture.

      temperature='proportional' -> alpha = 1   (raw shares)
      temperature='sqrt'         -> alpha = 1/2 (the standard rebalance)
      temperature='uniform'      -> alpha = 0   (equal shares)

    Output: (group, n_rows, weight_milli, sample_share_ppm,
    raw_share_ppm, boost_ppm) where weight_milli =
    floor(n^alpha * 1000) (for alpha=1/2 the only float step is ONE
    IEEE sqrt, correctly rounded and engine-identical), shares are
    truncating integer ppm over the milli-weight totals, and
    boost_ppm = sample_share * 1e6 div raw_share — >1e6 means the
    temperature boosts the source.

    Scale shape: one group count (map-side combined, output
    source-count-sized) + one-row totals broadcast; the corpus is
    scanned once."""
    alphas = {"proportional", "sqrt", "uniform"}
    if temperature not in alphas:
        raise ValueError(
            f"mixture_weights: temperature must be one of {sorted(alphas)}:"
            f" {temperature}"
        )
    counts = df.groupBy(F.col(group_col).alias("group")).agg(
        F.count("*").cast("long").alias("n_rows")
    )
    if temperature == "proportional":
        w = F.expr("n_rows * 1000")
    elif temperature == "sqrt":
        w = F.expr("cast(floor(sqrt(cast(n_rows as double)) * 1000) as bigint)")
    else:
        w = F.expr("1000L")
    weighted = counts.withColumn("weight_milli", w)
    from pyspark.sql.functions import broadcast

    tot = weighted.agg(
        F.sum("weight_milli").cast("long").alias("_wtot"),
        F.sum("n_rows").cast("long").alias("_ntot"),
    )
    return (
        weighted.crossJoin(broadcast(tot))
        .select(
            "group",
            "n_rows",
            "weight_milli",
            F.expr("weight_milli * 1000000 div _wtot").alias(
                "sample_share_ppm"
            ),
            F.expr("n_rows * 1000000 div _ntot").alias("raw_share_ppm"),
            F.expr(
                "(weight_milli * 1000000 div _wtot) * 1000000"
                " div greatest(n_rows * 1000000 div _ntot, 1)"
            ).alias("boost_ppm"),
        )
    )


def l_diversity_report(
    df: DataFrame,
    qi_cols: list,
    sensitive_col: str,
    l_threshold: int = 3,
) -> DataFrame:
    """Companion screen to :func:`k_anonymity_report` (Machanavajjhala
    2007's distinct l-diversity): k-anonymity alone is defeated by a
    HOMOGENEOUS group — if every row sharing a quasi-identifier
    combination carries the same sensitive value, group size protects
    nothing. Per QI group, l = the number of DISTINCT sensitive values;
    a corpus is l-diverse iff every group has >= l of them. Output, one
    row per occupied diversity bucket:

      (l_bucket in {'1','2','3-4','5+'}, n_groups, n_rows, at_risk,
       rows_share_ppm)

    at_risk = the bucket's minimum diversity < l_threshold; the '1'
    bucket is the homogeneity disclosure (attribute inferable with
    certainty from the QI alone). rows_share_ppm = bucket rows * 1e6
    div total, truncating integer — sum over at_risk buckets for the
    headline risk mass.

    Scale shape: one QI+sensitive distinct-collapse then one QI-keyed
    aggregation (both map-side combined; count(distinct) over a group
    never materializes value lists), a 4-bucket rollup, and a one-row
    total broadcast. No joins on the data."""
    if not qi_cols:
        raise ValueError("l_diversity_report: qi_cols must be non-empty")
    if l_threshold < 2:
        raise ValueError(
            f"l_diversity_report: l_threshold must be >= 2: {l_threshold}"
        )
    groups = df.groupBy(*qi_cols).agg(
        F.countDistinct(sensitive_col).cast("long").alias("l"),
        F.count("*").cast("long").alias("k"),
    )
    bucket = (
        F.when(F.col("l") == 1, "1")
        .when(F.col("l") == 2, "2")
        .when(F.col("l") <= 4, "3-4")
        .otherwise("5+")
    )
    lo = (
        F.when(F.col("l_bucket") == "1", 1)
        .when(F.col("l_bucket") == "2", 2)
        .when(F.col("l_bucket") == "3-4", 3)
        .otherwise(5)
    )
    agg = groups.select(bucket.alias("l_bucket"), "k").groupBy(
        "l_bucket"
    ).agg(
        F.count("*").cast("long").alias("n_groups"),
        F.sum("k").cast("long").alias("n_rows"),
    )
    from pyspark.sql.functions import broadcast

    total = agg.agg(F.sum("n_rows").cast("long").alias("_total"))
    return (
        agg.withColumn("at_risk", lo < F.lit(int(l_threshold)))
        .crossJoin(broadcast(total))
        .select(
            "l_bucket",
            "n_groups",
            "n_rows",
            "at_risk",
            F.expr("n_rows * 1000000 div _total").alias(
                "rows_share_ppm"
            ),
        )
    )


def t_closeness_report(
    df: DataFrame,
    qi_cols: list,
    sensitive_col: str,
    t_threshold_ppm: int = 200_000,
) -> DataFrame:
    """Third leg of the privacy-screen triple (Li 2007's t-closeness,
    categorical case): an l-diverse group still leaks if its sensitive
    DISTRIBUTION differs sharply from the corpus-wide one (skewness
    attack — 2 distinct values at 99:1 inside a group whose attribute
    is 50:50 globally). Per QI group, the total-variation distance

      tvd = 1/2 * sum_v |freq_group(v) - freq_global(v)|

    computed EXACTLY in integers: with group size k_g, global size N,
    group value count k_gv and global value count n_v,

      num_g = sum_{v in group} |k_gv*N - n_v*k_g| + k_g*(N - sum_{v in group} n_v)
      tvd_ppm = num_g * 1_000_000 div (2 * k_g * N)

    (the second term is every value ABSENT from the group, folded into
    one subtraction — no dense group x value expansion). Output, one
    row per occupied TVD band:

      (t_bucket in {'0-10%','10-20%','20-35%','35%+'}, n_groups,
       n_rows, n_groups_at_risk, rows_at_risk, rows_share_ppm)

    at-risk = the group's exact tvd_ppm > t_threshold_ppm (computed
    per group BEFORE banding, so any threshold works with the fixed
    display bands).

    Scale shape: one (QI+value) aggregation, one broadcast join against
    the value-count dim (sensitive cardinality-sized), one QI-keyed
    rollup, a 4-band rollup, and two one-row broadcasts. The corpus is
    scanned once; no data-sized joins."""
    if not qi_cols:
        raise ValueError("t_closeness_report: qi_cols must be non-empty")
    if not 0 < t_threshold_ppm < 1_000_000:
        raise ValueError(
            "t_closeness_report: t_threshold_ppm must be in (0, 1e6): "
            f"{t_threshold_ppm}"
        )
    from pyspark.sql.functions import broadcast

    gv = df.groupBy(*qi_cols, sensitive_col).agg(
        F.count("*").cast("long").alias("k_gv")
    )
    vdim = df.groupBy(sensitive_col).agg(
        F.count("*").cast("long").alias("n_v")
    )
    ntot = vdim.agg(F.sum("n_v").cast("long").alias("_n"))
    # the present-value term needs k_g (the group total) INSIDE the
    # abs(), so it cannot fold into one aggregate pass — join the group
    # sizes back onto the (QI, value) rows (QI-keyed shuffle of a
    # group-value-sized table, still no data-sized join) and aggregate
    # once more.
    ksz = gv.groupBy(*qi_cols).agg(F.sum("k_gv").cast("long").alias("k_g"))
    # products run in decimal(38,0): k_gv*N and k_g*N reach ~1e24 at
    # 1e12 input rows — past BIGINT (ANSI mode fails loud at 9.2e18) —
    # and the *1e6 ppm step tops out ~1e30, inside decimal's 1e38.
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    per_group = (
        gv.join(ksz, qi_cols)
        .join(broadcast(vdim), sensitive_col)
        .crossJoin(broadcast(ntot))
        .groupBy(*qi_cols)
        .agg(
            F.first("k_g").alias("k_g"),
            F.first("_n").alias("_n"),
            F.sum(
                F.abs(dec("k_gv") * dec("_n") - dec("n_v") * dec("k_g"))
            ).alias("present_num"),
            F.sum("n_v").cast("long").alias("sum_nv_present"),
        )
        .select(
            "k_g",
            F.expr(
                "cast((present_num"
                " + cast(k_g as decimal(38,0))"
                "   * cast(_n - sum_nv_present as decimal(38,0)))"
                " * 1000000"
                " div (2 * cast(k_g as decimal(38,0))"
                "        * cast(_n as decimal(38,0))) as bigint)"
            ).alias("tvd_ppm"),
        )
    )
    bucket = (
        F.when(F.col("tvd_ppm") < 100_000, "0-10%")
        .when(F.col("tvd_ppm") < 200_000, "10-20%")
        .when(F.col("tvd_ppm") < 350_000, "20-35%")
        .otherwise("35%+")
    )
    flagged = per_group.select(
        bucket.alias("t_bucket"),
        "k_g",
        (F.col("tvd_ppm") > F.lit(int(t_threshold_ppm))).alias("_risk"),
    )
    agg = flagged.groupBy("t_bucket").agg(
        F.count("*").cast("long").alias("n_groups"),
        F.sum("k_g").cast("long").alias("n_rows"),
        F.sum(F.when(F.col("_risk"), 1).otherwise(0))
        .cast("long").alias("n_groups_at_risk"),
        F.sum(F.when(F.col("_risk"), F.col("k_g")).otherwise(0))
        .cast("long").alias("rows_at_risk"),
    )
    total = agg.agg(F.sum("n_rows").cast("long").alias("_total"))
    return agg.crossJoin(broadcast(total)).select(
        "t_bucket",
        "n_groups",
        "n_rows",
        "n_groups_at_risk",
        "rows_at_risk",
        F.expr("n_rows * 1000000 div _total").alias("rows_share_ppm"),
    )


def priority_sample(
    df: DataFrame, id_col: str, weight_col: str, k: int,
    salt: str = "ps",
) -> DataFrame:
    """Priority sampling (Duffield, Lund & Thorup 2007, "Priority
    sampling for estimation of arbitrary subset sums"): a FIXED-SIZE
    weighted sample of k rows such that any subset-sum estimated by
    summing ``weight_est`` over the sample's members is UNBIASED — the
    100-TB answer to "keep 10k documents but preserve every
    group-by-weight total in expectation". Deterministic: the uniform
    u_i is a 28-bit md5 of (salt, id), so the sample is reproducible
    across runs and engines (the DuckDB oracle re-derives it exactly).

    Per row: priority q_i = w_i * 2^28 / u_i (u_i in [1, 2^28] — both
    operands exact integers, one IEEE double division, bit-identical
    in any IEEE engine). The sample is the top-k by (q desc, id asc);
    tau = the (k+1)-th priority (0 when n <= k); each sampled row's
    estimator is max(w_i, tau), reported in exact micro-units.

    Plan: one projection + TakeOrderedAndProject (top-(k+1) without a
    global sort materialization — each partition keeps k+1 rows, the
    driver merges), one broadcast of the scalar tau. Returns
    (id, weight, weight_est_micro) ordered by id."""
    u = (
        f"cast(conv(substring(md5(concat('{salt}', ':',"
        f" cast({id_col} as string))), 1, 7), 16, 10) as bigint) + 1"
    )
    pr = df.select(
        F.col(id_col).alias("id"),
        F.col(weight_col).cast("double").alias("weight"),
        (
            F.col(weight_col).cast("double")
            * F.lit(float(1 << 28))
            / F.expr(u).cast("double")
        ).alias("q"),
    )
    top = pr.orderBy(F.desc("q"), F.asc("id")).limit(k + 1)
    rows = top.collect()  # k+1 rows: sample-sized, not data-sized
    if len(rows) <= k:
        tau = 0.0
        keep = rows
    else:
        tau = rows[-1]["q"]
        keep = rows[:-1]
    spark = df.sparkSession
    out = local_df(spark, 
        [
            (
                r["id"],
                r["weight"],
                # half-away-from-zero like DuckDB round() — python round()
                # is half-to-even and would diverge on exact .5 micro-units
                int(max(r["weight"], tau) * 1_000_000 + 0.5),
            )
            for r in keep
        ],
        f"id {df.schema[id_col].dataType.simpleString()},"
        " weight double, weight_est_micro long",
    )
    return out.orderBy("id")


def priority_sample_python(
    items: list[tuple], k: int, salt: str = "ps"
) -> list[tuple]:
    """Flat twin of priority_sample over [(id, weight)] — identical md5
    uniforms, identical double arithmetic, identical tie rule."""
    import hashlib

    pr = []
    for i, w in items:
        u = int(
            hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:7], 16
        ) + 1
        pr.append((i, float(w), float(w) * float(1 << 28) / float(u)))
    pr.sort(key=lambda t: (-t[2], t[0]))
    if len(pr) <= k:
        tau = 0.0
        keep = pr
    else:
        tau = pr[k][2]
        keep = pr[:k]
    return sorted(
        (i, w, int(max(w, tau) * 1_000_000 + 0.5)) for i, w, _ in keep
    )
