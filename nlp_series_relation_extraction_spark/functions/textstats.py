"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All JVM-side Catalyst expressions (no Python UDFs),
integer-exact so DuckDB oracles match bit-for-bit."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic language ID from char-class counts: >=90% ascii-letter/space
    -> 'en'; majority CJK -> 'zh'; else 'other'."""
    ascii_n = F.length(F.regexp_replace(F.col(text_col), "[^A-Za-z ]", ""))
    cjk_n = F.length(
        F.regexp_replace(F.col(text_col), "[^\\x{4e00}-\\x{9fff}]", "")
    )
    total = F.length(F.col(text_col))
    return df.select(
        F.col(id_col).alias("id"),
        ascii_n.alias("n_ascii"),
        cjk_n.alias("n_cjk"),
        total.alias("n_total"),
        F.when(ascii_n * 10 >= total * 9, F.lit("en"))
        .when(cjk_n * 2 >= total, F.lit("zh"))
        .otherwise(F.lit("other"))
        .alias("lang_pred"),
    )


def quality_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Integer quality-score components per document."""
    words = F.split(F.col(text_col), " ")
    # inside a Spark SQL string literal a backslash is itself an escape, so
    # the regex \b must arrive as \\b in the expression text
    stop_re = "\\\\b(" + "|".join(STOPWORDS) + ")\\\\b"
    return df.select(
        F.col(id_col).alias("id"),
        F.length(text_col).alias("n_chars_actual"),
        F.size(words).alias("n_words"),
        F.size(F.expr(f"regexp_extract_all({text_col}, '{stop_re}', 0)")).alias(
            "n_stopwords"
        ),
        F.length(F.regexp_replace(F.col(text_col), "[A-Za-z0-9 ]", "")).alias(
            "n_punct"
        ),
        F.size(F.array_distinct(words)).alias("n_distinct_words"),
    )


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace + BPE-ish regex token counts."""
    return df.select(
        F.col(id_col).alias("id"),
        F.size(F.split(F.col(text_col), " ")).alias("n_ws_tokens"),
        F.size(
            F.expr(
                rf"regexp_extract_all({text_col}, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]', 0)"
            )
        ).alias("n_bpe_tokens"),
    )


# PII patterns in the Java-regex/RE2 COMMON subset (no lookarounds, no
# backrefs) so Spark and the DuckDB oracle behave identically
PII_PATTERNS = (
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+", "<EMAIL>"),
    ("url", "https?://[^ ]+", "<URL>"),
    ("phone", "\\+?[0-9][0-9 -]{6,}[0-9]", "<PHONE>"),
)


def redact_pii(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, redacted, n_email, n_url, n_phone): mask emails, URLs and
    phone-like digit runs with typed placeholder tokens (the standard
    pre-training privacy scrub). Patterns apply IN ORDER and each pattern
    counts matches on the text state BEFORE its own replacement (so digits
    inside an already-masked email never double-count as a phone). Pure
    Catalyst, no UDFs."""
    cur = F.col(text_col)
    counts = {}
    for name, pat, token in PII_PATTERNS:
        counts[name] = F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0)))
        cur = F.regexp_replace(cur, pat, token)
    return df.select(
        F.col(id_col).alias("id"),
        cur.alias("redacted"),
        *[counts[name].alias(f"n_{name}") for name, _, _ in PII_PATTERNS],
    )


def fingerprints(
    df: DataFrame, id_col: str, text_col: str, n: int = 5, k: int = 3
) -> DataFrame:
    """Winnowing-style document fingerprint: the k lexicographically
    smallest md5 digests of word n-gram shingles, concatenated. Robust to
    local edits; deterministic across engines.

    One aggregation (slice of the sorted per-doc hash list) instead of a
    window row_number pass — same single shuffle on id but no global
    per-partition sort of every shingle row, and no second aggregation."""
    from .dedup import word_shingles

    sh = word_shingles(df, id_col, text_col, n=n)
    hashed = sh.select("id", F.md5("shingle").alias("h"))
    return hashed.groupBy("id").agg(
        F.concat_ws(
            "|", F.slice(F.array_sort(F.collect_list("h")), 1, k)
        ).alias("fingerprint")
    )


def repetition_stats(
    df: DataFrame, id_col: str, text_col: str, n: int = 2
) -> DataFrame:
    """Gopher-style within-document repetition signals, integer-exact:
    (id, n_words, n_ngrams, n_dup_ngram_occurrences, top_ngram_count).

    * ``n_ngrams`` — total word n-gram OCCURRENCES (not distinct);
    * ``n_dup_ngram_occurrences`` — occurrences belonging to an n-gram that
      appears more than once in the document (the "duplicate n-gram
      fraction" numerator, denominator n_ngrams);
    * ``top_ngram_count`` — occurrences of the most frequent n-gram (the
      "top n-gram share" numerator).

    Filtering on these ratios is the standard repeated-boilerplate /
    degenerate-text drop in LLM data curation. Two aggregations: one on
    (id, ngram), one on id — no self-join, no window."""
    w = f"split({text_col}, ' ')"
    grams = F.expr(
        f"case when size({w}) >= {n} then "
        f"transform(sequence(1, size({w}) - {n - 1}),"
        f" i -> concat_ws(' ', slice({w}, i, {n}))) "
        f"else array() end"
    )
    from .partitioning import ensure_parallelism

    occ = ensure_parallelism(df).select(
        F.col(id_col).alias("id"),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_words"),
        F.explode_outer(grams).alias("ngram"),
    )
    per_gram = occ.groupBy("id", "n_words", "ngram").agg(
        F.count("ngram").alias("cnt")
    )
    return per_gram.groupBy("id", "n_words").agg(
        F.sum("cnt").alias("n_ngrams"),
        F.coalesce(
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt"))), F.lit(0)
        ).alias("n_dup_ngram_occurrences"),
        F.coalesce(F.max("cnt"), F.lit(0)).alias("top_ngram_count"),
    )


def lexical_diversity(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Vocabulary-richness profile per document — the degenerate-text
    screens Gopher/CCNet-style pipelines stack next to repetition
    stats: (id, n_tokens, n_types, ttr_ppm, hapax_ppm, yule_k_centi).

      ttr_ppm      = types * 1e6 div tokens      (type-token ratio)
      hapax_ppm    = once-types * 1e6 div types  (hapax legomena share)
      yule_k_centi = 1e6 * (sum m^2 - N) div N^2 (Yule's K * 100 —
                     repeat-mass curvature, length-robust where raw
                     TTR is not; m = each type's occurrence count)

    All truncating integer arithmetic over whitespace tokens (the
    package-wide tokenization; empty/NULL text emits no row — zero
    tokens has no defined richness). Scale shape: one explode + one
    (id, token) count + one id aggregation — two shuffles on the id
    key, map-side combined; no joins, no windows."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).where(F.col("tok") != "")
    per_type = toks.groupBy("id", "tok").agg(
        F.count("*").cast("long").alias("m")
    )
    agg = per_type.groupBy(F.col("id").alias(id_col)).agg(
        F.sum("m").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_types"),
        F.sum(F.when(F.col("m") == 1, 1).otherwise(0))
        .cast("long")
        .alias("_hapax"),
        F.sum(F.col("m") * F.col("m")).cast("long").alias("_s2"),
    )
    return agg.select(
        id_col,
        "n_tokens",
        "n_types",
        F.expr("n_types * 1000000 div n_tokens").alias("ttr_ppm"),
        F.expr("_hapax * 1000000 div n_types").alias("hapax_ppm"),
        F.expr(
            "(1000000 * (_s2 - n_tokens)) div (n_tokens * n_tokens)"
        ).alias("yule_k_centi"),
    )


def winnowing_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken
    SIGMOD'03 — the MOSS algorithm): hash every character k-gram, then
    from each window of ``w`` consecutive hashes keep the RIGHTMOST
    minimum; the kept (hash, position) pairs are the fingerprints.
    Guarantees every shared substring of length >= k + w - 1 yields at
    least one shared fingerprint (the paper's coverage theorem), at
    ~2/(w+1) selection density — the local, position-bearing
    complement to the whole-document fingerprints() above, and the
    primitive plagiarism / license-scan / fine-grained-copy detectors
    build on.

    Returns distinct (id, pos, hash) with pos the 1-based k-gram
    offset; hash is the first-7-hex-digits-of-md5 integer (the repo's
    cross-engine idiom). Documents shorter than k emit nothing; with
    fewer than w k-grams the whole sequence is one window.

    Scale shape: one k-gram projection (JVM substring+md5), a
    w-way window-membership explode (the O(w) blowup buys a pure
    groupBy instead of cross-row window comparisons — w is a small
    constant), ONE (id, window) aggregation whose lexicographic
    struct-min implements min-hash-then-rightmost, and a distinct.
    All shuffles key on (id, window): co-partitioned, combiner-
    friendly, no joins."""
    if k < 1 or w < 1:
        raise ValueError(f"winnowing_fingerprints: bad k={k} w={w}")
    L = F.length(F.coalesce(F.col(text_col), F.lit("")))
    n_hashes = (L - F.lit(k) + 1).alias("n_hashes")
    grams = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("_t"),
        n_hashes,
    ).where(F.col("n_hashes") >= 1)
    hashed = grams.select(
        "id",
        "n_hashes",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, n_hashes), i -> "
                f"cast(conv(substring(md5(substring(_t, i, {k})), 1, 7),"
                f" 16, 10) as bigint))"
            )
        ).alias("pos0", "hash"),
    ).select(
        "id",
        "n_hashes",
        (F.col("pos0") + 1).alias("pos"),
        "hash",
    )
    memb = hashed.select(
        "id",
        "pos",
        "hash",
        F.explode(
            F.expr(
                f"sequence(greatest(1, pos - {w} + 1),"
                f" least(pos, greatest(n_hashes - {w} + 1, 1)))"
            )
        ).alias("win"),
    )
    picked = memb.groupBy("id", "win").agg(
        F.min(F.struct(F.col("hash"), (-F.col("pos")).alias("_np"))).alias(
            "m"
        )
    )
    return (
        picked.select(
            F.col("id").alias(id_col),
            (-F.col("m._np")).cast("int").alias("pos"),
            F.col("m.hash").alias("hash"),
        )
        .distinct()
    )


URL_RE = r"https?://[^\s<>\"')\]]+"
_DOMAIN_RE = r"^https?://([^/:?#]+)"


def url_domain_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Link provenance profile: extract every http(s) URL, reduce to
    its host (www. stripped, lowercased), and count per domain —
    (domain, n_urls, n_docs). The inputs to domain-level trust priors
    in curation (boilerplate mills vs reference sites) and to the
    citation graphs KG pipelines hang provenance on. Naive host
    parse by design (no PSL registrable-domain table — documented
    scope; a suffix list drops in as a broadcast join).

    One regexp_extract_all + explode + domain-keyed count; no joins."""
    low = f"coalesce({text_col}, '')"
    # escape for the SQL string literal: double backslashes AND quotes
    # (the URL charset excludes ' which the literal would otherwise eat)
    upat = URL_RE.replace("\\", "\\\\").replace("'", "''")
    dpat = _DOMAIN_RE.replace("\\", "\\\\")
    urls = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.expr(f"regexp_extract_all({low}, '{upat}', 0)")
        ).alias("url"),
    )
    dom = urls.select(
        "id",
        F.expr(
            f"regexp_replace(lower(regexp_extract(url, '{dpat}', 1)),"
            " '^www\\\\.', '')"
        ).alias("domain"),
    ).where(F.col("domain") != "")
    return dom.groupBy("domain").agg(
        F.count("*").cast("long").alias("n_urls"),
        F.countDistinct("id").cast("long").alias("n_docs"),
    )


def rake_keyphrases(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    stopwords: tuple = STOPWORDS,
) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010): candidate phrases
    are maximal runs of non-stopword tokens; each word scores
    degree/frequency over the document's candidates (degree = summed
    length of the phrases it appears in, frequency = its occurrence
    count); a phrase scores the sum of its word scores; the top ``k``
    phrases per document are kept.

    Everything is relational and integer-exact, so the DuckDB oracle
    replays it bit-for-bit: phrase segmentation is gaps-and-islands
    (pos - row_number over non-stopword tokens — no regex dialect in
    play), word scores are truncating integer ppm (deg * 1e6 div
    freq), phrase scores are sums of those, and the per-document top-k
    is a row_number window ordered (score desc, phrase asc, start
    asc). Scale shape: one posexplode, three document-keyed hash
    aggregations, one document-keyed window — no joins beyond the
    word-score dimension join, nothing corpus-quadratic.

    Returns (id_col, phrase, n_words, score_ppm, rank).
    """
    if k < 1:
        raise ValueError(f"rake_keyphrases: k must be >= 1, got {k}")
    stop_arr = F.array(*[F.lit(s) for s in stopwords])
    words = (
        docs.select(
            F.col(id_col).alias("_id"),
            F.posexplode(
                F.split(F.lower(F.col(text_col)), " ")
            ).alias("pos", "w"),
        )
        .where(F.length("w") > 0)
        .withColumn("is_stop", F.array_contains(stop_arr, F.col("w")))
    )
    # gaps-and-islands: consecutive non-stopword tokens share
    # (pos - dense run index) per document
    runs = (
        words.where(~F.col("is_stop"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("_id").orderBy("pos")
            ),
        )
        .withColumn("run_key", F.col("pos") - F.col("rn"))
    )
    phrases = runs.groupBy("_id", "run_key").agg(
        F.array_join(
            F.expr("transform(array_sort(collect_list(struct(pos, w)))," 
                   " x -> x.w)"),
            " ",
        ).alias("phrase"),
        F.count("*").cast("long").alias("n_words"),
        F.min("pos").alias("start_pos"),
    )
    # per-document word stats over candidate occurrences
    occ = runs.join(
        phrases.select("_id", "run_key", "n_words"), ["_id", "run_key"]
    )
    wstats = occ.groupBy("_id", "w").agg(
        F.count("*").cast("long").alias("freq"),
        F.sum("n_words").cast("long").alias("deg"),
    ).withColumn(
        "wscore_ppm", F.expr("deg * 1000000L div freq").cast("long")
    )
    scored = (
        occ.join(wstats, ["_id", "w"])
        .groupBy("_id", "run_key")
        .agg(F.sum("wscore_ppm").cast("long").alias("score_ppm"))
        .join(phrases, ["_id", "run_key"])
        # identical phrase text scores identically within a document
        # (scores are functions of the words alone) — collapse repeats
        # to one distinct candidate, earliest occurrence as tiebreak
        .groupBy("_id", "phrase")
        .agg(
            F.min("n_words").alias("n_words"),
            F.min("score_ppm").alias("score_ppm"),
            F.min("start_pos").alias("start_pos"),
        )
    )
    ranked = scored.withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("_id").orderBy(
                F.desc("score_ppm"), F.asc("phrase"), F.asc("start_pos")
            )
        ),
    ).where(F.col("rank") <= k)
    return ranked.select(
        F.col("_id").alias(id_col),
        "phrase",
        "n_words",
        "score_ppm",
        F.col("rank").cast("int").alias("rank"),
    )
