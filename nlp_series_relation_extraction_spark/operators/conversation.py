"""Conversation-level operators over the transcripts table.

The reference extracts per sentence; a transcript-native pipeline wants
the SAME per-turn extraction but with the preceding dialogue available —
coreference ("she", "that model") resolves only with context. This module
assembles that context relationally, per turn, without ever collecting a
conversation into the driver.

Scale shape: one shuffle on conv_id — the table's native partitioning
(the north rule repartitions transcripts on conv_id anyway), so when the
input is already conv_id-bucketed the exchange disappears and the window
runs map-side per conversation. Window state is bounded by ``k`` turns,
not conversation length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def turns_with_context(
    transcripts: DataFrame,
    k: int = 2,
    sep: str = " [CTX] ",
    roles: bool = True,
) -> DataFrame:
    """Add ``context_text`` = the previous ``k`` turns of the same
    conversation (oldest first), ``n_context_turns``, and keep every
    original column. Turn 0 gets an empty context (''), matching what a
    context-aware encoder feeds its left segment.

    ``roles=True`` prefixes each context turn with its role
    ("user: ...") — the standard chat-template shape; the rows-frame
    collect_list preserves turn order deterministically (frame order ==
    ORDER BY order)."""
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(-k, -1)
    )
    # coalesce: a NULL text/role must still occupy its context slot (as
    # ''), matching engines where concat skips NULL args (DuckDB twin) —
    # plain concat would be NULL and collect_list silently drops NULLs,
    # shifting every later window and undercounting n_context_turns.
    role_c = F.coalesce(F.col("role"), F.lit(""))
    text_c = F.coalesce(F.col("text"), F.lit(""))
    turn = F.concat(role_c, F.lit(": "), text_c) if roles else text_c
    ctx = F.collect_list(turn).over(w)
    return transcripts.select(
        "*",
        F.array_join(ctx, sep).alias("context_text"),
        F.size(ctx).cast("int").alias("n_context_turns"),
    )


def role_transitions(transcripts: DataFrame) -> DataFrame:
    """Dialogue-act transition matrix: for every adjacent turn pair of a
    conversation, count (from_role -> to_role) and its conditional
    probability P(to | from). The Markov fingerprint of a transcript
    corpus — agent-loop detection (assistant->tool->assistant cycles),
    protocol drift between corpus snapshots, and a sanity gate before
    training on scraped dialogues (a corpus whose user->user mass is high
    is mis-threaded).

    Plan: one window pass on the transcript's native conv_id partitioning
    (lead(role) — no self-join), then a transition-matrix-sized groupBy
    with map-side combine; the probability normalizer is a window over
    the AGGREGATED matrix (|roles|^2 rows), never the data. prob is one
    integer->double division, so cross-engine comparison is bit-exact."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    pairs = transcripts.select(
        F.col("role").alias("from_role"),
        F.lead("role").over(w).alias("to_role"),
    ).where(F.col("to_role").isNotNull())
    counts = pairs.groupBy("from_role", "to_role").agg(
        F.count("*").cast("long").alias("n")
    )
    w_from = Window.partitionBy("from_role")
    return counts.select(
        "from_role",
        "to_role",
        "n",
        (
            F.col("n").cast("double")
            / F.sum("n").over(w_from).cast("double")
        ).alias("prob"),
    )


def sequence_ngrams(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    token_col: str,
    n: int = 3,
    min_count: int = 1,
) -> DataFrame:
    """Frequent contiguous n-grams over per-key ordered token sequences —
    tool-call pattern mining on agent transcripts (which tool chains do
    agents actually run?), event-funnel discovery on clickstreams. Gapped
    sequential patterns (PrefixSpan) are a different operator; contiguous
    n-grams are the 100-TB-cheap screen that usually answers the question.

    Plan: ONE window pass per extra gram position (lead(token, i) over
    the key's native ordering — Catalyst folds the leads into a single
    Window node), then a groupBy whose output is vocabulary-sized, with
    map-side combine. No self-joins, no explode; rows never leave their
    key's partition before aggregation."""
    if n < 2:
        raise ValueError(f"n-gram length must be >= 2, got {n}")
    # null tokens (a transcript's tool column is null on non-tool turns)
    # drop out BEFORE the window: grams are contiguous over the key's
    # non-null token subsequence — the tool-chain reading of "adjacent"
    df = df.where(F.col(token_col).isNotNull())
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    grams = df.select(
        F.col(token_col).alias("g0"),
        *[
            F.lead(token_col, i).over(w).alias(f"g{i}")
            for i in range(1, n)
        ],
    ).where(F.col(f"g{n - 1}").isNotNull())
    out = (
        grams.groupBy(*[f"g{i}" for i in range(n)])
        .agg(F.count("*").cast("long").alias("n_occurrences"))
        .where(F.col("n_occurrences") >= min_count)
    )
    return out.select(
        F.concat_ws(" -> ", *[f"g{i}" for i in range(n)]).alias("ngram"),
        "n_occurrences",
    )


def gapped_pair_support(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    token_col: str,
    min_support: int = 1,
) -> DataFrame:
    """Sequential pattern support at length 2 with ARBITRARY gaps —
    PrefixSpan's first level (Pei 2001): support(a -> b) = how many
    sequences contain token a somewhere before token b (EXISTS
    semantics — multiplicity inside one sequence doesn't inflate the
    count). The gapped complement of sequence_ngrams' contiguous
    counts: "users who search eventually purchase", whatever lies
    between.

    Plan: the quadratic term is defused BEFORE any join — each key
    reduces to one row per DISTINCT token (min_pos, max_pos) via a
    map-side-combined aggregation, so the per-key self-join fans out by
    per-key VOCABULARY size, not sequence length (a 10^6-turn
    conversation with 40 tool names is 40x40, not 10^12). a -> b holds
    iff min_pos(a) < max_pos(b); a -> a iff the token repeats. Support
    counting is a second vocabulary-sized aggregation."""
    pos = F.struct(*[F.col(c) for c in order_cols])
    per_token = (
        df.where(F.col(token_col).isNotNull())
        .groupBy(key_col, token_col)
        .agg(F.min(pos).alias("min_pos"), F.max(pos).alias("max_pos"))
    )
    a = per_token.select(
        F.col(key_col).alias("_k"),
        F.col(token_col).alias("token_a"),
        "min_pos",
    )
    b = per_token.select(
        F.col(key_col).alias("_k"),
        F.col(token_col).alias("token_b"),
        "max_pos",
    )
    return (
        a.join(b, "_k")
        .where(F.col("min_pos") < F.col("max_pos"))
        .groupBy("token_a", "token_b")
        .agg(F.count("*").cast("long").alias("support"))
        .where(F.col("support") >= min_support)
    )


def resolve_anaphora(
    mentions: DataFrame,
    by_type: bool = True,
    max_turn_gap: int | None = None,
) -> DataFrame:
    """Rule-based anaphora resolution over a conversation mention stream
    — the recency heuristic that covers the bulk of transcript pronouns
    (Hobbs' baseline: nearest preceding compatible mention; cf. the
    reference's per-sentence-only extraction, run_evaluation.py, which
    simply drops pronoun-subject triples because the antecedent is in an
    earlier sentence).

    Input: ``(conv_id, turn_idx, mention_idx, surface, entity_type,
    is_pronoun)`` — one row per mention in document order within the
    turn. Each pronoun resolves to the most recent PRECEDING
    non-pronoun mention in the same conversation (and, with
    ``by_type=True``, of the pronoun's compatible ``entity_type`` — 他
    only binds 人物, 该片 only binds 影视作品). Non-pronoun mentions
    resolve to themselves.

    Adds ``antecedent_surface``, ``antecedent_turn_idx``,
    ``antecedent_mention_idx`` (NULL for a pronoun with no antecedent —
    conversation-initial 他), and ``resolved_surface``.
    ``max_turn_gap`` additionally NULLs a resolution whose antecedent is
    more than that many turns back (stale binding guard).

    Scale shape: ONE window over (conv_id[, entity_type]) — the
    table's native conv_id partitioning, so pre-bucketed input runs it
    without an exchange; window state is one struct per partition
    (running last), not the conversation's mention list.
    """
    keys = ["conv_id", "entity_type"] if by_type else ["conv_id"]
    w = (
        Window.partitionBy(*keys)
        .orderBy("turn_idx", "mention_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ante = F.last(
        F.when(
            ~F.col("is_pronoun"),
            F.struct("surface", "turn_idx", "mention_idx"),
        ),
        ignorenulls=True,
    ).over(w)
    out = mentions.select(
        "*",
        F.when(F.col("is_pronoun"), ante).alias("_ante"),
    )
    if max_turn_gap is not None:
        out = out.withColumn(
            "_ante",
            F.when(
                F.col("turn_idx") - F.col("_ante.turn_idx")
                <= int(max_turn_gap),
                F.col("_ante"),
            ),
        )
    return out.select(
        "conv_id",
        "turn_idx",
        "mention_idx",
        "surface",
        "entity_type",
        "is_pronoun",
        F.col("_ante.surface").alias("antecedent_surface"),
        F.col("_ante.turn_idx").alias("antecedent_turn_idx"),
        F.col("_ante.mention_idx").alias("antecedent_mention_idx"),
        F.when(F.col("is_pronoun"), F.col("_ante.surface"))
        .otherwise(F.col("surface"))
        .alias("resolved_surface"),
    )


def topic_segments(
    transcripts: DataFrame,
    min_jaccard_ppm: int = 200_000,
) -> DataFrame:
    """Lexical topic-shift segmentation (the TextTiling idea — Hearst
    1997 — reduced to its adjacent-turn core): a turn opens a new
    segment when its token-set Jaccard overlap with the PREVIOUS turn
    of the same conversation falls below ``min_jaccard_ppm``. The
    transcript-side twin of functions/curation.py's chunking: context
    assembly (turns_with_context) wants windows that stop at topic
    boundaries, and per-segment grouping is what a downstream
    summarize-per-topic stage keys on.

    Input: (conv_id, turn_idx, text). Returns every input row plus

      (jaccard_prev_ppm, is_boundary, segment_idx)

    * jaccard_prev_ppm — |tokens ∩ prev| * 1e6 DIV |tokens ∪ prev|
      over DISTINCT lowercased whitespace tokens ('' tokens dropped);
      NULL on each conversation's first turn; 1e6 when both turns are
      empty (no evidence of a shift).
    * is_boundary — first turn of a conversation, or overlap below the
      threshold.
    * segment_idx — running count of boundaries so far (1-based), i.e.
      the turn's topic-segment id within its conversation.

    Scale shape: ONE conv_id shuffle feeding two stacked windows (lag
    + running sum — same partitioning, one exchange, cf.
    turns_with_context); token sets are per-row arrays, never
    exploded, so no corpus-sized blowup. All ratios truncating integer
    ppm — bit-exact vs the DuckDB twin."""
    toks = F.array_remove(
        F.array_distinct(
            F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), " ")
        ),
        "",
    )
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    with_prev = transcripts.select(
        "*",
        toks.alias("_toks"),
    ).select(
        "*",
        F.lag("_toks").over(w).alias("_prev"),
    )
    sized = with_prev.select(
        "*",
        F.size(F.array_intersect(F.col("_toks"), F.col("_prev")))
        .cast("long")
        .alias("_inter"),
        F.size(F.array_union(F.col("_toks"), F.col("_prev")))
        .cast("long")
        .alias("_uni"),
    )
    jac = (
        F.when(F.col("_prev").isNull(), F.lit(None).cast("long"))
        .when(F.col("_uni") == 0, F.lit(1_000_000).cast("long"))
        .otherwise(F.expr("(_inter * 1000000L) div _uni"))
    )
    scored = sized.select(
        "*",
        jac.alias("jaccard_prev_ppm"),
    ).select(
        "*",
        (
            F.col("_prev").isNull()
            | (F.col("jaccard_prev_ppm") < min_jaccard_ppm)
        ).alias("is_boundary"),
    )
    seg_w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return scored.select(
        "*",
        F.sum(F.col("is_boundary").cast("long"))
        .over(seg_w)
        .alias("segment_idx"),
    ).drop("_toks", "_prev", "_inter", "_uni")


FIRST_PERSON = ("i", "me", "my", "we", "us", "our", "myself")
SECOND_PERSON = ("you", "your", "yours", "yourself")


def ground_deictic(
    triples: DataFrame,
    turns: DataFrame,
    first_person: tuple = FIRST_PERSON,
    second_person: tuple = SECOND_PERSON,
) -> DataFrame:
    """Deictic subject grounding: rewrite first/second-person triple
    subjects to the speaking / addressed participant — the step that
    turns "I deployed the service" (useless as a KG node) into
    (assistant, deployed, service). The reference's per-sentence heads
    emit the pronoun surface verbatim (its eval then counts a literal
    '我' subject, models/model_*.py decode paths); in multi-turn agent
    transcripts the speaker IS known from ``role``, so this is free
    signal the single-sentence formulation cannot use.

    ``turns``: (conv_id, turn_idx, role). ``triples``: (conv_id,
    turn_idx, subj, pred, obj). Rules, case-insensitive on the subject:

    * subject in ``first_person``  -> the turn's own ``role``
      (grounding = 'first').
    * subject in ``second_person`` -> the addressee: the role of the
      most recent PRECEDING turn with a different role; if the run of
      same-role turns reaches the conversation start, the EARLIEST
      FOLLOWING different role (grounding = 'second'); a mono-role
      conversation leaves the subject unchanged ('unresolved').
    * anything else passes through (grounding = 'none').

    Scale shape: addressee is computed on the TURNS table (small side:
    one row per turn, no triple fan-out) with two stacked windows over
    ONE conv_id exchange — forward: last(prev_role where it differs,
    ignore nulls); backward: the mirror with lead — then coalesced.
    Triples join that per-turn grounding on (conv_id, turn_idx): the
    extraction output's native key, co-partitioned with the
    conv_id-bucketed table layout, so at 100 TB the join is
    shuffle-free on the triple side of a bucketed store."""
    fp = [s.lower() for s in first_person]
    sp = [s.lower() for s in second_person]
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    wd = Window.partitionBy("conv_id").orderBy(F.desc("turn_idx"))
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    cumd = wd.rowsBetween(Window.unboundedPreceding, 0)
    tt = (
        turns.select("conv_id", "turn_idx", "role")
        .withColumn("_prev", F.lag("role").over(w))
        .withColumn("_next", F.lag("role").over(wd))
    )
    tt = tt.select(
        "conv_id",
        "turn_idx",
        "role",
        F.last(
            F.when(F.col("_prev") != F.col("role"), F.col("_prev")),
            ignorenulls=True,
        )
        .over(cum)
        .alias("_addr_prev"),
        F.last(
            F.when(F.col("_next") != F.col("role"), F.col("_next")),
            ignorenulls=True,
        )
        .over(cumd)
        .alias("_addr_next"),
    ).select(
        "conv_id",
        "turn_idx",
        "role",
        F.coalesce("_addr_prev", "_addr_next").alias("addressee"),
    )
    j = triples.join(tt, ["conv_id", "turn_idx"], "left")
    low = F.lower(F.col("subj"))
    return j.select(
        "conv_id",
        "turn_idx",
        "subj",
        "pred",
        "obj",
        F.when(low.isin(fp), F.coalesce(F.col("role"), F.col("subj")))
        .when(low.isin(sp), F.coalesce(F.col("addressee"), F.col("subj")))
        .otherwise(F.col("subj"))
        .alias("grounded_subj"),
        F.when(low.isin(fp) & F.col("role").isNotNull(), F.lit("first"))
        .when(
            low.isin(sp) & F.col("addressee").isNotNull(), F.lit("second")
        )
        .when(low.isin(fp) | low.isin(sp), F.lit("unresolved"))
        .otherwise(F.lit("none"))
        .alias("grounding"),
    )


def turn_latency_stats(transcripts: DataFrame) -> DataFrame:
    """Response-latency profile per dialogue transition: for every
    adjacent turn pair, the gap between the two turns' timestamps,
    aggregated per (from_role, to_role). The timing companion to
    role_transitions' count matrix — tool-call round-trips, user think
    time, and assistant generation latency separate cleanly by role
    pair, and a latency distribution that shifts between corpus
    snapshots flags an infrastructure change that would skew any
    duration-derived training signal.

    Input: (conv_id, turn_idx, role, ts). Returns one row per observed
    (from_role, to_role):

      (from_role, to_role, n, mean_latency_us, min_latency_us,
       max_latency_us, n_nonpositive)

    Latency = exact microsecond delta to the NEXT turn's ts in
    turn_idx order (no per-row division — unix_micros is lossless);
    mean is the truncating integer division sum div n (== floor for
    the non-negative gaps of a ts-ordered transcript). n_nonpositive
    counts gaps <= 0 (clock skew / same-timestamp batching — a
    data-quality signal in its own right, so they stay in the
    aggregates rather than being silently dropped).

    Plan: one lead() window on the transcript's native conv_id
    partitioning, then a role-pair-sized groupBy with map-side
    combine — identical shuffle shape to role_transitions, so the two
    reports share an exchange when computed together."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    # cast covers TIMESTAMP_NTZ parquet columns; any fixed zone offset the
    # cast introduces cancels in the delta, so latencies are tz-invariant
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    pairs = transcripts.select(
        F.col("role").alias("from_role"),
        F.lead("role").over(w).alias("to_role"),
        (F.lead(us).over(w) - us).cast("long").alias("lat_us"),
    ).where(F.col("to_role").isNotNull())
    return pairs.groupBy("from_role", "to_role").agg(
        F.count("*").cast("long").alias("n"),
        F.expr("sum(lat_us) div count(*)").alias("mean_latency_us"),
        F.min("lat_us").cast("long").alias("min_latency_us"),
        F.max("lat_us").cast("long").alias("max_latency_us"),
        F.sum(F.when(F.col("lat_us") <= 0, 1).otherwise(0))
        .cast("long")
        .alias("n_nonpositive"),
    )


NEGATION_CUES = (
    "not", "never", "no", "cannot", "can't", "didn't", "doesn't",
    "don't", "won't", "wouldn't", "couldn't", "shouldn't", "isn't",
    "wasn't", "aren't", "weren't", "without", "neither", "nor",
)


def flag_negated(
    triples: DataFrame,
    turns: DataFrame,
    window_tokens: int = 4,
    cues: tuple = NEGATION_CUES,
) -> DataFrame:
    """NegEx-lite assertion classification for extracted triples
    (Chapman et al. 2001's pre-cue window, reduced to its high-
    precision core): a triple is flagged negated when a negation cue
    appears within the last ``window_tokens`` whitespace tokens BEFORE
    the predicate's surface anchor in its source turn. The reference's
    heads extract "A did not acquire B" and "A acquired B" into the
    SAME triple (no assertion status anywhere in its decode paths) —
    at KG-construction scale that single bug class poisons downstream
    fact fusion, so the filter runs between extraction and the edge
    table.

    ``triples``: (conv_id, turn_idx, subj, pred, obj) where ``pred``
    is the predicate's surface form as extracted. ``turns``:
    (conv_id, turn_idx, text). Adds:

    * ``anchor_pos`` — 1-based char position of the predicate surface
      in the turn text (0 = not found, e.g. post-normalization drift);
    * ``is_negated`` — cue within the pre-anchor token window
      (case-insensitive; tokens stripped to [a-z'] before matching so
      "did NOT," matches). Unanchored triples are never negated.

    Scale shape: one (conv_id, turn_idx) equi-join against the turns
    table — the extraction output's native key, shuffle-free on a
    conv_id-bucketed layout — then pure JVM string expressions (locate
    / substring / split / slice / arrays_overlap): no UDFs, fully
    inside whole-stage codegen, and the entire rule replays in SQL."""
    if window_tokens < 1:
        raise ValueError("flag_negated: window_tokens must be >= 1")
    cues_arr = F.array(*[F.lit(c) for c in cues])
    j = triples.join(
        turns.select("conv_id", "turn_idx", "text"),
        ["conv_id", "turn_idx"],
        "left",
    )
    anchor = F.expr("locate(pred, text)")
    w = int(window_tokens)
    # last w whitespace tokens of the text before the anchor
    windowed = F.expr(
        f"slice(split(trim(substring(text, 1, locate(pred, text) - 1)),"
        f" '\\\\s+'), greatest(1, size(split(trim(substring(text, 1,"
        f" locate(pred, text) - 1)), '\\\\s+')) - {w} + 1), {w})"
    )
    cleaned = F.transform(
        windowed, lambda t: F.regexp_replace(F.lower(t), "[^a-z']", "")
    )
    return j.select(
        *[F.col(c) for c in triples.columns],
        F.coalesce(anchor, F.lit(0)).cast("int").alias("anchor_pos"),
        F.when(
            F.coalesce(anchor, F.lit(0)) > 0,
            F.arrays_overlap(cleaned, cues_arr),
        )
        .otherwise(F.lit(False))
        .alias("is_negated"),
    )


def conversation_quality(
    transcripts: DataFrame,
    min_turns: int = 2,
    min_alternation_ppm: int = 250_000,
    min_mean_chars: int = 10,
    max_mean_chars: int = 100_000,
) -> DataFrame:
    """Conversation-LEVEL curation gate: the per-document quality
    heuristics (textstats.quality_stats) score turns in isolation, but
    a transcript corpus fails in conversation-shaped ways — mono-role
    scrapes (mis-threaded logs), single-turn fragments, degenerate
    tool-echo loops, truncated or bloated turns. One row per
    conversation:

      (conv_id, n_turns, n_roles, n_role_changes, alternation_ppm,
       tool_turn_share_ppm, mean_turn_chars, keep)

    alternation_ppm = role changes * 1e6 div (n_turns - 1) (0 for
    single-turn conversations — they fail min_turns anyway);
    tool_turn_share_ppm = turns with role = 'tool' * 1e6 div n_turns;
    mean_turn_chars = total chars div n_turns (NULL text counts 0).
    ``keep`` ands the thresholds: enough turns, enough speaker
    alternation, mean turn length in band. All truncating integer
    ppm — bit-exact twin.

    Scale shape: one lag() window on the native conv_id partitioning
    feeding ONE conversation-keyed aggregation with map-side combine;
    output is conversation-count-sized. The gate composes with
    curate_documents the way CCNet stacks page-level and corpus-level
    filters."""
    if min_turns < 1:
        raise ValueError("conversation_quality: min_turns must be >= 1")
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    marked = transcripts.select(
        "conv_id",
        F.col("role"),
        F.length(F.coalesce(F.col("text"), F.lit(""))).cast("long").alias(
            "n_chars"
        ),
        F.when(F.lag("role").over(w).isNull(), F.lit(0))
        .when(F.lag("role").over(w) != F.col("role"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("changed"),
    )
    agg = marked.groupBy("conv_id").agg(
        F.count("*").cast("long").alias("n_turns"),
        F.countDistinct("role").cast("long").alias("n_roles"),
        F.sum("changed").cast("long").alias("n_role_changes"),
        F.sum(F.when(F.col("role") == "tool", 1).otherwise(0))
        .cast("long")
        .alias("_n_tool"),
        F.sum("n_chars").cast("long").alias("_chars"),
    )
    out = agg.select(
        "conv_id",
        "n_turns",
        "n_roles",
        "n_role_changes",
        F.expr(
            "case when n_turns > 1 then"
            " n_role_changes * 1000000L div (n_turns - 1) else 0L end"
        ).alias("alternation_ppm"),
        F.expr("_n_tool * 1000000L div n_turns").alias(
            "tool_turn_share_ppm"
        ),
        F.expr("_chars div n_turns").alias("mean_turn_chars"),
    )
    return out.withColumn(
        "keep",
        (F.col("n_turns") >= int(min_turns))
        & (F.col("alternation_ppm") >= int(min_alternation_ppm))
        & (F.col("mean_turn_chars") >= int(min_mean_chars))
        & (F.col("mean_turn_chars") <= int(max_mean_chars)),
    )


DIALOGUE_ACT_RULES = (
    # (act, regex over the lowercased trimmed turn) — first match wins;
    # ordered from most to least marked, the classic DAMSL-lite cascade
    ("question", r"\?\s*$|^(who|what|when|where|why|how|which|is|are|do|does|did|can|could|would|will|should)\b"),
    ("command", r"^(please|do|don't|run|show|list|give|tell|make|set|add|remove|delete|create|update|stop|start|deploy|restart|find|check|use)\b"),
    ("agreement", r"^(yes|yeah|yep|ok|okay|sure|agreed|right|correct|exactly|sounds good)\b"),
    ("rejection", r"^(no|nope|nah|wrong|incorrect|disagree)\b"),
)


def tag_dialogue_acts(
    transcripts: DataFrame,
    rules: tuple = DIALOGUE_ACT_RULES,
    text_col: str = "text",
) -> DataFrame:
    """Rule-based dialogue-act tagging (the DAMSL-lite cue cascade —
    Jurafsky & Martin ch. 24's baseline: surface cues assign
    question / command / agreement / rejection, everything else
    'statement'). First matching rule wins, evaluated on the
    lowercased, trimmed turn. Not a classifier — a deterministic
    bootstrap labeler: at corpus scale these tags stratify sampling
    (question-heavy conversations train instruction-following),
    gate curation (zero-question corpora are monologues), and give
    role_transitions an act-level alphabet.

    Adds ``dialogue_act`` to every row. NULL/empty text tags
    'statement' (the cascade's fall-through). Pure JVM regexes in one
    projection — zero UDFs, zero joins, whole-stage codegen; the same
    cascade replays in SQL as nested CASE WHEN regexp_matches."""
    low = F.lower(F.trim(F.coalesce(F.col(text_col), F.lit(""))))
    expr = F.lit("statement")
    for act, pat in reversed(rules):
        expr = F.when(low.rlike(pat), F.lit(act)).otherwise(expr)
    return transcripts.withColumn("dialogue_act", expr)


def dialogue_act_profile(transcripts: DataFrame) -> DataFrame:
    """Per-role dialogue-act distribution: tag every turn with
    tag_dialogue_acts, then count per (role, dialogue_act) and express
    each act's share of its role's turns in truncating integer ppm
    (n * 1e6 div role_total — bit-exact twin, no float sums). The
    corpus-health read: a 'user' role with near-zero questions is a
    monologue scrape; an 'assistant' role dominated by questions is a
    mis-threaded corpus — both poison instruction tuning.

    Scale shape: the tagging is one JVM regex projection (no UDFs,
    no shuffle); the profile is ONE role×act groupBy (cardinality
    = roles × 5 acts, map-side combine does nearly all the work)
    plus a window over that tiny aggregate. Output is alphabet-sized
    regardless of corpus size."""
    tagged = tag_dialogue_acts(transcripts)
    counts = tagged.groupBy("role", "dialogue_act").agg(
        F.count("*").cast("long").alias("n")
    )
    w = Window.partitionBy("role")
    return counts.select(
        "role",
        "dialogue_act",
        "n",
        (F.col("n") * F.lit(1_000_000))
        .cast("long")
        .alias("_scaled"),
        F.sum("n").over(w).alias("_role_total"),
    ).select(
        "role",
        "dialogue_act",
        "n",
        F.expr("_scaled div _role_total").alias("share_ppm"),
    )


def mine_sft_pairs(
    transcripts: DataFrame,
    min_instruction_chars: int = 8,
    min_response_chars: int = 16,
    instruction_acts: tuple = ("question", "command"),
) -> DataFrame:
    """Instruction-tuning pair mining from raw transcripts: a 'user'
    turn tagged question/command by the dialogue-act cascade, followed
    IMMEDIATELY (turn_idx order) by an 'assistant' turn, becomes one
    (instruction, response) SFT example. Length floors drop fragments
    ("ok?" -> "yes"); the act gate drops user statements (context, not
    instructions). This is the standard transcript->SFT harvest: the
    same adjacency rule OpenAssistant/ShareGPT-style pipelines use,
    made deterministic.

    Output: (conv_id, turn_idx, instruction_act, instruction,
    response), one row per kept adjacent pair, turn_idx = the user
    turn's index.

    Scale shape: tag (pure projection) + ONE lead() window on the
    native conv_id partitioning + a filter — no joins, no second
    shuffle; at 100 TB this is a single exchange on conv_id that
    co-partitions with every other per-conversation pass."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    tagged = tag_dialogue_acts(transcripts).select(
        "conv_id",
        "turn_idx",
        "role",
        "dialogue_act",
        F.trim(F.coalesce(F.col("text"), F.lit(""))).alias("_txt"),
    )
    paired = tagged.select(
        "conv_id",
        "turn_idx",
        F.col("dialogue_act").alias("instruction_act"),
        "role",
        F.col("_txt").alias("instruction"),
        F.lead("role").over(w).alias("_next_role"),
        F.lead("_txt").over(w).alias("response"),
    )
    return paired.filter(
        (F.col("role") == "user")
        & F.col("instruction_act").isin(*instruction_acts)
        & (F.col("_next_role") == "assistant")
        & (F.length("instruction") >= int(min_instruction_chars))
        & (F.length("response") >= int(min_response_chars))
    ).select(
        "conv_id", "turn_idx", "instruction_act", "instruction", "response"
    )


def entity_salience(
    mentions: DataFrame,
    entity_col: str = "entity_id",
) -> DataFrame:
    """Per-conversation entity salience (the frequency + first-
    position feature pair of Dunietz & Gillick EACL'14's salience
    baseline, integer-exact): from mention rows (conv_id, turn_idx,
    entity) compute, per (conv_id, entity):

      n_mentions, n_turns (distinct turns mentioning it),
      first_turn_idx, last_turn_idx,
      share_ppm     = n_mentions * 1e6 div conversation mention total,
      salience_rank = dense order by (n_mentions DESC,
                      first_turn_idx ASC, entity ASC) within the
                      conversation — frequent-and-early wins; the id
                      tiebreak keeps the rank deterministic.

    The ranking drives KG-construction triage (which entities deserve
    linking/typing effort first) and summarization-style sampling.

    Scale shape: ONE (conv, entity) aggregation + two windows over
    the conversation-keyed aggregate (conversation cardinality, not
    mention cardinality); no joins."""
    agg = mentions.groupBy(
        "conv_id", F.col(entity_col).alias("entity")
    ).agg(
        F.count("*").cast("long").alias("n_mentions"),
        F.countDistinct("turn_idx").cast("long").alias("n_turns"),
        F.min("turn_idx").cast("int").alias("first_turn_idx"),
        F.max("turn_idx").cast("int").alias("last_turn_idx"),
    )
    wc = Window.partitionBy("conv_id")
    wr = Window.partitionBy("conv_id").orderBy(
        F.col("n_mentions").desc(),
        F.col("first_turn_idx").asc(),
        F.col("entity").asc(),
    )
    return agg.select(
        "conv_id",
        F.col("entity").alias(entity_col),
        "n_mentions",
        "n_turns",
        "first_turn_idx",
        "last_turn_idx",
        F.sum("n_mentions").over(wc).alias("_tot"),
        F.row_number().over(wr).cast("int").alias("salience_rank"),
    ).select(
        "conv_id",
        entity_col,
        "n_mentions",
        "n_turns",
        "first_turn_idx",
        "last_turn_idx",
        F.expr("n_mentions * 1000000 div _tot").alias("share_ppm"),
        "salience_rank",
    )


def dialogue_act_transitions(transcripts: DataFrame) -> DataFrame:
    """Act-level Markov fingerprint: tag every turn with the
    dialogue-act cascade, then count adjacent-act transitions within
    each conversation and normalize per source act — the
    (from_act, to_act, n, prob) matrix. A healthy assistant corpus is
    question->statement heavy; command->command runs flag scripted
    logs; it is role_transitions lifted from the 3-letter role
    alphabet to the 5-act alphabet tag_dialogue_acts provides.

    One lag-free lead() window on conv_id + an alphabet-sized
    groupBy; prob is one integer->double division, bit-exact."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    tagged = tag_dialogue_acts(transcripts).select(
        "conv_id",
        "turn_idx",
        F.col("dialogue_act").alias("from_act"),
        F.lead("dialogue_act").over(w).alias("to_act"),
    )
    counts = (
        tagged.where(F.col("to_act").isNotNull())
        .groupBy("from_act", "to_act")
        .agg(F.count("*").cast("long").alias("n"))
    )
    wt = Window.partitionBy("from_act")
    return counts.select(
        "from_act",
        "to_act",
        "n",
        (
            F.col("n").cast("double")
            / F.sum("n").over(wt).cast("double")
        ).alias("prob"),
    )


def textrank_turns(
    turns: DataFrame,
    min_jaccard_ppm: int = 200_000,
    damping: float = 0.85,
    iters: int = 12,
    top_k: int = 2,
) -> DataFrame:
    """TextRank extractive turn selection (Mihalcea & Tarau 2004): per
    conversation, rank turns by PageRank over the turn-similarity graph
    (distinct-token Jaccard >= ``min_jaccard_ppm``, undirected) and
    keep the ``top_k`` — the classic unsupervised summarizer, here
    picking the most central turns of a transcript as its extractive
    summary / KG-context anchor.

    Input: (conv_id, turn_idx, text, ...). Returns (conv_id, turn_idx,
    score, rank); a turn with no similarity edge scores 0.0 (it can
    still appear in a short conversation's top-k, after every connected
    turn — the deterministic (score desc, turn_idx asc) order).

    Scale shape: the pair stage is a per-conversation self-join — the
    ONLY quadratic is in single-conversation turn count, which the
    transcript data model bounds (conversations are short; a 1e12-turn
    corpus is wide, not deep), and similarity is JVM-side array
    intersection on the conv_id-colocated join. Ranking reuses
    operators/graph.py:pagerank (numpy-twin-pinned) over xxhash64 turn
    ids; both edge directions are fed, so no node dangles and each
    power round is one join + one aggregation. Float ranks make this
    rows-only at the driver; tests/test_textrank.py pins an
    identical-recursion python twin at 1e-9 and the selection exactly.
    """
    if top_k < 1:
        raise ValueError(f"textrank_turns: top_k must be >= 1, got {top_k}")
    from .graph import pagerank

    toks = turns.select(
        "conv_id",
        "turn_idx",
        F.array_distinct(
            F.filter(
                F.split(F.lower(F.col("text")), " "),
                lambda w: F.length(w) > 0,
            )
        ).alias("grams"),
        F.xxhash64("conv_id", "turn_idx").alias("node_id"),
    )
    a = toks.select(
        "conv_id",
        F.col("turn_idx").alias("ti_a"),
        F.col("grams").alias("ga"),
        F.col("node_id").alias("na"),
    )
    b = toks.select(
        "conv_id",
        F.col("turn_idx").alias("ti_b"),
        F.col("grams").alias("gb"),
        F.col("node_id").alias("nb"),
    )
    pairs = (
        a.join(b, "conv_id")
        .where(F.col("ti_a") < F.col("ti_b"))
        .withColumn("inter", F.size(F.array_intersect("ga", "gb")))
        .withColumn(
            "uni", F.size("ga") + F.size("gb") - F.col("inter")
        )
        .where(
            (F.col("uni") > 0)
            & (
                F.expr("inter * 1000000L div uni")
                >= F.lit(min_jaccard_ppm)
            )
        )
        .select("na", "nb")
    )
    edges = pairs.select(
        F.col("na").alias("subj_entity_id"),
        F.col("nb").alias("obj_entity_id"),
    ).unionByName(
        pairs.select(
            F.col("nb").alias("subj_entity_id"),
            F.col("na").alias("obj_entity_id"),
        )
    )
    ranks = pagerank(edges, damping=damping, iters=iters).select(
        F.col("entity_id").alias("node_id"), "rank"
    )
    scored = toks.join(ranks, "node_id", "left").select(
        "conv_id",
        "turn_idx",
        F.coalesce(F.col("rank"), F.lit(0.0)).alias("score"),
    )
    w = Window.partitionBy("conv_id").orderBy(
        F.desc("score"), F.asc("turn_idx")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= top_k)
        .select("conv_id", "turn_idx", "score", "rank")
    )
