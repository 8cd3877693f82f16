"""Temporal operators: as-of join and multi-resolution rollups.

The as-of join is the relational twin of the reference's pointer-pairing
decode (``end[end >= i][0]`` — nearest FOLLOWING event, model_mpn.py:173;
see SURVEY §2.5): for each left row, attach the first right row at or after
it within the same key. Expressed as a union + window (sort once per key,
no range-explosion join), the standard Spark formulation that scales as a
single shuffle on the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def asof_join_next(
    left: DataFrame,
    right: DataFrame,
    key: str,
    time_col: str,
    right_cols: list[str],
) -> DataFrame:
    """For each left row, the first right row with time >= left time in the
    same key group (ties: right row at the same timestamp matches).

    Implementation: tag and union both sides, sort within key by
    (time, left-before-right at equal time so an equal-timestamp right row
    stays inside the left row's following frame), then take the first
    following right row via ``first(... ignoreNulls) over (rows between
    current and unbounded following)``. One shuffle, no O(n^2) range join.

    All ``right_cols`` are carried in ONE struct so every ``next_<col>``
    value comes from the same nearest right row — independent per-column
    ``first(ignoreNulls)`` windows would mix fields from different right
    rows whenever the nearest one carries a NULL in some column.
    """
    lcols = left.columns
    rtypes = dict(right.dtypes)
    r_struct_type = (
        "struct<" + ",".join(f"{c}:{rtypes[c]}" for c in right_cols) + ">"
    )
    l_tag = left.select(
        *lcols,
        F.lit(1).alias("_is_left"),
        F.lit(None).cast(r_struct_type).alias("_r"),
    )
    r_tag = right.select(
        *[
            F.col(c) if c in (key, time_col) else F.lit(None).cast(t).alias(c)
            for c, t in left.dtypes
        ],
        F.lit(0).alias("_is_left"),
        F.struct(*[F.col(c) for c in right_cols]).alias("_r"),
    )
    u = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy(key)
        .orderBy(
            F.col(time_col).asc(),
            F.col("_is_left").desc(),
            # deterministic among right rows sharing a timestamp (right_cols
            # should include a unique id); struct ordering is field-by-field
            F.col("_r").asc_nulls_last(),
        )
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    out = u.withColumn("_r_next", F.first("_r", ignorenulls=True).over(w)).select(
        "*",
        *[F.col(f"_r_next.{c}").alias(f"next_{c}") for c in right_cols],
    )
    return out.where(F.col("_is_left") == 1).drop("_is_left", "_r", "_r_next")


def rollup_time_buckets(
    df: DataFrame,
    time_col: str,
    value_col: str,
    group_col: str,
    bucket_minutes: int,
) -> DataFrame:
    """Hypertable-style rollup: per (bucket, group) count + integer-cents sum
    (exact across engines)."""
    # bucket as epoch seconds (BIGINT): timezone-proof across engines
    bucket = F.expr(
        f"cast(floor(unix_timestamp({time_col}) / {bucket_minutes * 60}) as bigint)"
        f" * {bucket_minutes * 60}"
    )
    return (
        df.groupBy(bucket.alias("bucket_epoch"), F.col(group_col))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(
                F.expr(f"cast(round({value_col} * 100) as bigint)")
            ).alias("value_cents"),
        )
    )


def scd2_intervals(
    facts: DataFrame,
    key_cols: list[str],
    value_col: str,
    ts_col: str,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Temporal-KG fact versioning (SCD-2 / gaps-and-islands): collapse a
    timestamped fact stream into validity intervals per key.

    For each key (e.g. (subject, predicate)), consecutive observations of
    the SAME value merge into one interval [valid_from, valid_to); a new
    value CLOSES the previous interval at its first observation and opens
    its own. The latest interval per key has valid_to NULL and
    is_current = true — the "current state of the world" slice a KG serves
    queries from, while the closed intervals are its history (how the
    reference's eval-time triple set would evolve across re-ingested
    transcript batches).

    Mechanics: lag(value) over (key ORDER BY ts, order_cols) marks change
    points, a running sum of change flags numbers the islands, the island
    groupBy takes min(ts) = valid_from + an evidence count, and
    lead(valid_from) closes each interval. All three passes share ONE
    shuffle on the key columns (the window and the groupBy use the same
    partitioning, which Catalyst reuses); values and timestamps stay
    integer/timestamp-typed, so the DuckDB oracle is bit-exact.

    ``order_cols`` breaks timestamp ties deterministically (pass the event
    id); at 100 TB the per-key window is the scale shape to watch — keys
    are (entity, predicate) pairs, so parallelism is the number of facts
    being versioned, and a single hot key degrades to one task only if one
    entity-predicate pair dominates the corpus (add the key's salt-window
    variant before that point).
    """
    order_cols = order_cols or []
    order = [F.col(ts_col), *[F.col(c) for c in order_cols]]
    wk = Window.partitionBy(*key_cols).orderBy(*order)
    # NULL-safe change detection (<=>): a NULL observation is a real state
    # ("value unknown") — it CLOSES the previous interval and consecutive
    # NULLs merge into one island, exactly like any other value. A plain
    # lag != value comparison would evaluate NULL (not true) against a
    # NULL current value and silently extend the previous interval with a
    # mixed-value island.
    changed = F.when(
        ~F.lag(F.col(value_col)).over(wk).eqNullSafe(F.col(value_col)),
        F.lit(1),
    ).otherwise(F.lit(0))
    islands = facts.select(
        *key_cols,
        value_col,
        ts_col,
        F.sum(changed).over(
            wk.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("island"),
    )
    grouped = islands.groupBy(*key_cols, "island").agg(
        F.min(ts_col).alias("valid_from"),
        F.max(ts_col).alias("last_seen"),
        F.first(value_col).alias(value_col),
        F.count("*").cast("long").alias("n_evidence"),
    )
    wi = Window.partitionBy(*key_cols).orderBy("valid_from", "island")
    return grouped.select(
        *key_cols,
        value_col,
        "valid_from",
        F.lead("valid_from").over(wi).alias("valid_to"),
        "last_seen",
        "n_evidence",
        F.lead("valid_from").over(wi).isNull().alias("is_current"),
    )


def facts_as_of(intervals: DataFrame, ts, value_col: str) -> DataFrame:
    """Time-travel over SCD-2 intervals: the fact set valid AT ``ts`` —
    rows where valid_from <= ts < valid_to (open intervals extend to
    infinity). This is the KG's snapshot read: pair it with a ts-derived
    partition column on the interval table and the filter becomes
    partition pruning. A NULL-valued interval means "value unknown during
    this span" and is excluded (there is no fact to serve)."""
    t = F.lit(ts)
    return intervals.where(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
        & F.col(value_col).isNotNull()
    )


def temporal_conflicts(
    intervals: DataFrame,
    key_cols: list[str],
    value_col: str,
    source_col: str,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """Cross-source contradiction detection over temporal-KG validity
    intervals: two sources claim DIFFERENT values for the same
    functional key over OVERLAPPING spans — the conflict set a fusion
    stage (operators/fusion.py) must adjudicate before the KG can serve
    a consistent as-of read.

    ``intervals``: per-source SCD-2 interval tables unioned with a
    ``source_col`` tag (each typically a :func:`scd2_intervals` output,
    so within ONE source the intervals of a key are disjoint by
    construction — cross-source pairs are therefore the COMPLETE
    conflict set, and the join keeps only ``source_a < source_b``,
    each unordered pair once). A NULL ``to_col`` is an open interval
    (extends to infinity); overlap is tested with pure null logic, no
    sentinel timestamps. NULL values are real "unknown" states and DO
    conflict with a concurrent known value — a fusion stage must still
    pick one (NULL-safe inequality, same rationale as scd2_intervals'
    change detection).

    Returns one row per conflicting pair: (*key_cols, source_a,
    value_a, from_a, to_a, source_b, value_b, from_b, to_b,
    overlap_from, overlap_to) with overlap_to NULL when both claims
    are open-ended.

    Plan shape: one self-equi-join on the key columns — per-key cost is
    quadratic in that key's interval-version count, which is the output
    being built (a key's conflicts ARE its cross-source version pairs).
    Hot keys are entities whose value flaps across many re-ingestions;
    they surface in skew_report before they hurt, and the standard
    salt-by-version-range split applies without changing semantics."""
    left = intervals.select(
        *key_cols,
        *[
            F.col(c).alias(f"{c}_a")
            for c in (source_col, value_col, from_col, to_col)
        ],
    )
    right = intervals.select(
        *key_cols,
        *[
            F.col(c).alias(f"{c}_b")
            for c in (source_col, value_col, from_col, to_col)
        ],
    )
    sa, sb = f"{source_col}_a", f"{source_col}_b"
    va, vb = f"{value_col}_a", f"{value_col}_b"
    fa, fb = f"{from_col}_a", f"{from_col}_b"
    ta, tb = f"{to_col}_a", f"{to_col}_b"
    joined = left.join(right, key_cols).where(
        (F.col(sa) < F.col(sb))
        & ~F.col(va).eqNullSafe(F.col(vb))
        # [from_a, to_a) overlaps [from_b, to_b), open ends via null
        & (F.col(ta).isNull() | (F.col(fb) < F.col(ta)))
        & (F.col(tb).isNull() | (F.col(fa) < F.col(tb)))
    )
    overlap_to = (
        F.when(F.col(ta).isNull(), F.col(tb))
        .when(F.col(tb).isNull(), F.col(ta))
        .otherwise(F.least(ta, tb))
    )
    return joined.select(
        *key_cols,
        sa, va, fa, ta, sb, vb, fb, tb,
        F.greatest(fa, fb).alias("overlap_from"),
        overlap_to.alias("overlap_to"),
    )


# Allen's 13 interval relations (Allen 1983, "Maintaining Knowledge
# about Temporal Intervals"), in the fixed classification order the
# CASE chain below evaluates. Mutually exclusive and jointly exhaustive
# for non-empty intervals.
ALLEN_RELATIONS = (
    "equals",
    "before",
    "meets",
    "overlaps",
    "starts",
    "started_by",
    "during",
    "contains",
    "finishes",
    "finished_by",
    "after",
    "met_by",
    "overlapped_by",
)


def allen_relations(
    intervals: DataFrame,
    key_cols: list[str],
    source_col: str,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """Classify every cross-source interval pair of a temporal-KG key
    into Allen's interval algebra (13 relations) — the qualitative
    temporal layer over the SCD-2 fact versions: "claim A held DURING
    claim B", "A's validity MEETS B's", etc. Fusion and conflict
    stages reason over these relations; :func:`temporal_conflicts` is
    the special case {overlaps, during, starts, finishes, equals, and
    inverses} + value inequality.

    Same pairing contract as :func:`temporal_conflicts`: ``intervals``
    is a union of per-source SCD-2 tables tagged by ``source_col``;
    pairs are cross-source only (``source_a < source_b``), so within-
    source disjointness never floods the output with before/after
    rows. A NULL ``to_col`` is an open interval (extends to +inf):
    two open ends are EQUAL ends, an open end is strictly after any
    closed one. ``from_col`` is never NULL in SCD-2 output.

    Returns (*key_cols, source_a, from_a, to_a, source_b, from_b,
    to_b, relation) — relation of A relative to B.

    Plan shape: the same single key-keyed self-equi-join as
    temporal_conflicts (per-key quadratic in version count — the
    output being built); the classification is a pure JVM CASE chain,
    whole-stage-codegen, no UDFs, and DuckDB replays it bit-exactly.
    """
    left = intervals.select(
        *key_cols,
        *[
            F.col(c).alias(f"{c}_a")
            for c in (source_col, from_col, to_col)
        ],
    )
    right = intervals.select(
        *key_cols,
        *[
            F.col(c).alias(f"{c}_b")
            for c in (source_col, from_col, to_col)
        ],
    )
    sa, sb = f"{source_col}_a", f"{source_col}_b"
    fa, fb = F.col(f"{from_col}_a"), F.col(f"{from_col}_b")
    ta, tb = F.col(f"{to_col}_a"), F.col(f"{to_col}_b")

    def lt(x, y):  # x < y under NULL = +inf (x finite, y possibly not)
        return x.isNotNull() & (y.isNull() | (x < y))

    ends_eq = (ta.isNull() & tb.isNull()) | (
        ta.isNotNull() & tb.isNotNull() & (ta == tb)
    )
    rel = (
        F.when((fa == fb) & ends_eq, "equals")
        .when(ta.isNotNull() & (ta < fb), "before")
        .when(ta.isNotNull() & (ta == fb), "meets")
        .when((fa < fb) & lt(fb, ta) & lt(ta, tb), "overlaps")
        .when((fa == fb) & lt(ta, tb), "starts")
        .when((fa == fb) & lt(tb, ta), "started_by")
        .when((fa > fb) & lt(ta, tb), "during")
        .when((fa < fb) & lt(tb, ta), "contains")
        .when((fa > fb) & ends_eq, "finishes")
        .when((fa < fb) & ends_eq, "finished_by")
        .when(tb.isNotNull() & (tb < fa), "after")
        .when(tb.isNotNull() & (tb == fa), "met_by")
        .otherwise("overlapped_by")
    )
    return (
        left.join(right, key_cols)
        .where(F.col(sa) < F.col(sb))
        .select(
            *key_cols,
            sa,
            f"{from_col}_a",
            f"{to_col}_a",
            sb,
            f"{from_col}_b",
            f"{to_col}_b",
            rel.alias("relation"),
        )
    )


def kg_growth_report(
    facts: DataFrame,
    subj_col: str = "subj",
    pred_col: str = "pred",
    bucket_col: str = "bucket",
) -> DataFrame:
    """KG growth / drift report per (predicate, time bucket): how much
    of each bucket's activity comes from subjects the predicate has
    NEVER seen before — the operational dashboard row for a continuously
    constructed KG. A healthy feed shows a steady new-subject share; a
    share spiking toward 1e6 means an upstream id-space change (every
    'entity' suddenly new = linking broke), a collapse toward 0 means
    the extractor stopped discovering (or the feed is replaying).

    Input: one row per fact occurrence with a precomputed time-bucket
    string (e.g. date_format(ts, 'yyyy-MM') — bucketing stays in the
    caller so calendar policy is explicit). Returns per (pred, bucket):

      (pred, bucket, n_facts, n_subjects, n_new_subjects,
       new_subject_share_ppm)

    n_new_subjects counts subjects whose FIRST bucket for this
    predicate (lexicographic min — ISO buckets sort correctly) is this
    bucket; share is over the bucket's distinct subjects.

    Scale shape: one (pred, subj, bucket) pre-aggregation collapses
    fact multiplicity (map-side combine eats the hot subjects), then a
    (pred, subj) min-bucket aggregation and a final (pred, bucket)
    rollup — three hash aggregations, each smaller than the last, no
    windows over data-sized partitions and no self-joins."""
    psb = (
        facts.select(
            F.col(pred_col).cast("string").alias("pred"),
            F.col(subj_col).cast("string").alias("subj"),
            F.col(bucket_col).cast("string").alias("bucket"),
        )
        .groupBy("pred", "subj", "bucket")
        .agg(F.count("*").cast("long").alias("n"))
        .localCheckpoint(eager=False)  # feeds first-seen AND the final
        # rollup join: cut lineage so the fact scan + pre-agg run once
    )
    first = psb.groupBy("pred", "subj").agg(
        F.min("bucket").alias("first_bucket")
    )
    j = psb.join(first, ["pred", "subj"])
    return (
        j.groupBy("pred", "bucket")
        .agg(
            F.sum("n").cast("long").alias("n_facts"),
            F.count("*").cast("long").alias("n_subjects"),
            F.sum(
                F.when(F.col("bucket") == F.col("first_bucket"), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("n_new_subjects"),
        )
        .withColumn(
            "new_subject_share_ppm",
            F.expr("n_new_subjects * 1000000L div n_subjects"),
        )
    )
