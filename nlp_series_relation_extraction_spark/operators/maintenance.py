"""Table maintenance for long-lived pipeline sinks: small-file compaction
and skew diagnostics.

An incrementally-maintained triple/edge table (operators/graph.py:
merge_edge_increment, streaming sinks) accretes one file set per batch; at
trillion-turn scale that is millions of KB-sized files, and scan planning
— not scanning — becomes the bottleneck (every query pays file-listing +
footer reads per file). Iceberg calls the fix "rewrite_data_files"; this
is the engine-level equivalent for the repo's parquet/Iceberg-shaped
sinks: rewrite a table directory into size-targeted files, preserving
rows exactly and (optionally) clustering on sort keys so downstream
range/merge scans prune.

Skew diagnostics answer the question every shuffle-heavy stage asks
BEFORE it runs at 100 TB: is this key safe to shuffle on? The report is
two tiny aggregations (top-k hot keys with their share, plus the exact
row count a perfectly-hashed reducer would get), so the pipeline can
decide salt factors (cf. operators/linking.py salting) from data, not
folklore.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, functions as F


def plan_compaction(
    spark: SparkSession, path: str, target_bytes: int = 128 * 1024 * 1024
) -> dict:
    """Inspect a parquet table directory: file count/bytes and the number
    of size-targeted output files a rewrite should produce. Driver-side
    file listing only (the same listing any scan plan performs)."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    files = []
    it = fs.listFiles(p, True)
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if name.endswith(".parquet") and not name.startswith("_"):
            files.append(int(f.getLen()))
    total = sum(files)
    return {
        "n_files": len(files),
        "total_bytes": total,
        "avg_bytes": total // max(len(files), 1),
        "target_files": max(1, math.ceil(total / target_bytes)),
    }


def compact_table(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> dict:
    """Rewrite ``src_path`` into ``dst_path`` with size-targeted files.

    ``sort_cols`` switches from plain coalesce-style packing to
    ``repartitionByRange`` + within-partition sort — range-clustered files
    whose min/max column stats let downstream scans prune (the Iceberg
    sort-compaction strategy). Without it, ``repartition(n)`` round-robins
    rows for evenly-sized files. Returns before/after stats; row-count
    preservation is asserted here (a compaction that loses rows must never
    return)."""
    import os

    if os.path.realpath(src_path) == os.path.realpath(dst_path):
        # mode('overwrite') deletes dst before the lazy src read
        # materializes — an in-place call would destroy the table.
        raise ValueError(
            "compact_table requires dst_path != src_path (write to a new "
            "directory, then atomically swap, as the streaming kg_sink does)"
        )
    before = plan_compaction(spark, src_path, target_bytes)
    df = spark.read.parquet(src_path)
    n_out = before["target_files"]
    if sort_cols:
        out = df.repartitionByRange(n_out, *[F.col(c) for c in sort_cols])
        out = out.sortWithinPartitions(*sort_cols)
    else:
        out = df.repartition(n_out)
    out.write.mode("overwrite").parquet(dst_path)
    after = plan_compaction(spark, dst_path, target_bytes)
    n_src = df.count()
    n_dst = spark.read.parquet(dst_path).count()
    if n_src != n_dst:
        raise AssertionError(
            f"compaction row-count mismatch: {n_src} -> {n_dst}"
        )
    return {"before": before, "after": after, "rows": n_dst}


def skew_report(
    df: DataFrame, key_cols: list[str], top_k: int = 10
) -> DataFrame:
    """(rank, key, n_rows, share_ppm, skew_x): the top-k hottest shuffle
    keys, each with its corpus share and its multiple of the mean per-key
    load (skew_x = n_rows * n_distinct_keys / n_total, integer-rounded).
    skew_x is the straggler factor a shuffle on these keys would see: a
    key at 400x the mean needs salting (or AQE skew-join) before the
    stage is safe. Two aggregations, both map-side combined; the totals
    ride along via a broadcast 1-row cross join — no driver collect."""
    # group on the RAW columns — concat_ws folds NULL to '' (merging NULL
    # keys with empty-string keys) and lets ('a|b','c') collide with
    # ('a','b|c'); the joined string below is only the report's display
    # label, built after the counts are already correct.
    counts = (
        df.groupBy(*key_cols)
        .agg(F.count("*").cast("long").alias("n_rows"))
        .select(
            F.concat_ws(
                "|",
                *[
                    F.coalesce(F.col(c).cast("string"), F.lit("NULL"))
                    for c in key_cols
                ],
            ).alias("key"),
            "n_rows",
        )
    )
    totals = F.broadcast(
        counts.agg(
            F.sum("n_rows").cast("long").alias("n_total"),
            F.count("*").cast("long").alias("n_keys"),
        )
    )
    from pyspark.sql import Window

    # global top-k via orderBy+limit (TakeOrderedAndProject: per-partition
    # partial top-k, driver merge of k-row heads) — NOT a global window,
    # which would funnel the whole per-key count table through one task.
    # The row_number window then runs over k rows only.
    top = (
        counts.crossJoin(totals)
        .orderBy(F.desc("n_rows"), "key")
        .limit(top_k)
    )
    w = Window.orderBy(F.desc("n_rows"), "key")
    return (
        top.withColumn("rank", F.row_number().over(w).cast("int"))
        .select(
            "rank",
            "key",
            "n_rows",
            F.expr("(n_rows * 1000000) div n_total").alias("share_ppm"),
            F.expr("(n_rows * n_keys) div n_total").alias("skew_x"),
        )
    )


def agg_view(
    df: DataFrame, keys: list[str], measures: dict[str, "F.Column"]
) -> DataFrame:
    """Materialize a count+sums aggregate view: (keys..., view_count,
    sum_<name>...). The only aggregates here are the SELF-MAINTAINABLE
    ones (count, sum): a delta of base rows updates the view without
    touching base history. min/max are deliberately absent — they are
    not self-maintainable under deletes (a retracted max needs the
    runner-up, i.e. the base table) and belong to recompute land."""
    aggs = [F.count(F.lit(1)).cast("long").alias("view_count")] + [
        F.sum(expr).cast("long").alias(f"sum_{name}")
        for name, expr in measures.items()
    ]
    return df.groupBy(*keys).agg(*aggs)


def maintain_agg_view(
    view: DataFrame,
    keys: list[str],
    measures: dict[str, "F.Column"],
    adds: DataFrame | None = None,
    deletes: DataFrame | None = None,
    delta_view: DataFrame | None = None,
) -> DataFrame:
    """Incremental view maintenance for agg_view (the classic
    delta-rule: Gupta, Mumick & Subrahmanian 1993 "Maintaining views
    incrementally"): fold inserted rows with +1 sign and deleted rows
    with -1, merge with the materialized view by one keys-grouped sum,
    drop groups whose maintained count reaches zero. This is the
    general form of the KG edge upsert (graph.py:merge_edge_increment —
    evidence counts add) and the streaming sink's merge; at 100 TB the
    delta is micro-batch-sized and the merge shuffles ONLY view rows +
    delta rows, never the base table.

    Exactness contract (the IVM theorem for count/sum): maintained ==
    recomputed from (base + adds - deletes), bit-for-bit on integer
    measures — the driver oracle IS the full recompute.

    ``delta_view`` accepts an ALREADY-AGGREGATED insert delta in the
    view's own schema (what a streaming foreachBatch body holds after
    agg_view(batch)) — merged as-is, no re-aggregation of base rows."""
    parts = [view]
    if delta_view is not None:
        parts.append(delta_view.select(view.columns))
    if adds is not None:
        parts.append(
            agg_view(adds, keys, measures).select(view.columns)
        )
    if deletes is not None:
        neg = agg_view(deletes, keys, measures)
        parts.append(
            neg.select(
                *keys,
                (-F.col("view_count")).alias("view_count"),
                *[
                    (-F.col(f"sum_{name}")).alias(f"sum_{name}")
                    for name in measures
                ],
            ).select(view.columns)
        )
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    out = merged.groupBy(*keys).agg(
        F.sum("view_count").cast("long").alias("view_count"),
        *[
            F.sum(f"sum_{name}").cast("long").alias(f"sum_{name}")
            for name in measures
        ],
    )
    return out.where(F.col("view_count") > 0)
