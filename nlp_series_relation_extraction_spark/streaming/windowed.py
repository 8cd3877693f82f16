"""Watermarked windowed aggregations over the transcripts stream.

Late-data-tolerant turn-rate statistics: event-time windows on ``ts`` with a
watermark bound the state kept for stragglers. The batch twin of the same
plan is used in tests to assert availableNow-drained streaming output equals
the batch answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def turns_per_window(
    transcripts: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """(window_start, role, n_turns, n_convs) per event-time window.

    Works on both a streaming and a batch DataFrame (the watermark is a
    no-op in batch mode), so stream==batch equality is directly testable.
    """
    df = transcripts
    if df.isStreaming:
        df = df.withWatermark("ts", watermark)
    return (
        df.groupBy(F.window("ts", window).alias("w"), "role")
        .agg(
            F.count("*").alias("n_turns"),
            F.approx_count_distinct("conv_id").alias("n_convs_approx"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "role",
            "n_turns",
            "n_convs_approx",
        )
    )
