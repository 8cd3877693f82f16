"""Watermarked stream-stream interval join over the transcripts stream.

Pairs each user turn with the tool turns of the SAME conversation that
arrive within a bounded event-time lag — the streaming twin of the
conversation-context joins the batch pipeline does (and the state-bounding
pattern every 10^12-turn stream-stream join needs: without the watermark +
time-range condition, join state grows without bound).

Spark requirements encoded here (Structured Streaming stream-stream inner
join): BOTH sides carry an event-time watermark, and the join condition
constrains the two event times to a bounded interval, so each side's state
can be evicted once the watermark passes the interval. The same function
works on batch DataFrames (watermarks are no-ops), so stream == batch
equality is directly testable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def user_turns_with_tool_results(
    transcripts: DataFrame,
    max_lag: str = "5 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """(conv_id, turn_idx, ts, tool_turn_idx, tool, tool_ts): every user
    turn joined to same-conversation tool turns with
    ``ts <= tool_ts <= ts + max_lag``."""
    users = transcripts.where(F.col("role") == "user").select(
        F.col("conv_id").alias("u_conv_id"),
        F.col("turn_idx").alias("turn_idx"),
        F.col("ts").alias("u_ts"),
    )
    tools = transcripts.where(F.col("role") == "tool").select(
        F.col("conv_id").alias("t_conv_id"),
        F.col("turn_idx").alias("tool_turn_idx"),
        F.col("tool").alias("tool"),
        F.col("ts").alias("tool_ts"),
    )
    if transcripts.isStreaming:
        users = users.withWatermark("u_ts", watermark)
        tools = tools.withWatermark("tool_ts", watermark)
    joined = users.join(
        tools,
        F.expr(
            "u_conv_id = t_conv_id AND "
            f"tool_ts >= u_ts AND tool_ts <= u_ts + interval {max_lag}"
        ),
    )
    return joined.select(
        F.col("u_conv_id").alias("conv_id"),
        "turn_idx",
        F.col("u_ts").alias("ts"),
        "tool_turn_idx",
        "tool",
        "tool_ts",
    )
