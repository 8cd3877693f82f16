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
