"""Streaming dialogue-act transition monitor: the stateful-stream twin
of operators/conversation.py:role_transitions.

Adjacent-turn pairing needs the PREVIOUS turn of each conversation, which
a pure aggregation can't see across micro-batch boundaries — so the
operator is ``applyInPandasWithState`` keyed by conv_id with one tiny
state row per live conversation: the last role seen. Each micro-batch
sorts its own turns, pairs them (bridging the batch boundary through the
state), and emits PARTIAL transition counts; partials are SUM-mergeable,
so any downstream consumer (memory sink + groupBy-sum, or a continuous
aggregation) reconstructs the exact batch matrix. Draining N micro-
batches therefore equals the batch operator row-for-row — pinned by
tests/test_pipeline_io_streaming.py, including resume-from-checkpoint.

Arrival contract: per-conversation turn order across micro-batches
(within a batch any order — sorted here). That is the native guarantee
of log-ordered sources (Kafka per-key ordering, append-only transcript
logs); an out-of-order source needs a watermarked re-sequencer in front,
which is a different operator.

State per key is ONE role string — bounded, conversation-count-scaled,
exactly what applyInPandasWithState's store is for. No timeout: a
conversation's state is one string; at 10^12-turn scale with bounded
live conversations, use a processing-time timeout to expire the long
closed ones.
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd

OUTPUT_SCHEMA = "from_role string, to_role string, n long"
STATE_SCHEMA = "last_role string"


def transition_pairs_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: Any
) -> Iterable[pd.DataFrame]:
    """applyInPandasWithState update function: pair this batch's turns
    of one conversation with the carried last role, emit partial
    transition counts."""
    # GroupState.get is a PROPERTY in PySpark 4 (raises if absent)
    last_role = state.get[0] if state.exists else None
    counts: dict[tuple[str, str], int] = {}
    for pdf in pdfs:
        pdf = pdf.sort_values("turn_idx")
        for role in pdf["role"]:
            if last_role is not None:
                k = (last_role, role)
                counts[k] = counts.get(k, 0) + 1
            last_role = role
    if last_role is not None:
        state.update((last_role,))
    yield pd.DataFrame(
        {
            "from_role": [k[0] for k in counts],
            "to_role": [k[1] for k in counts],
            "n": list(counts.values()),
        }
    )


def role_transitions_stream(transcripts_stream):
    """Streaming partial transition counts keyed by conversation; sum
    (from_role, to_role) partials downstream to get the batch matrix."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        transcripts_stream.select("conv_id", "turn_idx", "role")
        .groupBy("conv_id")
        .applyInPandasWithState(
            transition_pairs_fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
