"""Custom stateful streaming operator: first-seen mention tracking per
conversation (``applyInPandasWithState``).

For each ``conv_id`` group the state is the set of mentions already emitted;
each micro-batch extracts mentions from its turns (same head functions as
batch mode) and emits only the NEWLY seen ones — a streaming dedup keyed by
conversation, the kind of operator Spark has no built-in for. State is a
single pickled set per key; at scale the per-key state stays bounded by the
conversation's distinct-mention count.
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd

OUTPUT_SCHEMA = "conv_id string, turn_idx int, mention string"
STATE_SCHEMA = "seen array<string>"


def _extract_mentions(text: str, seed: int) -> list[str]:
    from ..core.heads import extract_row

    if text is None:
        return []
    res = extract_row("mpn", text, seed=seed)
    out = []
    for spo in res["spo_list"]:
        out.append(spo["subject"])
        out.append(spo["object"].get("@value", ""))
    return [m for m in out if m]


def first_seen_mentions_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: Any
) -> Iterable[pd.DataFrame]:
    """applyInPandasWithState update function."""
    # GroupState.get is a PROPERTY in PySpark 4 — calling it raises
    # TypeError the first time a key RE-ENTERS with existing state (a
    # conversation spanning micro-batches), which a single-batch drain
    # never exercises
    seen = set(state.get[0]) if state.exists else set()
    rows: dict[str, list] = {"conv_id": [], "turn_idx": [], "mention": []}
    for pdf in pdfs:
        pdf = pdf.sort_values("turn_idx")
        for _, r in pdf.iterrows():
            for m in _extract_mentions(r["text"], seed=42):
                if m not in seen:
                    seen.add(m)
                    rows["conv_id"].append(key[0])
                    rows["turn_idx"].append(int(r["turn_idx"]))
                    rows["mention"].append(m)
    state.update((sorted(seen),))
    yield pd.DataFrame(rows)


def first_seen_mentions_stream(transcripts_stream):
    """Streaming first-seen mention table keyed by conversation."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        transcripts_stream.select("conv_id", "turn_idx", "text")
        .groupBy("conv_id")
        .applyInPandasWithState(
            first_seen_mentions_fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
