"""Streaming entity linking: the alias-snapshot refresher for the
continuous KG sink.

streaming/kg_sink.py canonicalizes each triple batch against an alias
SNAPSHOT and documents that linking refreshes on its own cadence (with
`replay_alias_remap` re-canonicalizing affected keys afterwards). This
module is that cadence: a mention stream folds through
operators/linking.py:link_increment inside foreachBatch, and each
micro-batch commits a new versioned state table behind the same
atomic-manifest discipline the sink uses — readers always see the last
fully-committed snapshot, never a partial write, and a replayed batch id
(restart after a crash between state write and checkpoint commit) is
detected and skipped, so the fold is exactly-once.

Because link_increment carries an exact-equality contract with the
full-batch pipeline (its module docstring; tests), draining a mention
stream through this sink in ANY micro-batch split yields byte-identical
state to one link_mentions run over everything — pinned in
tests/test_streaming_linking.py. Per batch, work touches only the
blocks the batch hits and a contracted CC graph; the state write is one
table-sized rewrite, which at real scale becomes the bucketed upsert
the edge sink already implements (the state is (mention, entity) rows —
hash-bucket by mention exactly like edges bucket by subject).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from ..operators.linking import link_increment
from .kg_sink import _read_manifest, _write_manifest


def read_current_state(spark: SparkSession, path: str) -> DataFrame | None:
    """The last committed linking state, or None before any commit."""
    m = _read_manifest(path)
    if m is None:
        return None
    return spark.read.parquet(os.path.join(path, m["version"]))


def read_current_aliases(spark: SparkSession, path: str) -> DataFrame | None:
    """The alias projection (mention_norm, entity_id) of the committed
    state — the snapshot shape streaming/kg_sink.py consumes."""
    st = read_current_state(spark, path)
    if st is None:
        return None
    return st.select("mention_norm", "entity_id")


def link_mention_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    path: str,
    batch_id: int,
    retain: int = 2,
    **link_kwargs,
) -> None:
    """Fold one mention micro-batch into the committed state.

    Crash-safe ordering: state parquet is fully written to a NEW version
    directory first, the manifest flips last (os.replace is atomic). A
    batch id at or below the committed one is a checkpoint replay after
    a crash — skipped, making the fold idempotent. Versions beyond
    ``retain`` are expired after the flip (never the live one)."""
    os.makedirs(path, exist_ok=True)
    m = _read_manifest(path)
    if m is not None and batch_id <= m.get("batch_id", -1):
        return
    state = read_current_state(spark, path)
    out = link_increment(state, batch_df, **link_kwargs)
    vdir = f"v{batch_id:06d}"
    out["state"].write.mode("overwrite").parquet(os.path.join(path, vdir))
    _write_manifest(path, {"version": vdir, "batch_id": batch_id})
    versions = sorted(
        d for d in os.listdir(path)
        if d.startswith("v") and d != vdir
        and os.path.isdir(os.path.join(path, d))
    )
    for stale in versions[: max(0, len(versions) - (retain - 1))]:
        shutil.rmtree(os.path.join(path, stale), ignore_errors=True)


def stream_mentions_into(
    mention_stream: DataFrame,
    path: str,
    checkpoint: str,
    **link_kwargs,
):
    """Attach the linking fold to a streaming mention DataFrame
    (conv_id, turn_idx, mention); returns the started query (drain with
    trigger availableNow in tests, same as the edge sink)."""
    os.makedirs(path, exist_ok=True)
    spark = mention_stream.sparkSession

    def body(batch_df: DataFrame, batch_id: int) -> None:
        link_mention_batch(spark, batch_df, path, batch_id, **link_kwargs)

    return (
        mention_stream.writeStream.foreachBatch(body)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
