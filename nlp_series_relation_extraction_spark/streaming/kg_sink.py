"""Continuously-maintained KG edge table: the streaming end of the north
rule's "materialize adjacency/edge tables" over transcripts that never
stop arriving.

Each micro-batch of extracted triples is canonicalized against the alias
dimension and UPSERTED into the edge table with
operators/graph.py:merge_edge_increment semantics (evidence counts add,
earliest provenance wins). Over parquet the upsert is implemented as a
versioned rewrite — write the merged table to a new version directory,
then atomically flip a manifest file — because overwriting a parquet
directory that is also the read side of the merge would corrupt it
mid-job. With Iceberg the same foreachBatch body becomes a single
`MERGE INTO` and the manifest is the table's own snapshot log; the
versioned layout here preserves exactly Iceberg's reader guarantee
(readers see the last committed version, never a partial write).

The alias dimension is a SNAPSHOT: entity linking is itself periodic
(re-linking continuously would re-canonicalize history), so production
refreshes the alias snapshot on its own cadence and replays affected
keys; the streaming loop takes whatever snapshot it is given.

Equivalence contract (pinned in tests/test_pipeline_io_streaming.py):
draining N micro-batches through the sink yields an edge table IDENTICAL
to the batch pipeline over the full input — merge_edge_increment's
associativity is what makes arbitrary micro-batch boundaries invisible.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..operators.graph import canonical_triples, edge_table, merge_edge_increment

_MANIFEST = "_CURRENT"


def read_current_edges(spark: SparkSession, path: str) -> DataFrame | None:
    """The last committed version of the edge table, or None."""
    manifest = os.path.join(path, _MANIFEST)
    if not os.path.exists(manifest):
        return None
    with open(manifest, encoding="utf-8") as f:
        version = f.read().strip()
    return spark.read.parquet(os.path.join(path, version))


def upsert_edge_batch(
    spark: SparkSession, batch_triples: DataFrame, aliases: DataFrame,
    path: str, batch_id: int,
) -> None:
    """One foreachBatch body: canonicalize -> edge-aggregate -> merge with
    the current table -> commit as a new version.

    Idempotent under foreachBatch's at-least-once replay: versions are
    named by batch_id (compared NUMERICALLY — the zero-padding is only
    cosmetic and overflows past 999999), and a batch whose version is
    already committed — the crash-between-manifest-flip-and-checkpoint
    window — is a no-op instead of double-counting its evidence into the
    table. After a commit, versions
    older than the previous one are pruned (the previous stays for
    in-flight readers — the parquet stand-in for Iceberg snapshot
    expiry), bounding disk at ~2x table size."""
    version = f"v{batch_id:06d}"
    manifest = os.path.join(path, _MANIFEST)
    if os.path.exists(manifest):
        with open(manifest, encoding="utf-8") as f:
            committed = f.read().strip()
        # compare NUMERIC batch ids, not version strings: past batch
        # 999999 the zero-padding overflows and 'v1000000' < 'v999999'
        # lexicographically, which would skip every new batch as a replay.
        if int(committed[1:]) >= batch_id:  # replayed: already folded in
            return
    inc = edge_table(canonical_triples(batch_triples, aliases))
    current = read_current_edges(spark, path)
    merged = inc if current is None else merge_edge_increment(current, inc)
    merged.write.mode("overwrite").parquet(os.path.join(path, version))
    tmp = os.path.join(path, _MANIFEST + ".tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(version)
    os.replace(tmp, os.path.join(path, _MANIFEST))  # atomic flip
    _expire_versions(path)


def _expire_versions(path: str, retain: int = 2) -> None:
    """Drop all but the newest ``retain`` version directories (sorted by
    NUMERIC batch id — lexicographic order breaks once ids outgrow the
    zero-padding); batch ids may skip, so this keys off what actually
    exists rather than arithmetic on the current id."""
    import shutil

    versions = sorted(
        (
            n
            for n in os.listdir(path)
            if n.startswith("v") and not n.startswith(_MANIFEST)
        ),
        key=lambda n: int(n[1:]),
        reverse=True,
    )
    for name in versions[retain:]:
        shutil.rmtree(os.path.join(path, name), ignore_errors=True)


def stream_edges_into(
    triples_stream: DataFrame, aliases: DataFrame, path: str,
    checkpoint: str,
):
    """Attach the upsert loop to a streaming triples DataFrame; returns the
    started query (drain with trigger availableNow in tests)."""
    os.makedirs(path, exist_ok=True)
    spark = triples_stream.sparkSession

    def body(batch_df: DataFrame, batch_id: int) -> None:
        upsert_edge_batch(spark, batch_df, aliases, path, batch_id)

    return (
        triples_stream.writeStream.foreachBatch(body)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
