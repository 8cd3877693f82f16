"""Continuously-maintained KG edge table: the streaming end of the north
rule's "materialize adjacency/edge tables" over transcripts that never
stop arriving.

Each micro-batch of extracted triples is canonicalized against the alias
dimension and UPSERTED into the edge table with
operators/graph.py:merge_edge_increment semantics (evidence counts add,
earliest provenance wins). The table is HASH-BUCKETED by canonical
subject id into a fixed number of buckets (``bNNN/`` directories); a
micro-batch rewrites ONLY the buckets its increment touches, each as a
new per-bucket version directory, then atomically flips one JSON
manifest mapping bucket -> committed version. Untouched buckets' files
are never rewritten — per-batch I/O is O(touched buckets + increment),
not O(table). This is exactly the pruning Iceberg's MERGE INTO gets from
partition-level file skipping: with Iceberg the foreachBatch body
becomes a single MERGE INTO over a table bucketed by
``bucket(N, subj_entity_id)`` and the manifest is the snapshot log; the
layout here preserves Iceberg's reader guarantee (readers see the last
committed version of every bucket, never a partial write) in plain
parquet. At 100 TB the bucket count is sized so a bucket is a few tens
of GB (e.g. 4096), and each touched bucket rewrite is a handful of
files; a skewed hot-entity batch still only pays for its own buckets.

The alias dimension is a SNAPSHOT: entity linking is itself periodic
(re-linking continuously would re-canonicalize history), so production
refreshes the alias snapshot on its own cadence and replays affected
keys; the streaming loop takes whatever snapshot it is given.

Equivalence contract (pinned in tests/test_pipeline_io_streaming.py):
draining N micro-batches through the sink yields an edge table IDENTICAL
to the batch pipeline over the full input — merge_edge_increment's
associativity is what makes arbitrary micro-batch boundaries invisible.
The bucket-pruning contract is pinned too: a batch whose increment
touches a strict subset of buckets leaves every other bucket's files
byte-identical on disk.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.graph import canonical_triples, edge_table, merge_edge_increment

_MANIFEST = "_CURRENT"
_BUCKET = "__edge_bucket"
DEFAULT_N_BUCKETS = 32  # sandbox default; size to ~tens of GB/bucket at scale


def _bucket_expr(n_buckets: int):
    """Deterministic bucket of a canonical subject id (xxhash64 is seeded
    Murmur-free and stable across sessions/JVMs, so bucket placement never
    drifts between batches)."""
    return F.pmod(F.xxhash64(F.col("subj_entity_id")), F.lit(n_buckets)).cast(
        "int"
    )


def _bucket_dir(b: int) -> str:
    return f"b{b:04d}"


def _read_manifest(path: str) -> dict | None:
    manifest = os.path.join(path, _MANIFEST)
    if not os.path.exists(manifest):
        return None
    with open(manifest, encoding="utf-8") as f:
        return json.load(f)


def _write_manifest(path: str, state: dict) -> None:
    tmp = os.path.join(path, _MANIFEST + ".tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(state, f)
    os.replace(tmp, os.path.join(path, _MANIFEST))  # atomic flip


def read_current_edges(spark: SparkSession, path: str) -> DataFrame | None:
    """The last committed version of the edge table (union of every
    bucket's committed version directory), or None if nothing committed."""
    state = _read_manifest(path)
    if state is None or not state["buckets"]:
        return None
    paths = [
        os.path.join(path, _bucket_dir(int(b)), v)
        for b, v in state["buckets"].items()
    ]
    return spark.read.parquet(*paths)


def upsert_edge_batch(
    spark: SparkSession, batch_triples: DataFrame, aliases: DataFrame,
    path: str, batch_id: int, n_buckets: int = DEFAULT_N_BUCKETS,
) -> None:
    """One foreachBatch body: canonicalize -> edge-aggregate -> merge with
    the current rows of ONLY the touched buckets -> commit new per-bucket
    versions with one atomic manifest flip.

    Idempotent under foreachBatch's at-least-once replay: the manifest
    records the last committed NUMERIC batch id, and a batch at or below
    it — the crash-between-manifest-flip-and-checkpoint window — is a
    no-op instead of double-counting its evidence into the table. After a
    commit, per-bucket versions older than the previous one are pruned
    (the previous stays for in-flight readers — the parquet stand-in for
    Iceberg snapshot expiry), bounding disk at ~2x table size. A crash
    BEFORE the flip leaves only an orphaned staging dir (cleaned on
    replay) — readers never see it.

    ``n_buckets`` is fixed at table creation (recorded in the manifest);
    later calls inherit it, so callers can't accidentally split the table
    across two bucketings.
    """
    state = _read_manifest(path)
    if state is not None:
        if state["batch_id"] >= batch_id:  # replayed: already folded in
            return
        n_buckets = state["n_buckets"]
    version = f"v{batch_id:06d}"

    inc = edge_table(canonical_triples(batch_triples, aliases)).withColumn(
        _BUCKET, _bucket_expr(n_buckets)
    )
    # computed once: reused for the touched-bucket probe AND the merge
    inc = inc.localCheckpoint(eager=True)
    # bounded collect: at most n_buckets rows (the whole point of buckets)
    touched = sorted(r[0] for r in inc.select(_BUCKET).distinct().collect())
    buckets = dict(state["buckets"]) if state is not None else {}
    if not touched:  # empty batch: advance the committed id only
        _write_manifest(
            path,
            {"batch_id": batch_id, "n_buckets": n_buckets, "buckets": buckets},
        )
        return

    cur_paths = [
        os.path.join(path, _bucket_dir(b), buckets[str(b)])
        for b in touched
        if str(b) in buckets
    ]
    if cur_paths:
        current = spark.read.parquet(*cur_paths)
        merged = merge_edge_increment(current, inc).withColumn(
            _BUCKET, _bucket_expr(n_buckets)
        )
    else:
        merged = inc
    # one job writes every touched bucket: repartition ON the bucket column
    # with an explicit count (AQE must not coalesce this below the bucket
    # fan-out), partitionBy splits the output into bucket=<b> dirs. At real
    # scale the count would be touched*files_per_bucket.
    stage = os.path.join(path, f"_stage_{version}")
    if os.path.exists(stage):  # leftover from a pre-flip crash of this id
        shutil.rmtree(stage, ignore_errors=True)
    (
        merged.repartition(max(len(touched), 1), F.col(_BUCKET))
        .write.partitionBy(_BUCKET)
        .mode("overwrite")
        .parquet(stage)
    )
    for b in touched:
        src = os.path.join(stage, f"{_BUCKET}={b}")
        if not os.path.exists(src):  # defensive: merge never empties a bucket
            continue
        dest_dir = os.path.join(path, _bucket_dir(b))
        os.makedirs(dest_dir, exist_ok=True)
        dest = os.path.join(dest_dir, version)
        if os.path.exists(dest):
            shutil.rmtree(dest, ignore_errors=True)
        os.replace(src, dest)
        buckets[str(b)] = version
    shutil.rmtree(stage, ignore_errors=True)
    _write_manifest(
        path,
        {"batch_id": batch_id, "n_buckets": n_buckets, "buckets": buckets},
    )
    _expire_versions(path, touched)


def _expire_versions(path: str, touched_buckets, retain: int = 2) -> None:
    """Within each TOUCHED bucket, drop all but the newest ``retain``
    version directories (sorted by NUMERIC batch id — lexicographic order
    breaks once ids outgrow the zero-padding). Untouched buckets are not
    even listed: expiry cost is O(touched), like the merge."""
    for b in touched_buckets:
        bdir = os.path.join(path, _bucket_dir(b))
        if not os.path.isdir(bdir):
            continue
        versions = sorted(
            (n for n in os.listdir(bdir) if n.startswith("v")),
            key=lambda n: int(n[1:]),
            reverse=True,
        )
        for name in versions[retain:]:
            shutil.rmtree(os.path.join(bdir, name), ignore_errors=True)


def stream_edges_into(
    triples_stream: DataFrame, aliases: DataFrame, path: str,
    checkpoint: str, n_buckets: int = DEFAULT_N_BUCKETS,
):
    """Attach the upsert loop to a streaming triples DataFrame; returns the
    started query (drain with trigger availableNow in tests)."""
    os.makedirs(path, exist_ok=True)
    spark = triples_stream.sparkSession

    def body(batch_df: DataFrame, batch_id: int) -> None:
        upsert_edge_batch(
            spark, batch_df, aliases, path, batch_id, n_buckets=n_buckets
        )

    return (
        triples_stream.writeStream.foreachBatch(body)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
