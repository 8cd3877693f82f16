"""Stream-maintained aggregate views: the delta-rule IVM
(operators/maintenance.py:maintain_agg_view) as a foreachBatch body over
the same bucket-pruned versioned-parquet layout as the KG edge sink
(streaming/kg_sink.py) — one JSON manifest maps bucket -> committed
version, a micro-batch reads and rewrites ONLY the buckets its delta's
keys hash into, numeric batch-id idempotence absorbs foreachBatch's
at-least-once replay.

Scope: APPEND streams (inserts only — retractions ride the batch API's
``deletes`` arm, not a stream). The maintained table is key-cardinality-
sized, but key cardinality is unbounded in general (per-entity views),
so the bucket pruning is load-bearing exactly as it is for the edge
sink: per-batch I/O is O(touched buckets + delta), never O(view).

Equivalence contract (tests/test_streaming_ivm.py): draining N
micro-batches yields a view IDENTICAL to one batch agg_view over the
full input — maintain_agg_view's associativity makes batch boundaries
invisible; replaying a committed batch id is a no-op; untouched
buckets' files stay byte-identical."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.partitioning import checkpoint_nostats as _ckpt_nostats
from ..operators.maintenance import agg_view, maintain_agg_view
from .kg_sink import (
    _bucket_dir,
    _expire_versions,
    _read_manifest,
    _write_manifest,
)

DEFAULT_N_BUCKETS = 16
_BUCKET = "__view_bucket"


def _key_bucket_expr(keys: list[str], n_buckets: int):
    return F.pmod(
        F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_buckets)
    ).cast("int")


def read_current_view(spark: SparkSession, path: str) -> DataFrame | None:
    state = _read_manifest(path)
    if state is None or not state["buckets"]:
        return None
    paths = [
        os.path.join(path, _bucket_dir(int(b)), v)
        for b, v in state["buckets"].items()
    ]
    return spark.read.parquet(*paths)


def upsert_view_batch(
    spark: SparkSession,
    batch_rows: DataFrame,
    keys: list[str],
    measures: dict,
    path: str,
    batch_id: int,
    n_buckets: int = DEFAULT_N_BUCKETS,
) -> None:
    """One foreachBatch body: aggregate the batch to a key-grouped
    delta, merge with the CURRENT rows of only the touched buckets via
    maintain_agg_view, commit new per-bucket versions with one atomic
    manifest flip. Same crash/replay contract as the edge sink: a
    replayed batch id at or below the committed one is a no-op; a crash
    before the flip leaves an unreadable staging dir only."""
    state = _read_manifest(path)
    if state is not None:
        if state["batch_id"] >= batch_id:
            return
        n_buckets = state["n_buckets"]
    version = f"v{batch_id:06d}"

    delta = agg_view(batch_rows, keys, measures).withColumn(
        _BUCKET, _key_bucket_expr(keys, n_buckets)
    ).transform(_ckpt_nostats)
    touched = sorted(r[0] for r in delta.select(_BUCKET).distinct().collect())
    buckets = dict(state["buckets"]) if state is not None else {}
    if not touched:
        _write_manifest(
            path,
            {"batch_id": batch_id, "n_buckets": n_buckets,
             "buckets": buckets},
        )
        return

    cur_paths = [
        os.path.join(path, _bucket_dir(b), buckets[str(b)])
        for b in touched
        if str(b) in buckets
    ]
    view_cols = [c for c in delta.columns if c != _BUCKET]
    if cur_paths:
        current = spark.read.parquet(*cur_paths).select(view_cols)
        merged = maintain_agg_view(
            current, keys, measures,
            adds=None, deletes=None, delta_view=delta.select(view_cols),
        )
    else:
        merged = delta.select(view_cols)
    merged = merged.withColumn(_BUCKET, _key_bucket_expr(keys, n_buckets))
    stage = os.path.join(path, f"_stage_{version}")
    if os.path.exists(stage):
        shutil.rmtree(stage, ignore_errors=True)
    (
        merged.repartition(max(len(touched), 1), F.col(_BUCKET))
        .write.partitionBy(_BUCKET)
        .mode("overwrite")
        .parquet(stage)
    )
    for b in touched:
        src = os.path.join(stage, f"{_BUCKET}={b}")
        if not os.path.exists(src):
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
    # copy-on-write view: current version referenced, one superseded
    # version retained for in-flight readers (the old keep-newest-2)
    _expire_versions(
        path,
        touched,
        referenced={b: {v} for b, v in buckets.items()},
        retain_unref=1,
    )


def stream_view_into(
    rows_stream: DataFrame,
    keys: list[str],
    measures_factory,
    path: str,
    checkpoint: str,
    n_buckets: int = DEFAULT_N_BUCKETS,
):
    """Wire a stream into the maintained view: availableNow drain with
    upsert_view_batch as the foreachBatch body. ``measures_factory`` is
    a zero-arg callable returning the measures dict (Column expressions
    must be built on the executor-side driver callback, not captured)."""
    def _body(batch_df: DataFrame, batch_id: int) -> None:
        upsert_view_batch(
            batch_df.sparkSession, batch_df, keys, measures_factory(),
            path, int(batch_id), n_buckets,
        )

    q = (
        rows_stream.writeStream.foreachBatch(_body)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
