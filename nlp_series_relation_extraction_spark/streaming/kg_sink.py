"""Continuously-maintained KG edge table: the streaming end of the north
rule's "materialize adjacency/edge tables" over transcripts that never
stop arriving.

Each micro-batch of extracted triples is canonicalized against the alias
dimension and UPSERTED into the edge table with
operators/graph.py:merge_edge_increment semantics (evidence counts add,
earliest provenance wins). The table is HASH-BUCKETED by canonical
subject id into a fixed number of buckets (``bNNN/`` directories); a
micro-batch MERGE-ON-READ appends each touched bucket's increment as a
per-bucket DELTA version directory (no read of existing data), then
atomically flips one JSON manifest mapping bucket -> (base version,
ordered delta versions). Readers fold base+deltas with the same
associative fold as ``merge_edge_increment`` (evidence sums, provenance
struct-min), so the view is identical to copy-on-write; a bucket whose
delta count reaches ``COMPACT_DELTAS`` is folded into a fresh base in
the SAME write job as that batch's increment (read amplification is
amortized: one fold per ``COMPACT_DELTAS`` touches, instead of round
5's full bucket read+rewrite on EVERY touch — the 2.58x
``streaming_kg_sink_20b`` regression that verdict item #2 adjudicated).
Untouched buckets' files are never rewritten or read — per-batch I/O is
O(increment + touched-bucket-size / COMPACT_DELTAS). This is exactly
Iceberg's merge-on-read MERGE INTO over a table bucketed by
``bucket(N, subj_entity_id)``: delta dirs are its delete/data delta
files, the fold-at-read is its read-time merge, compaction is
``rewrite_data_files``, and the manifest is the snapshot log; the
layout preserves Iceberg's reader guarantee (readers see the last
committed version set of every bucket, never a partial write) in plain
parquet. At 100 TB the bucket count is sized so a bucket is a few tens
of GB (e.g. 4096), and each touched bucket append is a handful of
small files; a skewed hot-entity batch still only pays for its own
buckets.

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

from ..operators.graph import canonical_triples, edge_table
from ..functions.partitioning import checkpoint_nostats as _ckpt_nostats

_MANIFEST = "_CURRENT"
_BUCKET = "__edge_bucket"
DEFAULT_N_BUCKETS = 32  # sandbox default; size to ~tens of GB/bucket at scale
# merge-on-read compaction policy (Iceberg rewrite_data_files / LSM
# leveling cadence): fold a bucket's delta chain into a fresh base when
# the chain's accumulated ROWS reach COMPACT_FRAC of the base's rows
# (write amplification amortizes to O(log growth) rewrites — appending
# 20 small batches rewrites the bucket ~log2(20) times, not 20), or
# when the chain reaches COMPACT_DELTAS directories regardless of size
# (bounds read-side fold fan-in and file counts).
COMPACT_DELTAS = int(os.environ.get("NRE_SINK_COMPACT_DELTAS", "16"))
COMPACT_FRAC = float(os.environ.get("NRE_SINK_COMPACT_FRAC", "4.0"))


def _bucket_deltas(state: dict) -> dict:
    """Per-bucket ordered delta-version lists; manifests written before
    merge-on-read carry none."""
    return {k: list(v) for k, v in (state.get("deltas") or {}).items()}


def _fold_edges(df: DataFrame) -> DataFrame:
    """The associative merge fold (merge_edge_increment's aggregate) over
    raw base+delta rows: evidence sums, earliest provenance wins."""
    return (
        df.groupBy("subj_entity_id", "predicate", "obj_entity_id")
        .agg(
            F.sum("n_evidence").cast("long").alias("n_evidence"),
            F.min(F.struct("first_conv_id", "first_turn_idx")).alias("_f"),
        )
        .select(
            "subj_entity_id",
            "predicate",
            "obj_entity_id",
            "n_evidence",
            F.col("_f.first_conv_id").alias("first_conv_id"),
            F.col("_f.first_turn_idx").alias("first_turn_idx"),
        )
    )


def _version_key(name: str) -> tuple[int, int]:
    """Sort key for version dir names: ``vNNNNNN`` (batch commit) and
    ``vNNNNNN.rK`` (alias-replay epoch K after batch NNNNNN, which must
    sort AFTER the batch version it rewrote). Numeric parse on both
    parts — lexicographic order breaks once ids outgrow the padding."""
    body = name[1:]
    main, _, suffix = body.partition(".r")
    return (int(main), int(suffix) if suffix else 0)


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
    """The last committed version of the edge table: union of every
    bucket's committed base version plus its delta versions, folded
    with the merge aggregate (None if nothing committed). With no
    deltas outstanding this is a plain multi-path scan — identical to
    the copy-on-write reader."""
    state = _read_manifest(path)
    if state is None or not state["buckets"]:
        return None
    deltas = _bucket_deltas(state)
    paths = [
        os.path.join(path, _bucket_dir(int(b)), v)
        for b, v in state["buckets"].items()
    ]
    delta_paths = [
        os.path.join(path, _bucket_dir(int(b)), v)
        for b, vs in deltas.items()
        for v in vs
    ]
    df = spark.read.parquet(*paths, *delta_paths)
    if not delta_paths:
        return df
    return _fold_edges(df)


def upsert_edge_batch(
    spark: SparkSession, batch_triples: DataFrame, aliases: DataFrame,
    path: str, batch_id: int, n_buckets: int = DEFAULT_N_BUCKETS,
) -> None:
    """One foreachBatch body: canonicalize -> edge-aggregate -> append
    the increment as per-bucket DELTA versions (merge-on-read), folding
    any bucket whose outstanding delta count reached ``COMPACT_DELTAS``
    into a fresh base in the same write job -> one atomic manifest flip.

    Idempotent under foreachBatch's at-least-once replay: the manifest
    records the last committed NUMERIC batch id, and a batch at or below
    it — the crash-between-manifest-flip-and-checkpoint window — is a
    no-op instead of double-counting its evidence into the table. After a
    commit, version directories a compaction superseded are pruned down
    to the previous generation (kept for in-flight readers — the parquet
    stand-in for Iceberg snapshot expiry), bounding disk at ~2x table
    size. A crash BEFORE the flip leaves only an orphaned staging dir
    (cleaned on replay) — readers never see it.

    ``n_buckets`` is fixed at table creation (recorded in the manifest);
    later calls inherit it, so callers can't accidentally split the table
    across two bucketings.
    """
    state = _read_manifest(path)
    if state is not None:
        if state["batch_id"] >= batch_id:  # replayed: already folded in
            return
        n_buckets = state["n_buckets"]
    epoch = int(state.get("relink_epoch", 0)) if state is not None else 0
    version = f"v{batch_id:06d}"

    inc = edge_table(canonical_triples(batch_triples, aliases)).withColumn(
        _BUCKET, _bucket_expr(n_buckets)
    )
    # touched-bucket probe rides the checkpoint action as OBSERVED
    # metrics (n_buckets conditional counts — bounded like the old
    # groupBy collect) instead of a separate per-batch job: the counts
    # feeding the size-based compaction policy are identical, one Spark
    # action per batch fewer (round 6; was ckpt + probe + write, now
    # ckpt-with-metrics + write). The observe node lives below the
    # checkpoint, so downstream reads see the plain materialized RDD.
    from pyspark.sql import Observation

    obs = Observation(f"inc_rows_{version}")
    inc = inc.observe(
        obs,
        *[
            F.count(F.when(F.col(_BUCKET) == b, True)).alias(f"b{b}")
            for b in range(n_buckets)
        ],
    )
    # computed once: reused for the compaction fold AND the write
    inc = inc.transform(_ckpt_nostats)
    _metrics = obs.get
    inc_rows = {
        b: int(_metrics[f"b{b}"])
        for b in range(n_buckets)
        if int(_metrics.get(f"b{b}") or 0) > 0
    }
    touched = sorted(inc_rows)
    buckets = dict(state["buckets"]) if state is not None else {}
    deltas = _bucket_deltas(state) if state is not None else {}
    base_rows = dict((state or {}).get("base_rows") or {})
    delta_rows = dict((state or {}).get("delta_rows") or {})
    if not touched:  # empty batch: advance the committed id only
        _write_manifest(
            path,
            {
                "batch_id": batch_id,
                "n_buckets": n_buckets,
                "buckets": buckets,
                "deltas": deltas,
                "base_rows": base_rows,
                "delta_rows": delta_rows,
                "relink_epoch": epoch,
            },
        )
        return

    # buckets whose delta chain is full fold NOW (base + deltas + this
    # increment -> new base); the rest just append the increment. Row
    # counts are pre-fold upper bounds — exact enough for a cadence
    # heuristic, and free (the touched-bucket probe counts anyway).
    def _due(b: int) -> bool:
        if str(b) not in buckets:
            return False
        chain = deltas.get(str(b), ())
        if len(chain) >= COMPACT_DELTAS - 1:
            return True
        new_rows = delta_rows.get(str(b), 0) + inc_rows[b]
        return new_rows >= COMPACT_FRAC * max(1, base_rows.get(str(b), 0))

    compact = [b for b in touched if _due(b)]
    # a touched bucket with no base yet becomes a base directly
    fresh = [b for b in touched if str(b) not in buckets]
    compact_set = set(compact)
    if compact:
        cur_paths = [
            os.path.join(path, _bucket_dir(b), v)
            for b in compact
            for v in [buckets[str(b)], *deltas.get(str(b), [])]
        ]
        folded = _fold_edges(
            spark.read.parquet(*cur_paths).unionByName(
                inc.where(F.col(_BUCKET).isin(compact)).drop(_BUCKET)
            )
        ).withColumn(_BUCKET, _bucket_expr(n_buckets))
        out = inc.where(~F.col(_BUCKET).isin(compact)).unionByName(folded)
    else:
        out = inc
    # one job writes every touched bucket; partitionBy splits the output
    # into bucket=<b> dirs. The bucket-keyed repartition keeps one
    # writer per bucket (AQE coalesces the tiny shuffles).
    stage = os.path.join(path, f"_stage_{version}")
    if os.path.exists(stage):  # leftover from a pre-flip crash of this id
        shutil.rmtree(stage, ignore_errors=True)
    (
        out.repartition(max(len(touched), 1), F.col(_BUCKET))
        .write.partitionBy(_BUCKET)
        .mode("overwrite")
        .parquet(stage)
    )
    expire = []
    for b in touched:
        src = os.path.join(stage, f"{_BUCKET}={b}")
        if not os.path.exists(src):  # defensive: fold never empties a bucket
            continue
        dest_dir = os.path.join(path, _bucket_dir(b))
        os.makedirs(dest_dir, exist_ok=True)
        dest = os.path.join(dest_dir, version)
        if os.path.exists(dest):
            shutil.rmtree(dest, ignore_errors=True)
        os.replace(src, dest)
        if b in compact_set or b in fresh or str(b) not in buckets:
            buckets[str(b)] = version
            deltas.pop(str(b), None)
            base_rows[str(b)] = (
                base_rows.get(str(b), 0)
                + delta_rows.pop(str(b), 0)
                + inc_rows[b]
                if b in compact_set
                else inc_rows[b]
            )
            delta_rows.pop(str(b), None)
            expire.append(b)
        else:
            deltas.setdefault(str(b), []).append(version)
            delta_rows[str(b)] = delta_rows.get(str(b), 0) + inc_rows[b]
    shutil.rmtree(stage, ignore_errors=True)
    _write_manifest(
        path,
        {
            "batch_id": batch_id,
            "n_buckets": n_buckets,
            "buckets": buckets,
            "deltas": deltas,
            "base_rows": base_rows,
            "delta_rows": delta_rows,
            "relink_epoch": epoch,
        },
    )
    _expire_versions(path, expire, referenced=_referenced(buckets, deltas))


def replay_alias_remap(
    spark: SparkSession, path: str, remap: DataFrame
) -> dict:
    """Periodic re-linking replay: fold an entity-id remap into the
    committed edge table, rewriting ONLY the buckets that hold an
    affected row or receive a moved one.

    Entity linking is periodic (module docstring): a fresh linking run
    publishes its delta as ``remap(old_id, new_id)`` — the clusters it
    merged or re-keyed. This operator makes the "replay affected keys"
    promise real, in two phases mirroring the batch upsert:

    1. PROBE — a column-pruned scan of (subj_entity_id, obj_entity_id)
       over the committed buckets, joined against the broadcast remap, to
       find buckets holding an old id at either endpoint. The probe reads
       two BIGINT columns of the table (with Iceberg, bloom filters /
       zone maps prune it further); the rewrite it gates is the expensive
       part. Destination buckets of moved subjects are computed from the
       remap rows the probe matched (bucket placement is a pure hash of
       subj id — no data read needed).
    2. REWRITE — read ONLY the touched buckets in full, map both endpoint
       ids through the remap (identity where absent), re-aggregate on the
       canonical key (merging two entities can collapse previously
       distinct edges: evidence ADDS, earliest provenance wins — the same
       fold as merge_edge_increment), stage, move per-bucket version
       dirs, flip the manifest once.

    Pruning is sound because every merge partner of a remapped edge
    shares its (new) subject id and therefore its bucket: object remaps
    leave rows in place (fold partners already co-bucketed), and subject
    remaps land in a destination bucket that is touched by construction.
    Untouched buckets' files are never rewritten. A bucket whose rows all
    move away drops out of the manifest (its old version stays on disk
    for in-flight readers until a later touch expires it).

    Replay versions are named ``v{batch:06d}.r{epoch}`` so they sort
    after the batch commit they rewrote and before the next batch; the
    manifest's committed batch id is unchanged, so the streaming loop's
    replay-idempotence window is unaffected. The remap must be fully
    resolved (old_id -> FINAL canonical id; no new_id may itself appear
    as an old_id) — linking's connected-components output already is.

    Returns {"touched": [...], "moved_src": [...], "epoch": k,
    "n_buckets": N}; no-op ({"touched": []}) when the table is empty or
    no committed row references an old id.
    """
    state = _read_manifest(path)
    if state is None or not state["buckets"]:
        return {"touched": [], "moved_src": [], "epoch": 0, "n_buckets": 0}
    n_buckets = state["n_buckets"]
    buckets = dict(state["buckets"])
    deltas = _bucket_deltas(state)
    base_rows = dict(state.get("base_rows") or {})
    delta_rows = dict(state.get("delta_rows") or {})
    epoch = int(state.get("relink_epoch", 0)) + 1
    version = f"v{state['batch_id']:06d}.r{epoch}"

    remap = remap.select(
        F.col("old_id").cast("long").alias("old_id"),
        F.col("new_id").cast("long").alias("new_id"),
    )
    all_paths = [
        os.path.join(path, _bucket_dir(int(b)), v)
        for b, vs in _referenced(buckets, deltas).items()
        for v in vs
    ]
    probe = (
        spark.read.parquet(*all_paths)
        .select("subj_entity_id", "obj_entity_id")
        .withColumn(_BUCKET, _bucket_expr(n_buckets))
    )
    subj_hits = probe.join(
        F.broadcast(remap), probe.subj_entity_id == remap.old_id
    ).select(
        F.col(_BUCKET).alias("src"),
        F.pmod(F.xxhash64("new_id"), F.lit(n_buckets))
        .cast("int")
        .alias("dst"),
    )
    obj_hits = probe.join(
        F.broadcast(remap), probe.obj_entity_id == remap.old_id
    ).select(F.col(_BUCKET).alias("src"), F.col(_BUCKET).alias("dst"))
    hits = subj_hits.unionByName(obj_hits)
    # bounded collect: at most n_buckets distinct values per side
    pairs = hits.select("src", "dst").distinct().collect()
    touched = sorted({r["src"] for r in pairs} | {r["dst"] for r in pairs})
    if not touched:
        return {
            "touched": [], "moved_src": [], "epoch": epoch - 1,
            "n_buckets": n_buckets,
        }

    cur_paths = [
        os.path.join(path, _bucket_dir(b), v)
        for b in touched
        if str(b) in buckets
        for v in [buckets[str(b)], *deltas.get(str(b), [])]
    ]
    cur = spark.read.parquet(*cur_paths)
    s_map = remap.select(
        F.col("old_id").alias("subj_entity_id"),
        F.col("new_id").alias("_subj_new"),
    )
    o_map = remap.select(
        F.col("old_id").alias("obj_entity_id"),
        F.col("new_id").alias("_obj_new"),
    )
    merged = (
        cur.join(F.broadcast(s_map), "subj_entity_id", "left")
        .join(F.broadcast(o_map), "obj_entity_id", "left")
        .select(
            F.coalesce("_subj_new", "subj_entity_id").alias("subj_entity_id"),
            "predicate",
            F.coalesce("_obj_new", "obj_entity_id").alias("obj_entity_id"),
            "n_evidence",
            "first_conv_id",
            "first_turn_idx",
        )
        .groupBy("subj_entity_id", "predicate", "obj_entity_id")
        .agg(
            F.sum("n_evidence").alias("n_evidence"),
            F.min(F.struct("first_conv_id", "first_turn_idx")).alias("_f"),
        )
        .select(
            "subj_entity_id",
            "predicate",
            "obj_entity_id",
            F.col("n_evidence").cast("long").alias("n_evidence"),
            F.col("_f.first_conv_id").alias("first_conv_id"),
            F.col("_f.first_turn_idx").alias("first_turn_idx"),
        )
        .withColumn(_BUCKET, _bucket_expr(n_buckets))
    )
    stage = os.path.join(path, f"_stage_{version}")
    if os.path.exists(stage):
        shutil.rmtree(stage, ignore_errors=True)
    (
        merged.repartition(max(len(touched), 1), F.col(_BUCKET))
        .write.partitionBy(_BUCKET)
        .mode("overwrite")
        .parquet(stage)
    )
    moved_src = []
    for b in touched:
        src = os.path.join(stage, f"{_BUCKET}={b}")
        dest_dir = os.path.join(path, _bucket_dir(b))
        if not os.path.exists(src):
            # every row moved out of this bucket: drop it from the
            # manifest (unlike the batch upsert, replay can empty one)
            if buckets.pop(str(b), None) is not None:
                moved_src.append(b)
            deltas.pop(str(b), None)
            base_rows.pop(str(b), None)
            delta_rows.pop(str(b), None)
            continue
        os.makedirs(dest_dir, exist_ok=True)
        dest = os.path.join(dest_dir, version)
        if os.path.exists(dest):
            shutil.rmtree(dest, ignore_errors=True)
        os.replace(src, dest)
        buckets[str(b)] = version
        deltas.pop(str(b), None)  # replay rewrites fold the delta chain
        # fold only shrinks rows: the old base+delta total stays a
        # valid upper bound for the compaction heuristic
        base_rows[str(b)] = base_rows.get(str(b), 0) + delta_rows.pop(
            str(b), 0
        )
    shutil.rmtree(stage, ignore_errors=True)
    _write_manifest(
        path,
        {
            "batch_id": state["batch_id"],
            "n_buckets": n_buckets,
            "buckets": buckets,
            "deltas": deltas,
            "base_rows": base_rows,
            "delta_rows": delta_rows,
            "relink_epoch": epoch,
        },
    )
    _expire_versions(
        path,
        [b for b in touched if str(b) in buckets],
        referenced=_referenced(buckets, deltas),
    )
    return {
        "touched": touched, "moved_src": moved_src, "epoch": epoch,
        "n_buckets": n_buckets,
    }


def _referenced(buckets: dict, deltas: dict) -> dict[str, set]:
    """bucket -> set of version dir names the manifest still points at."""
    ref: dict[str, set] = {}
    for b, v in buckets.items():
        ref.setdefault(b, set()).add(v)
    for b, vs in deltas.items():
        ref.setdefault(b, set()).update(vs)
    return ref


def _expire_versions(
    path: str, touched_buckets, referenced: dict[str, set],
    retain_unref: int = COMPACT_DELTAS,
) -> None:
    """Within each COMPACTED bucket, drop unreferenced version
    directories beyond the newest ``retain_unref`` (sorted by NUMERIC
    batch id — lexicographic order breaks once ids outgrow the
    zero-padding). Referenced dirs (current base + outstanding deltas)
    are never touched; the newest superseded generation — at most one
    old base plus its folded deltas — stays on disk for in-flight
    readers (Iceberg snapshot expiry's grace window), bounding disk at
    ~2x table size. Untouched buckets are not even listed: expiry cost
    is O(touched), like the merge."""
    for b in touched_buckets:
        bdir = os.path.join(path, _bucket_dir(b))
        if not os.path.isdir(bdir):
            continue
        ref = referenced.get(str(b), set())
        unref = sorted(
            (
                n
                for n in os.listdir(bdir)
                if n.startswith("v") and n not in ref
            ),
            key=_version_key,
            reverse=True,
        )
        for name in unref[retain_unref:]:
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
