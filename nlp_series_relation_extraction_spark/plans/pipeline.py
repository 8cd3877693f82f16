"""End-to-end KG construction pipeline with checkpointed, resumable stages.

    transcripts -> extract (per head) -> mentions -> linking ->
    canonical entities -> canonical triples -> graph (nodes/edges) -> eval

Every stage materializes to a versioned table under ``workdir`` and is
skipped on re-run when its manifest names a committed version built
under the same parameters — the Iceberg-snapshot-style idempotent-resume
contract from the north rule, implemented over parquet (the same layer
works over an Iceberg catalog by swapping the writer).
A ``metrics`` table records per-stage row counts, wall seconds and
partition counts; ``lineage`` records input->output edges with parameters,
so any stage's provenance is queryable.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.extract import extract_triples, extract_turn_results
from ..operators.graph import canonical_triples, edge_table
from ..operators.linking import link_mentions
from ..evaluation.metrics import triple_prf


class StageStore:
    """Parquet-backed stage checkpoint store with versioned-manifest
    commits (the same snapshot contract as streaming/kg_sink.py).

    Each stage lives under ``workdir/<name>/`` as immutable version
    directories ``v000001/, v000002/, ...``; one JSON manifest
    (``_CURRENT``, flipped with an atomic os.replace) names the committed
    version AND the parameters it was built under. A new materialization
    writes a FRESH version directory and flips the manifest only after
    the parquet job fully succeeds, so a driver killed mid-write can
    never make a half-materialized stage readable — crucially, a rerun
    under CHANGED parameters that dies mid-write leaves the previous
    committed version intact and readable (the old mode("overwrite")
    layout destroyed it before the new write was durable). After a
    commit, versions older than the immediately-previous one are expired
    (the previous stays for in-flight readers — Iceberg snapshot expiry
    over plain parquet), bounding disk at ~2x stage size."""

    _MANIFEST = "_CURRENT"

    def __init__(self, spark: SparkSession, workdir: str):
        self.spark = spark
        self.workdir = workdir
        os.makedirs(workdir, exist_ok=True)
        self._metrics: list[dict] = []
        self._lineage: list[dict] = []

    def _stage_dir(self, name: str) -> str:
        return os.path.join(self.workdir, name)

    def _manifest(self, name: str) -> dict | None:
        p = os.path.join(self._stage_dir(name), self._MANIFEST)
        if not os.path.exists(p):
            return None
        with open(p, encoding="utf-8") as f:
            return json.load(f)

    def path(self, name: str) -> str:
        """The committed version directory (read path) of a stage; for a
        never-committed stage, the stage directory itself."""
        st = self._manifest(name)
        if st is None:
            return self._stage_dir(name)
        return os.path.join(self._stage_dir(name), st["version"])

    def done(self, name: str, params: dict | None = None) -> bool:
        """Complete = manifest names a fully-written version AND the
        manifest-recorded params match.

        Resuming a checkpoint produced under different parameters (another
        head, threshold, ...) would silently return stale results labeled
        with the new parameters — a param mismatch forces recompute instead.
        Params live IN the manifest, so commit (data + params) is one
        atomic flip — there is no window where a success marker exists
        with missing or stale params.
        """
        st = self._manifest(name)
        if st is None:
            return False
        vdir = os.path.join(self._stage_dir(name), st["version"])
        if not os.path.exists(os.path.join(vdir, "_SUCCESS")):
            return False
        return params is None or st.get("params", {}) == params

    def read(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self.path(name))

    def _commit(self, name: str, version: str, n: int, params: dict) -> None:
        stage = self._stage_dir(name)
        tmp = os.path.join(stage, self._MANIFEST + ".tmp")
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump({"version": version, "n": n, "params": params}, f)
        os.replace(tmp, os.path.join(stage, self._MANIFEST))  # atomic flip

    def _expire(self, name: str, keep: set[str]) -> None:
        stage = self._stage_dir(name)
        for d in os.listdir(stage):
            full = os.path.join(stage, d)
            if d.startswith("v") and os.path.isdir(full) and d not in keep:
                shutil.rmtree(full, ignore_errors=True)

    def run_stage(
        self,
        name: str,
        builder,
        inputs: list[str],
        params: dict | None = None,
        partition_by: list[str] | None = None,
    ) -> DataFrame:
        """Build + materialize a stage unless already complete (resume)."""
        t0 = time.time()
        if not self.done(name, params or {}):
            st = self._manifest(name)
            n = (st["n"] + 1) if st is not None else 1
            version = f"v{n:06d}"
            stage = self._stage_dir(name)
            os.makedirs(stage, exist_ok=True)
            vdir = os.path.join(stage, version)
            if os.path.exists(vdir):  # orphan of a crashed prior write
                shutil.rmtree(vdir)
            df = builder()
            writer = df.write.mode("overwrite")
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.parquet(vdir)
            self._commit(name, version, n, params or {})
            keep = {version}
            if st is not None:
                keep.add(st["version"])  # previous stays for readers
            self._expire(name, keep)
            status = "computed"
        else:
            status = "resumed"
        out = self.read(name)
        # per-partition row counts (north-rule lineage/metrics requirement):
        # one aggregation over spark_partition_id, recorded with the stage
        pstats = (
            out.groupBy(F.spark_partition_id().alias("pid"))
            .count()
            .agg(
                F.count("*").alias("parts"),
                F.sum("count").alias("rows"),
                F.min("count").alias("min_rows"),
                F.max("count").alias("max_rows"),
            )
            .collect()[0]
        )
        self._metrics.append(
            {
                "stage": name,
                "status": status,
                "rows": int(pstats["rows"] or 0),
                "wall_sec": round(time.time() - t0, 3),
                "n_partitions": int(pstats["parts"]),
                "partition_min_rows": int(pstats["min_rows"] or 0),
                "partition_max_rows": int(pstats["max_rows"] or 0),
                "ts": time.time(),
            }
        )
        self._lineage.append(
            {
                "stage": name,
                "inputs": inputs,
                "output": self.path(name),
                "params": params or {},
            }
        )
        return out

    def flush_metadata(self) -> None:
        with open(os.path.join(self.workdir, "metrics.jsonl"), "a") as f:
            for m in self._metrics:
                f.write(json.dumps(m) + "\n")
        with open(os.path.join(self.workdir, "lineage.jsonl"), "a") as f:
            for ln in self._lineage:
                f.write(json.dumps(ln) + "\n")
        self._metrics, self._lineage = [], []


def run_kg_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    workdir: str,
    head: str = "mpn",
    planted: bool = False,
    link_threshold: float = 0.5,
    gold: DataFrame | None = None,
    link_num_partitions: int | None = None,
    canonicalize_preds: bool = False,
    pred_threshold: float = 0.3,
) -> dict[str, DataFrame]:
    """Full pipeline. Returns dict of stage DataFrames; all stages
    checkpointed under ``workdir`` and resumable.

    Every downstream stage records the FULL upstream parameter set
    (run fingerprint), not just its own knobs: a checkpoint produced under
    head='mpn' must not be resumed by a head='bio' run even though the
    downstream stage itself has no 'head' parameter — any upstream param
    change invalidates the whole chain."""
    store = StageStore(spark, workdir)

    extract_fp = {"head": head, "planted": planted}
    link_fp = {**extract_fp, "link_threshold": link_threshold}

    triples = store.run_stage(
        "triples",
        lambda: extract_triples(transcripts, head=head, planted=planted),
        inputs=["transcripts"],
        params=extract_fp,
    )

    from ..operators.extract import mentions_from_triples

    mentions = store.run_stage(
        "mentions",
        lambda: mentions_from_triples(triples),
        inputs=["triples"],
        params=extract_fp,
    )

    if not store.done("entities", link_fp) or not store.done("aliases", link_fp):
        linked = link_mentions(
            mentions,
            threshold=link_threshold,
            num_partitions=link_num_partitions,
        )
        entities = store.run_stage(
            "entities",
            lambda: linked["entities"],
            inputs=["mentions"],
            params=link_fp,
        )
        aliases = store.run_stage(
            "aliases", lambda: linked["aliases"], inputs=["mentions"],
            params=link_fp,
        )
    else:
        entities = store.run_stage(
            "entities", None, inputs=["mentions"], params=link_fp
        )
        aliases = store.run_stage(
            "aliases", None, inputs=["mentions"], params=link_fp
        )

    canon = store.run_stage(
        "triples_canonical",
        lambda: canonical_triples(triples, aliases),
        inputs=["triples", "aliases"],
        params=link_fp,
    )

    out = {
        "triples": triples,
        "mentions": mentions,
        "entities": entities,
        "aliases": aliases,
        "triples_canonical": canon,
    }

    # optional open-IE stage: the reference extracts against a CLOSED
    # 55-predicate schema, so paraphrase surface forms cannot occur and
    # the stage defaults off; an open-vocabulary upstream turns it on
    # and edges are built over canonical predicate forms instead
    edge_input = canon
    edge_fp = link_fp
    if canonicalize_preds:
        from ..operators.predicates import (
            canonicalize_predicates as _canon_preds,
        )

        pred_fp = {**link_fp, "pred_threshold": pred_threshold}
        if not store.done("pred_mapping", pred_fp) or not store.done(
            "triples_pred_canonical", pred_fp
        ):
            res = _canon_preds(
                canon,
                subj_col="subj_entity_id",
                pred_col="predicate",
                obj_col="obj_entity_id",
                threshold=pred_threshold,
            )
            mapping = store.run_stage(
                "pred_mapping",
                lambda: res["mapping"],
                inputs=["triples_canonical"],
                params=pred_fp,
            )
            edge_input = store.run_stage(
                "triples_pred_canonical",
                lambda: res["triples"],
                inputs=["triples_canonical", "pred_mapping"],
                params=pred_fp,
            )
        else:
            mapping = store.run_stage(
                "pred_mapping", None, inputs=["triples_canonical"],
                params=pred_fp,
            )
            edge_input = store.run_stage(
                "triples_pred_canonical", None,
                inputs=["triples_canonical", "pred_mapping"],
                params=pred_fp,
            )
        out["pred_mapping"] = mapping
        out["triples_pred_canonical"] = edge_input
        edge_fp = pred_fp

    edges = store.run_stage(
        "edges",
        lambda: edge_table(edge_input),
        inputs=["triples_pred_canonical" if canonicalize_preds
                else "triples_canonical"],
        params=edge_fp,
        partition_by=["predicate"],
    )
    out["edges"] = edges
    if gold is not None:
        out["eval"] = store.run_stage(
            "eval",
            lambda: triple_prf(triples, gold),
            inputs=["triples", "gold"],
            params=extract_fp,
        )
    store.flush_metadata()
    return out
