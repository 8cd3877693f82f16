"""End-to-end KG construction pipeline with checkpointed, resumable stages.

    transcripts -> extract (per head) -> mentions -> linking ->
    canonical entities -> canonical triples -> graph (nodes/edges) -> eval

Every stage materializes to a table under ``workdir`` and is skipped on
re-run when its success marker exists — the Iceberg-snapshot-style
idempotent-resume contract from the north rule, implemented over parquet
(the same layer works over an Iceberg catalog by swapping the writer).
A ``metrics`` table records per-stage row counts, wall seconds and
partition counts; ``lineage`` records input->output edges with parameters,
so any stage's provenance is queryable.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.extract import extract_triples, extract_turn_results
from ..operators.graph import canonical_triples, edge_table
from ..operators.linking import link_mentions
from ..evaluation.metrics import triple_prf


class StageStore:
    """Parquet-backed stage checkpoint store with success markers."""

    def __init__(self, spark: SparkSession, workdir: str):
        self.spark = spark
        self.workdir = workdir
        os.makedirs(workdir, exist_ok=True)
        self._metrics: list[dict] = []
        self._lineage: list[dict] = []

    def path(self, name: str) -> str:
        return os.path.join(self.workdir, name)

    def _params_path(self, name: str) -> str:
        return os.path.join(self.workdir, f"{name}._params.json")

    def done(self, name: str, params: dict | None = None) -> bool:
        """Complete = success marker present AND recorded params match.

        Resuming a checkpoint produced under different parameters (another
        head, threshold, ...) would silently return stale results labeled
        with the new parameters — a param mismatch forces recompute instead.
        """
        if not os.path.exists(os.path.join(self.path(name), "_SUCCESS")):
            return False
        if params is None:
            return True
        try:
            with open(self._params_path(name)) as f:
                recorded = json.load(f)
        except FileNotFoundError:
            recorded = {}
        return recorded == params

    def read(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self.path(name))

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
            df = builder()
            writer = df.write.mode("overwrite")
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.parquet(self.path(name))
            with open(self._params_path(name), "w") as f:
                json.dump(params or {}, f)
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
    edges = store.run_stage(
        "edges",
        lambda: edge_table(canon),
        inputs=["triples_canonical"],
        params=link_fp,
        partition_by=["predicate"],
    )

    out = {
        "triples": triples,
        "mentions": mentions,
        "entities": entities,
        "aliases": aliases,
        "triples_canonical": canon,
        "edges": edges,
    }
    if gold is not None:
        out["eval"] = store.run_stage(
            "eval",
            lambda: triple_prf(triples, gold),
            inputs=["triples", "gold"],
            params=extract_fp,
        )
    store.flush_metadata()
    return out
