"""spark-submit entry point for the KG-construction pipeline.

Cluster launch (north-rule packaging):

    zip -r nre_spark.zip nlp_series_relation_extraction_spark
    spark-submit --py-files nre_spark.zip scripts/run_pipeline.py \
        --input /path/transcripts_parquet --workdir /path/kg_work \
        --head mpn --format parquet

Local smoke:

    python scripts/run_pipeline.py --synthetic 2000 --workdir /tmp/kg --head bio

Every stage checkpoints under --workdir and resumes idempotently; per-stage
metrics/lineage land in workdir/metrics.jsonl and workdir/lineage.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description="KG construction pipeline")
    ap.add_argument("--input", help="transcripts parquet path or iceberg table")
    ap.add_argument("--format", default="parquet", choices=["parquet", "iceberg"])
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate N synthetic turns instead of --input")
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--head", default="mpn",
                    choices=["bio", "mpn", "mhs", "biaffine"])
    ap.add_argument("--planted", action="store_true",
                    help="fixture mode: decode planted gold labels")
    ap.add_argument("--link-threshold", type=float, default=0.5)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from nlp_series_relation_extraction_spark.plans.pipeline import run_kg_pipeline
    from nlp_series_relation_extraction_spark.session import get_spark
    from nlp_series_relation_extraction_spark.sources.io import read_transcripts
    from nlp_series_relation_extraction_spark.sources.synthetic import (
        synth_transcripts,
    )

    if not args.synthetic and not args.input:
        ap.error("need --input or --synthetic")  # validate before JVM startup

    spark = get_spark(app_name="kg-pipeline", master=args.master)
    spark.sparkContext.setLogLevel("WARN")

    if args.synthetic:
        transcripts = synth_transcripts(spark, args.synthetic, seed=42)
    else:
        transcripts = read_transcripts(spark, args.input, fmt=args.format)

    out = run_kg_pipeline(
        spark,
        transcripts,
        args.workdir,
        head=args.head,
        planted=args.planted,
        link_threshold=args.link_threshold,
    )
    # per-stage row counts were already recorded by the pipeline's metrics
    # pass — read them back instead of re-counting every stage table
    rows = {}
    with open(os.path.join(args.workdir, "metrics.jsonl")) as f:
        for line in f:
            m = json.loads(line)
            rows[m["stage"]] = m["rows"]
    summary = {name: rows.get(name) for name in out}
    print(json.dumps({"workdir": args.workdir, "head": args.head, "rows": summary}))
    spark.stop()


if __name__ == "__main__":
    main()
