"""Incremental-ingest wrapper (optional; the reference is pure batch).

Structured Streaming over a transcripts directory: new files become new
micro-batches; each batch runs the SAME extraction stage as batch mode (the
mapInPandas plan is stream-compatible: stateless per row, no aggregation
before the sink). Checkpointed, so ingestion resumes exactly-once into the
triples sink. ``Trigger.AvailableNow`` drains everything present and stops,
which is also how the equivalence test runs it hermetically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.extract import extract_triples
from ..sources.io import TRANSCRIPTS_SCHEMA


def read_transcripts_stream(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(path)
    )


def extract_triples_stream(
    transcripts_stream: DataFrame,
    head: str = "mpn",
    seed: int = 42,
) -> DataFrame:
    """Streaming triple extraction: same operator as batch (stateless)."""
    return extract_triples(
        transcripts_stream, head=head, planted=False, seed=seed,
        num_partitions=None,
    )


def run_available_now(
    triples_stream: DataFrame, out_path: str, checkpoint: str
) -> None:
    """Drain all currently-available input into a parquet sink and stop."""
    q = (
        triples_stream.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
