"""Sources & sinks mirroring the reference's I/O surface, Spark-first.

* JSONL scan of DuIE-style records ``{text, spo_list}`` (reference
  ``dataset/dataset_baseline.py:45-51`` reads line-delimited JSON) ->
  transcripts-shaped DataFrame with a ``gold_json`` column.
* Prediction JSONL sink: one JSON object per row, non-ASCII preserved
  (reference ``utils/utils.py:275-282`` ``write_prediction_results`` with
  ``ensure_ascii=False``).
* Transcripts reader with enforced input_hint schema; Iceberg when a
  catalog is configured, parquet otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

SPO_ARRAY_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("predicate", T.StringType()),
            T.StructField("subject", T.StringType()),
            T.StructField("subject_type", T.StringType()),
            T.StructField("object", T.MapType(T.StringType(), T.StringType())),
            T.StructField("object_type", T.MapType(T.StringType(), T.StringType())),
        ]
    )
)

DUIE_SCHEMA = T.StructType(
    [
        T.StructField("text", T.StringType()),
        T.StructField("spo_list", SPO_ARRAY_TYPE),
    ]
)

TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def read_duie_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Line-delimited DuIE records -> transcripts-shaped rows: each line
    becomes one single-turn conversation. conv_id derives from
    monotonically_increasing_id, i.e. it is stable WITHIN one read but
    depends on partition layout — join pred/gold tables built from the SAME
    DataFrame (as the tests do), not from two separate reads of the file.
    Missing ``spo_list`` is tolerated, matching the reference's .get()
    default."""
    raw = spark.read.schema(DUIE_SCHEMA).json(path)
    return (
        raw.withColumn("_rid", F.monotonically_increasing_id())
        .select(
            F.format_string("jsonl_%012d", F.col("_rid")).alias("conv_id"),
            F.lit(0).alias("turn_idx"),
            F.lit("user").alias("role"),
            F.col("text"),
            F.lit(None).cast("string").alias("tool"),
            F.lit(None).cast("timestamp").alias("ts"),
            F.coalesce(
                F.to_json("spo_list"), F.lit("[]")
            ).alias("gold_json"),
        )
    )


def read_transcripts(
    spark: SparkSession, path_or_table: str, fmt: str = "parquet"
) -> DataFrame:
    """Input-hint transcripts reader. ``fmt='iceberg'`` loads a catalog
    table; parquet reads enforce the schema (extra columns pass through)."""
    if fmt == "iceberg":
        return spark.read.format("iceberg").load(path_or_table)
    return spark.read.parquet(path_or_table)


def write_prediction_jsonl(turn_results: DataFrame, path: str) -> None:
    """Per-turn prediction sink: one JSON object per line with the
    reference's output shape {text?, spo_list}; UTF-8 (non-ASCII kept
    verbatim, ensure_ascii=False semantics). Sorted by (conv_id, turn_idx)
    within files for the stable-ordering invariant."""
    (
        turn_results.sortWithinPartitions("conv_id", "turn_idx").select(
            F.to_json(
                F.struct(
                    F.col("conv_id"),
                    F.col("turn_idx"),
                    F.col("triples").alias("spo_list"),
                )
            ).alias("value")
        ).write.mode("overwrite").text(path)
    )


def write_prediction_jsonl_reference_format(
    turn_results_with_text: DataFrame, path: str, single_file: bool = True
) -> None:
    """Reference-shaped prediction sink: one ``{"text": ..., "spo_list":
    [...]}`` object per line (utils/utils.py:275-282 + run_mpn.py
    formatted_outputs), UTF-8 verbatim, sorted within files.

    The reference emits ONE output file; ``single_file=True`` (default)
    matches that via ``coalesce(1)`` — appropriate because this sink is a
    human/scorer-facing artifact, not a data-path table. Pass
    ``single_file=False`` for large corpora to keep the upstream
    partitioning (many part files)."""
    if single_file:
        turn_results_with_text = turn_results_with_text.coalesce(1)
    (
        turn_results_with_text.sortWithinPartitions("conv_id", "turn_idx")
        .select(
            F.to_json(
                F.struct(
                    F.col("text"),
                    F.col("triples").alias("spo_list"),
                )
            ).alias("value")
        )
        .write.mode("overwrite")
        .text(path)
    )


def write_triples(
    triples: DataFrame, path: str, fmt: str = "parquet"
) -> None:
    """Triple-table sink, partitioned by predicate for pruning."""
    if fmt == "iceberg":
        triples.writeTo(path).partitionedBy("predicate").createOrReplace()
    else:
        triples.write.mode("overwrite").partitionBy("predicate").parquet(path)
