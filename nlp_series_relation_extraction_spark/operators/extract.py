"""Spark extraction stage: transcripts -> per-turn (entities, triples).

One ``mapInPandas`` stage per head, mirroring the reference eval lifecycle
(``run_baseline.py``/``run_mpn.py``/``run_mhs.py`` evaluate paths) as a
distributed dataflow:

    transcripts
      -> [JVM] regexp_replace normalization (®◆ strip, Catalyst-planned)
      -> repartition(conv_id)            # dense Arrow batches, co-located convs
      -> mapInPandas(tokenize -> encode -> threshold decode -> span assemble)
      -> per-turn row: entities array<string> + triples array<struct>
      -> explode -> triple table

Scale notes (100TB design):
* Python runs ONLY inside the Arrow-batched UDF; everything else is Catalyst
  (column pruning means only conv_id/turn_idx/text/gold_json reach Python).
* Arrow batch size is bounded (session.py) so the [L,L,R] heads can't blow
  executor memory; the UDF additionally micro-chunks the mpn subject fan-out
  like the reference's split_heads=1024 chunking (model_mpn.py:207-211).
* The stage is stateless per row -> embarrassingly parallel; repartition(N)
  on conv_id gives deterministic shuffle-level parallelism and keeps
  conversations co-located for downstream per-conv ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..core.heads import DEFAULT_MAX_LEN, extract_row, extract_rows_batch

# array<struct> of SPO dicts + entity mentions, one row per turn
TURN_RESULT_SCHEMA = (
    "conv_id string, turn_idx int, entities array<string>, "
    "triples array<struct<predicate:string, subject:string, subject_type:string, "
    "object:map<string,string>, object_type:map<string,string>>>"
)
TURN_RESULT_SCHEMA_WITH_TEXT = TURN_RESULT_SCHEMA + ", text string"

TRIPLE_COLUMNS = [
    "conv_id",
    "turn_idx",
    "predicate",
    "subject",
    "subject_type",
    "object",
    "object_type",
]


def _make_udf(head: str, planted: bool, seed: int, max_len: int, batch_forward: bool = False, keep_text: bool = False, weights_path: str | None = None, vocab: list[str] | None = None):
    def run(batches):
        # activate (or with None, RESET) the trained sub-word vocabulary in
        # THIS worker process: module state never crosses the driver/
        # executor boundary implicitly — the closure carries the artifact —
        # and Spark REUSES python workers across queries, so a stale vocab
        # from an earlier vocab-bearing query would otherwise leak into a
        # later no-vocab extraction in the same worker.
        from ..core.tokenization import set_wordpiece_vocab

        set_wordpiece_vocab(vocab)
        for pdf in batches:
            out = {
                "conv_id": pdf["conv_id"].tolist(),
                "turn_idx": pdf["turn_idx"].tolist(),
                "entities": [],
                "triples": [],
            }
            golds = pdf["gold_json"] if planted else None
            # extract_rows_batch (one padded, memory-bounded trunk forward
            # per chunk) is the integration shape for a real batched model
            # — all four heads; with the tiny hash encoder the per-token
            # Python work dominates and the per-row path measured
            # equal-or-better with far less variance, so it stays the
            # default. Flip here when plugging a real model.
            if not planted and batch_forward:
                results = extract_rows_batch(
                    head, pdf["text"].tolist(), seed=seed, max_len=max_len,
                    weights_path=weights_path,
                )
            else:
                results = None
            for i, text in enumerate(pdf["text"]):
                if text is None or (isinstance(text, float)):
                    # null text (or pandas NaN) -> no entities, no triples
                    res = {"entity_list": [], "spo_list": []}
                elif results is not None:
                    res = results[i]
                else:
                    res = extract_row(
                        head,
                        text,
                        gold_json=(golds.iloc[i] if planted else None),
                        seed=seed,
                        max_len=max_len,
                        weights_path=weights_path,
                    )
                out["entities"].append(res["entity_list"])
                out["triples"].append(
                    [
                        (
                            s["predicate"],
                            s["subject"],
                            s["subject_type"],
                            s["object"],
                            s["object_type"],
                        )
                        for s in res["spo_list"]
                    ]
                )
            if keep_text:
                out["text"] = pdf["text"].tolist()
            import pandas as pd

            yield pd.DataFrame(out)

    return run


def extract_turn_results(
    transcripts: DataFrame,
    head: str = "bio",
    planted: bool = False,
    seed: int = 42,
    max_len: int = DEFAULT_MAX_LEN,
    num_partitions: int | None = None,
    batch_forward: bool = False,
    pre_partitioned: bool = False,
    keep_text: bool = False,
    weights_path: str | None = None,
    vocab: list[str] | None = None,
) -> DataFrame:
    """Per-turn extraction results (entities + triples arrays).
    ``keep_text=True`` carries the (normalized) turn text through — needed
    for the reference-shaped prediction sink.

    ``planted=True`` reads the ``gold_json`` column (fixture mode) so decode
    reproduces gold exactly; otherwise the deterministic HashEncoder runs.
    ``batch_forward=True`` switches the BIO head to one padded batched
    forward per Arrow batch (real-model integration shape).
    ``vocab`` activates a trained sub-word vocabulary (functions/bpe.py
    wordpiece_vocab) for greedy longest-match wordpiece segmentation —
    the reference's real tokenizer semantics (data_utils.py:98-112) —
    instead of the fixed-width stand-in.
    """
    cols = ["conv_id", "turn_idx", "text"] + (["gold_json"] if planted else [])
    df = transcripts.select(*cols).withColumn(
        # ®◆ normalization stays JVM-side (dataset_mpn.py:36-37 semantics);
        # extract_row re-applies it idempotently for oracle parity.
        "text",
        F.regexp_replace("text", "[®◆]", ""),
    )
    if pre_partitioned:
        # input is already laid out by conv_id (e.g. an Iceberg table
        # partitioned/bucketed on conv_id — the 100TB production layout):
        # no shuffle, the UDF maps straight over the scan splits
        pass
    elif num_partitions:
        df = df.repartition(num_partitions, "conv_id")
    else:
        # PIN the partition count (round-4 find): a bare
        # repartition("conv_id") lets AQE coalesce the exchange by BYTE
        # size, and transcript rows are tiny while the UDF per-row cost is
        # large — at sf0.1 AQE folded 40k turns into ONE task and the
        # whole extraction ran on one core (8.6s vs 1.6s measured). An
        # explicit count is user-pinned, AQE leaves it alone; compute-
        # parallel UDF stages must size partitions by CORES, not bytes.
        df = df.repartition(
            transcripts.sparkSession.sparkContext.defaultParallelism,
            "conv_id",
        )
    if batch_forward:
        # length bucketing: sorting turns by length within partitions keeps
        # the batched forward's dynamic padding dense (the reference pads to
        # batch max-len, dataset_baseline.py:180-184 — SURVEY §4 micro-opt)
        df = df.sortWithinPartitions(F.length("text"))
    return df.mapInPandas(
        _make_udf(head, planted, seed, max_len, batch_forward, keep_text,
                  weights_path, vocab),
        schema=TURN_RESULT_SCHEMA_WITH_TEXT if keep_text else TURN_RESULT_SCHEMA,
    )


def extract_triples(
    transcripts: DataFrame,
    head: str = "bio",
    planted: bool = False,
    seed: int = 42,
    max_len: int = DEFAULT_MAX_LEN,
    num_partitions: int | None = None,
    pre_partitioned: bool = False,
    weights_path: str | None = None,
    vocab: list[str] | None = None,
) -> DataFrame:
    """Flat triple table: one row per extracted SPO."""
    turns = extract_turn_results(
        transcripts, head, planted, seed, max_len, num_partitions,
        pre_partitioned=pre_partitioned, weights_path=weights_path,
        vocab=vocab,
    )
    return turns.select(
        "conv_id", "turn_idx", F.explode("triples").alias("spo")
    ).select("conv_id", "turn_idx", "spo.*")


def mentions_from_triples(triples: DataFrame) -> DataFrame:
    """Mention occurrences from a triple table: subject + object @value per
    row. Single definition shared by the pipeline, the linking queries and
    eval — keep mention derivation from drifting between them."""
    return triples.select(
        "conv_id", "turn_idx", F.col("subject").alias("mention")
    ).unionByName(
        triples.select(
            "conv_id",
            "turn_idx",
            F.element_at("object", "@value").alias("mention"),
        )
    )


def extract_entities(
    transcripts: DataFrame,
    head: str = "bio",
    planted: bool = False,
    seed: int = 42,
    max_len: int = DEFAULT_MAX_LEN,
) -> DataFrame:
    """Flat entity-mention table (one row per decoded mention occurrence)."""
    turns = extract_turn_results(transcripts, head, planted, seed, max_len)
    return turns.select(
        "conv_id", "turn_idx", F.explode("entities").alias("mention")
    )
