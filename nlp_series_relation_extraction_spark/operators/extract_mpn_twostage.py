"""Two-stage distributed mpn extraction: subject fan-out as a real explode.

The single-stage mpn path (operators/extract.py) runs subject decode AND the
per-subject conditional object decode inside one UDF call per turn. That is
optimal when subjects-per-turn is small. The reference's own architecture,
though, explodes the batch to one row per (sentence, subject) and re-runs
the conditional pass over that fan-out in chunks of 1024
(``models/model_mpn.py:180-236``) — at 10^12-turn scale with adversarial
turns (hundreds of subjects), the fan-out itself must be DISTRIBUTED, not
looped inside one task. This module is that scale path:

    stage 1 (mapInPandas): tokenize + subject pointer decode
        -> one row per turn with subject spans array
    explode                -> one row per (turn, subject)   [shuffle-free]
    repartition            -> rebalance the fan-out (a hot turn's subjects
                              spread across the cluster)
    stage 2 (mapInPandas): conditional object decode per (turn, subject)
    groupBy turn           -> reassemble spoes -> convert2ressult

Equality with the single-stage path is asserted in tests — same decode
functions, different physical plan.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..core.decode_po import decode_po_rows, decode_subjects_rows

SUBJECTS_SCHEMA = (
    "conv_id string, turn_idx int, text string, "
    "subjects array<struct<s0:int, s1:int>>"
)

PO_SCHEMA = (
    "conv_id string, turn_idx int, s0 int, s1 int, "
    "po array<struct<o0:int, o1:int, p:int>>"
)

TRIPLE_SCHEMA = (
    "conv_id string, turn_idx int, predicate string, subject string, "
    "subject_type string, object map<string,string>, "
    "object_type map<string,string>"
)


def extract_triples_mpn_twostage(
    transcripts: DataFrame,
    seed: int = 42,
    max_len: int = 512,
    num_partitions: int | None = None,
    vocab: list[str] | None = None,
) -> DataFrame:
    """Distributed-fan-out mpn extraction; output equals the single-stage
    ``extract_triples(head='mpn', planted=False)`` triple table (with the
    same ``vocab``: every stage pins the worker-process tokenizer state,
    so reused workers can't leak a vocabulary between queries).

    NOT the headline plan (round-4 decision, PLANS.md): measured after
    the exchange-pinning fix, single-stage wins at 1x AND 10x (the
    stage-2 re-tokenize/re-encode plus two shuffles cost more than the
    bounded per-turn subject fan-out they rebalance). Kept as the escape
    hatch for corpora with pathological per-row fan-out, where per-row
    cost variance — not throughput — is the straggler risk."""

    df = transcripts.select("conv_id", "turn_idx", "text").withColumn(
        "text", F.regexp_replace("text", "[®◆]", "")
    )
    if num_partitions:
        df = df.repartition(num_partitions, "conv_id")

    def stage1(batches):
        from ..core.tokenization import set_wordpiece_vocab

        set_wordpiece_vocab(vocab)
        for pdf in batches:
            yield decode_subjects_rows(pdf, seed, max_len)

    # stage 1 feeds BOTH the fan-out and the final reassembly join:
    # materialize once or the tokenize+subject-decode UDF runs twice
    subjects = df.mapInPandas(stage1, schema=SUBJECTS_SCHEMA).localCheckpoint(
        eager=False
    )

    fanout = subjects.select(
        "conv_id",
        "turn_idx",
        "text",
        F.explode("subjects").alias("s"),
    ).select("conv_id", "turn_idx", "text", F.col("s.s0"), F.col("s.s1"))
    # rebalance: a turn with many subjects spreads across tasks
    if num_partitions:
        fanout = fanout.repartition(num_partitions)

    def stage2(batches):
        from ..core.tokenization import set_wordpiece_vocab

        set_wordpiece_vocab(vocab)
        for pdf in batches:
            yield decode_po_rows(pdf, seed, max_len)

    po = fanout.mapInPandas(stage2, schema=PO_SCHEMA)

    # reassemble the per-turn spoes dict and finish with convert2ressult
    grouped = (
        po.groupBy("conv_id", "turn_idx")
        .agg(F.collect_list(F.struct("s0", "s1", "po")).alias("subject_pos"))
        .join(subjects.select("conv_id", "turn_idx", "text"), ["conv_id", "turn_idx"])
    )

    def assemble(batches):
        from ..core.decode_span import convert_spoes_to_result
        from ..core.tokenization import set_wordpiece_vocab, tokenize_framed

        set_wordpiece_vocab(vocab)
        for pdf in batches:
            out = {c: [] for c in (
                "conv_id", "turn_idx", "predicate", "subject", "subject_type",
                "object", "object_type",
            )}
            for conv_id, turn_idx, subject_pos, text in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["subject_pos"], pdf["text"]
            ):
                _, tok_start, tok_end = tokenize_framed(text)
                spoes: dict[tuple[int, int], list[tuple[int, int, int]]] = {}
                # collect_list order is nondeterministic; sort by span so the
                # spoes dict insertion order (which check_object's fallback
                # iteration depends on) matches the single-stage decode order
                for sp in sorted(subject_pos, key=lambda x: (x["s0"], x["s1"])):
                    s = (sp["s0"], sp["s1"])
                    spoes.setdefault(s, []).extend(
                        (o["o0"], o["o1"], o["p"]) for o in sp["po"]
                    )
                for spo in convert_spoes_to_result(
                    text, spoes, tok_start, tok_end
                ):
                    out["conv_id"].append(conv_id)
                    out["turn_idx"].append(turn_idx)
                    out["predicate"].append(spo["predicate"])
                    out["subject"].append(spo["subject"])
                    out["subject_type"].append(spo["subject_type"])
                    out["object"].append(spo["object"])
                    out["object_type"].append(spo["object_type"])
            yield pd.DataFrame(out)

    return grouped.mapInPandas(assemble, schema=TRIPLE_SCHEMA)
