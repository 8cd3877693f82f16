"""Spark distribution layer vs plain-Python oracle: exact equality.

Any bug in partitioning, Arrow conversion, explode, or ordering shows up as
a set difference against the oracle running the identical per-row functions.
"""

import json

import pytest
from pyspark.sql import functions as F

from nlp_series_relation_extraction_spark.core.heads import HEADS, extract_row
from nlp_series_relation_extraction_spark.operators.extract import (
    extract_triples,
    extract_turn_results,
)
from nlp_series_relation_extraction_spark.sources.synthetic import (
    synth_pandas,
    synth_transcripts,
)

N_TURNS = 160


def _oracle_triples(pdf, head, planted):
    out = []
    for _, r in pdf.iterrows():
        res = extract_row(
            head, r.text, gold_json=(r.gold_json if planted else None)
        )
        for s in res["spo_list"]:
            out.append(
                (
                    r.conv_id,
                    int(r.turn_idx),
                    s["predicate"],
                    s["subject"],
                    json.dumps(s["object"], sort_keys=True, ensure_ascii=False),
                )
            )
    return sorted(out)


def _spark_triples(rows):
    return sorted(
        (
            r.conv_id,
            r.turn_idx,
            r.predicate,
            r.subject,
            json.dumps(dict(r.object), sort_keys=True, ensure_ascii=False),
        )
        for r in rows
    )


@pytest.mark.parametrize("head", HEADS)
def test_spark_matches_oracle_planted(spark, head):
    t = synth_transcripts(spark, N_TURNS, seed=42, partitions=7)
    got = _spark_triples(extract_triples(t, head=head, planted=True).collect())
    want = _oracle_triples(synth_pandas(N_TURNS, seed=42), head, planted=True)
    assert got == want and len(got) > 0


def test_spark_matches_oracle_hash_encoder(spark):
    t = synth_transcripts(spark, 80, seed=5, partitions=5)
    got = _spark_triples(extract_triples(t, head="bio", planted=False).collect())
    want = _oracle_triples(synth_pandas(80, seed=5), "bio", planted=False)
    assert got == want


def test_results_invariant_under_partitioning(spark):
    t = synth_transcripts(spark, N_TURNS, seed=42, partitions=3)
    a = _spark_triples(
        extract_triples(t, head="mpn", planted=True, num_partitions=2).collect()
    )
    b = _spark_triples(
        extract_triples(t, head="mpn", planted=True, num_partitions=16).collect()
    )
    assert a == b


def test_per_turn_text_equality_invariant(spark):
    """Per-row invariant from BASELINE.json: per-turn text must survive the
    pipeline byte-for-byte under stable (conv_id, turn_idx) ordering."""
    t = synth_transcripts(spark, N_TURNS, seed=42, partitions=6)
    pdf_in = synth_pandas(N_TURNS, seed=42)
    back = (
        t.repartition(11, "conv_id")
        .sortWithinPartitions("conv_id", "turn_idx")
        .select("conv_id", "turn_idx", "text")
        .collect()
    )
    got = {(r.conv_id, r.turn_idx): r.text for r in back}
    want = {(r.conv_id, int(r.turn_idx)): r.text for _, r in pdf_in.iterrows()}
    assert got == want


def test_turn_results_schema_and_counts(spark):
    t = synth_transcripts(spark, 64, seed=1, partitions=4)
    res = extract_turn_results(t, head="mhs", planted=True)
    assert res.count() == 64  # exactly one result row per input turn
    cols = dict(res.dtypes)
    assert cols["entities"] == "array<string>"
    assert "array<struct" in cols["triples"]
    # turn keys survive unchanged
    keys = {(r.conv_id, r.turn_idx) for r in res.select("conv_id", "turn_idx").collect()}
    want = {
        (r.conv_id, int(r.turn_idx))
        for _, r in synth_pandas(64, seed=1).iterrows()
    }
    assert keys == want


def test_null_text_rows_survive(spark):
    df = spark.createDataFrame(
        [("c1", 0, "《甲》是乙写的小说"), ("c1", 1, None), ("c2", 0, "")],
        "conv_id string, turn_idx int, text string",
    )
    res = extract_turn_results(df, head="mpn", planted=False)
    rows = {(r.conv_id, r.turn_idx): r for r in res.collect()}
    assert len(rows) == 3  # null/empty turns still produce result rows
    assert rows[("c1", 1)].triples == [] and rows[("c1", 1)].entities == []
    assert rows[("c2", 0)].triples == []


def test_batch_forward_with_length_bucketing_matches(spark):
    t = synth_transcripts(spark, 100, seed=6, partitions=4)
    a = _spark_triples(
        extract_triples(t, head="bio", planted=False).collect()
    )
    from nlp_series_relation_extraction_spark.operators.extract import (
        extract_turn_results,
    )
    from pyspark.sql import functions as F2

    turns = extract_turn_results(t, head="bio", batch_forward=True)
    b = _spark_triples(
        turns.select("conv_id", "turn_idx", F2.explode("triples").alias("spo"))
        .select("conv_id", "turn_idx", "spo.*")
        .collect()
    )
    assert a == b
