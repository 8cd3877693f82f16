"""End-to-end plain-Python roundtrip: planted gold -> decode -> gold.

P/R must be exactly 1.0 for every head over the synthetic corpus (which
includes n-ary slots, symmetric pairs, overlapping subject==object mentions,
mixed-script runs and no-gold noise turns) — well above the 0.95 target.
"""

import json

import pytest

from nlp_series_relation_extraction_spark.core.heads import HEADS, extract_row
from nlp_series_relation_extraction_spark.sources.synthetic import synth_pandas

N_TURNS = 300


def _canon(spo):
    return (
        spo["predicate"],
        spo["subject"],
        json.dumps(spo["object"], sort_keys=True, ensure_ascii=False),
    )


@pytest.mark.parametrize("head", HEADS)
def test_planted_roundtrip_pr_is_one(head):
    df = synth_pandas(N_TURNS, seed=42)
    tp = fp = fn = 0
    for _, row in df.iterrows():
        gold = json.loads(row.gold_json)
        pred = extract_row(head, row.text, gold_json=row.gold_json)["spo_list"]
        gset = [_canon(s) for s in gold]
        pset = {_canon(s) for s in pred}
        for s in pred:
            if _canon(s) in gset:
                tp += 1
            else:
                fp += 1
        fn += sum(1 for g in gset if g not in pset)
    assert fp == 0 and fn == 0 and tp > 100


@pytest.mark.parametrize("head", HEADS)
def test_hash_encoder_deterministic(head):
    df = synth_pandas(40, seed=9)
    a = [extract_row(head, t)["spo_list"] for t in df.text]
    b = [extract_row(head, t)["spo_list"] for t in df.text]
    assert a == b


def test_empty_and_degenerate_inputs():
    for head in HEADS:
        assert extract_row(head, "")["spo_list"] == []
        assert extract_row(head, " ")["spo_list"] == []
        assert extract_row(head, "®◆")["spo_list"] == []
        # single char, planted with empty gold
        assert extract_row(head, "甲", gold_json="[]")["spo_list"] == []


def test_bio_batch_forward_equals_per_row():
    from nlp_series_relation_extraction_spark.core.heads import (
        extract_bio_rows_batch,
    )

    texts = synth_pandas(200, seed=13).text.tolist()
    batch = extract_bio_rows_batch(texts)
    per = [extract_row("bio", t) for t in texts]
    assert [b["spo_list"] for b in batch] == [p["spo_list"] for p in per]
    assert [b["entity_list"] for b in batch] == [p["entity_list"] for p in per]
