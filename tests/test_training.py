"""Distributed BIO-head training: loss must decrease across Spark epochs."""

import numpy as np

from nlp_series_relation_extraction_spark.operators.train import train_bio_head
from nlp_series_relation_extraction_spark.sources.synthetic import synth_transcripts


def test_distributed_sgd_reduces_masked_bce(spark):
    t = synth_transcripts(spark, 240, seed=42, partitions=4)
    res = train_bio_head(t, epochs=4, lr=0.08)
    h = res["loss_history"]
    assert len(h) == 4
    assert all(b < a for a, b in zip(h, h[1:]))  # strictly decreasing
    assert res["best_loss"] == min(h)
    assert res["weights"].shape == (64, 112)
    assert np.isfinite(res["weights"]).all()


def test_training_deterministic(spark):
    t = synth_transcripts(spark, 120, seed=7, partitions=3)
    a = train_bio_head(t, epochs=2, lr=0.05)
    b = train_bio_head(t, epochs=2, lr=0.05)
    assert a["loss_history"] == b["loss_history"]


def test_long_text_truncation_bounds_work():
    from nlp_series_relation_extraction_spark.core.heads import HEADS, extract_row

    long_text = "《甲乙丙》是丁写的小说" + "很长的内容" * 300  # ~1500 chars
    for head in HEADS:
        res = extract_row(head, long_text, max_len=120)
        assert isinstance(res["spo_list"], list)  # bounded, no crash
