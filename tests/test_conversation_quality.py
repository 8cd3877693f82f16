"""conversation_quality (operators/conversation.py): conversation-level
curation gate — hand-computed stats and threshold behavior."""

import pytest

from nlp_series_relation_extraction_spark.operators.conversation import (
    conversation_quality,
)

T = "conv_id string, turn_idx int, role string, text string"


def _rows(spark, data, **kw):
    out = conversation_quality(spark.createDataFrame(data, T), **kw)
    return {r.conv_id: r for r in out.collect()}


def test_hand_computed_stats(spark):
    data = [
        ("c", 0, "user", "hello hi"),        # 8 chars
        ("c", 1, "assistant", "x" * 12),
        ("c", 2, "tool", "y" * 4),
        ("c", 3, "assistant", "z" * 16),
    ]
    r = _rows(spark, data)["c"]
    assert (r.n_turns, r.n_roles, r.n_role_changes) == (4, 3, 3)
    assert r.alternation_ppm == 1_000_000
    assert r.tool_turn_share_ppm == 1_000_000 // 4
    assert r.mean_turn_chars == (8 + 12 + 4 + 16) // 4
    assert r.keep is True


def test_mono_role_conversation_dropped(spark):
    data = [("c", i, "user", "some text here") for i in range(5)]
    r = _rows(spark, data)["c"]
    assert (r.n_roles, r.n_role_changes, r.alternation_ppm) == (1, 0, 0)
    assert r.keep is False


def test_single_turn_dropped_and_zero_alternation(spark):
    r = _rows(spark, [("c", 0, "user", "long enough text")])["c"]
    assert (r.n_turns, r.alternation_ppm) == (1, 0)
    assert r.keep is False


def test_mean_chars_band(spark):
    short = [("s", 0, "a", "x"), ("s", 1, "b", "y")]
    r = _rows(spark, short)["s"]
    assert r.mean_turn_chars == 1 and r.keep is False
    ok = [("s", 0, "a", "x" * 30), ("s", 1, "b", "y" * 30)]
    assert _rows(spark, ok)["s"].keep is True
    assert _rows(spark, ok, max_mean_chars=20)["s"].keep is False


def test_null_text_counts_zero(spark):
    data = [("c", 0, "a", None), ("c", 1, "b", "x" * 40)]
    r = _rows(spark, data)["c"]
    assert r.mean_turn_chars == 20


def test_same_role_runs_lower_alternation(spark):
    # a a b b -> 1 change over 3 gaps = 333333 ppm
    data = [("c", i, r, "text " * 5) for i, r in
            enumerate(["a", "a", "b", "b"])]
    r = _rows(spark, data)["c"]
    assert r.alternation_ppm == 1_000_000 // 3
    assert _rows(spark, data, min_alternation_ppm=400_000)["c"].keep is False


def test_validation(spark):
    with pytest.raises(ValueError):
        conversation_quality(
            spark.createDataFrame([("c", 0, "a", "t")], T), min_turns=0
        )
