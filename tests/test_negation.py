"""flag_negated (operators/conversation.py): NegEx-lite pre-cue window —
hand-computed anchors, window limits, cleaning, unanchored triples."""

import pytest

from nlp_series_relation_extraction_spark.operators.conversation import (
    flag_negated,
)

TURNS = "conv_id string, turn_idx int, text string"
TRIPLES = "conv_id string, turn_idx int, subj string, pred string, obj string"


def _run(spark, turns, triples, **kw):
    out = flag_negated(
        spark.createDataFrame(triples, TRIPLES),
        spark.createDataFrame(turns, TURNS),
        **kw,
    )
    return {
        (r.conv_id, r.turn_idx, r.pred): (r.anchor_pos, r.is_negated)
        for r in out.collect()
    }


def test_cue_in_window_negates(spark):
    turns = [("c", 0, "we did not deploy the service")]
    triples = [("c", 0, "we", "deploy", "service")]
    got = _run(spark, turns, triples)
    pos, neg = got[("c", 0, "deploy")]
    assert pos == len("we did not ") + 1
    assert neg is True


def test_affirmed_triple_not_flagged(spark):
    turns = [("c", 0, "we did deploy the service")]
    triples = [("c", 0, "we", "deploy", "service")]
    assert _run(spark, turns, triples)[("c", 0, "deploy")][1] is False


def test_cue_outside_window_ignored(spark):
    # 'not' sits 5 tokens before the anchor; window 4 misses it
    turns = [("c", 0, "not a b c d deploy now")]
    triples = [("c", 0, "x", "deploy", "y")]
    assert _run(spark, turns, triples, window_tokens=4)[
        ("c", 0, "deploy")
    ][1] is False
    assert _run(spark, turns, triples, window_tokens=5)[
        ("c", 0, "deploy")
    ][1] is True


def test_punctuation_and_case_stripped(spark):
    turns = [("c", 0, "They DIDN'T, deploy it")]
    triples = [("c", 0, "they", "deploy", "it")]
    assert _run(spark, turns, triples)[("c", 0, "deploy")][1] is True


def test_unanchored_pred_never_negated(spark):
    turns = [("c", 0, "we did not restart anything")]
    triples = [("c", 0, "we", "deploy", "x")]
    pos, neg = _run(spark, turns, triples)[("c", 0, "deploy")]
    assert (pos, neg) == (0, False)


def test_missing_turn_row_never_negated(spark):
    turns = [("c", 0, "irrelevant")]
    triples = [("c", 7, "we", "deploy", "x")]
    pos, neg = _run(spark, turns, triples)[("c", 7, "deploy")]
    assert (pos, neg) == (0, False)


def test_cue_after_anchor_does_not_negate(spark):
    turns = [("c", 0, "we deploy but not restart")]
    triples = [("c", 0, "we", "deploy", "x")]
    assert _run(spark, turns, triples)[("c", 0, "deploy")][1] is False


def test_custom_cues(spark):
    turns = [("c", 0, "we failed to deploy it")]
    triples = [("c", 0, "we", "deploy", "it")]
    assert _run(spark, turns, triples)[("c", 0, "deploy")][1] is False
    assert _run(
        spark, turns, triples, cues=("failed",)
    )[("c", 0, "deploy")][1] is True


def test_window_validation(spark):
    with pytest.raises(ValueError):
        flag_negated(
            spark.createDataFrame([("c", 0, "s", "p", "o")], TRIPLES),
            spark.createDataFrame([("c", 0, "t")], TURNS),
            window_tokens=0,
        )
