"""topic_segments (operators/conversation.py): TextTiling-style
adjacent-turn Jaccard segmentation — boundary rules, empty-turn
semantics, segment numbering, conversation isolation."""

from nlp_series_relation_extraction_spark.operators.conversation import (
    topic_segments,
)

S = "conv_id string, turn_idx int, text string"


def _seg(spark, rows, **kw):
    return {
        (r.conv_id, r.turn_idx): (
            r.jaccard_prev_ppm,
            bool(r.is_boundary),
            r.segment_idx,
        )
        for r in topic_segments(
            spark.createDataFrame(rows, S), **kw
        ).collect()
    }


def test_boundaries_and_segments(spark):
    rows = [
        ("c", 0, "alpha beta gamma"),
        ("c", 1, "beta gamma delta"),   # jac 2/4 = 500000 -> same topic
        ("c", 2, "xray yankee"),        # jac 0 -> boundary
        ("c", 3, "xray yankee"),        # jac 1e6 -> same topic
    ]
    got = _seg(spark, rows, min_jaccard_ppm=200_000)
    assert got[("c", 0)] == (None, True, 1)
    assert got[("c", 1)] == (500_000, False, 1)
    assert got[("c", 2)] == (0, True, 2)
    assert got[("c", 3)] == (1_000_000, False, 2)


def test_empty_turns_do_not_shift(spark):
    # both empty -> union 0 -> jaccard defined as 1e6 (no boundary)
    rows = [("c", 0, ""), ("c", 1, ""), ("c", 2, None)]
    got = _seg(spark, rows)
    assert got[("c", 1)] == (1_000_000, False, 1)
    assert got[("c", 2)] == (1_000_000, False, 1)


def test_duplicate_tokens_are_set_semantics(spark):
    # "a a a b" vs "a c": distinct sets {a,b} / {a,c} -> 1/3
    rows = [("c", 0, "a a a b"), ("c", 1, "a c")]
    got = _seg(spark, rows)
    assert got[("c", 1)][0] == 1_000_000 // 3


def test_case_folding(spark):
    rows = [("c", 0, "Alpha BETA"), ("c", 1, "alpha beta")]
    got = _seg(spark, rows)
    assert got[("c", 1)] == (1_000_000, False, 1)


def test_conversations_are_isolated(spark):
    rows = [("a", 0, "x y"), ("b", 0, "x y"), ("b", 1, "x y")]
    got = _seg(spark, rows)
    assert got[("a", 0)] == (None, True, 1)
    assert got[("b", 0)] == (None, True, 1)
    assert got[("b", 1)] == (1_000_000, False, 1)


def test_threshold_is_strict_less_than(spark):
    # jac exactly at the threshold must NOT open a boundary
    rows = [("c", 0, "a b c d"), ("c", 1, "a b x y z w")]
    # distinct sets {a,b,c,d} vs {a,b,x,y,z,w}: inter 2, union 8 -> 250000
    got = _seg(spark, rows, min_jaccard_ppm=250_000)
    assert got[("c", 1)] == (250_000, False, 1)
    got2 = _seg(spark, rows, min_jaccard_ppm=250_001)
    assert got2[("c", 1)][1] is True
    assert got2[("c", 1)][2] == 2
