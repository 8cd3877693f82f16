"""turn_latency_stats (operators/conversation.py): per-role-pair response
latency — hand-computed gaps, negative-gap accounting, conv isolation."""

from datetime import datetime

from nlp_series_relation_extraction_spark.operators.conversation import (
    turn_latency_stats,
)

T = "conv_id string, turn_idx int, role string, ts timestamp"


def _ts(s):
    return datetime.fromisoformat(s)


def _rows(spark, data):
    out = turn_latency_stats(spark.createDataFrame(data, T)).collect()
    return {(r.from_role, r.to_role): r for r in out}


def test_hand_computed_gaps(spark):
    data = [
        ("c", 0, "user", _ts("2026-01-01 00:00:00")),
        ("c", 1, "assistant", _ts("2026-01-01 00:00:02")),      # 2s
        ("c", 2, "user", _ts("2026-01-01 00:00:05")),           # 3s
        ("c", 3, "assistant", _ts("2026-01-01 00:00:05.5")),    # 0.5s
    ]
    got = _rows(spark, data)
    ua = got[("user", "assistant")]
    assert (ua.n, ua.min_latency_us, ua.max_latency_us) == (
        2, 500_000, 2_000_000,
    )
    assert ua.mean_latency_us == (2_000_000 + 500_000) // 2
    assert ua.n_nonpositive == 0
    au = got[("assistant", "user")]
    assert (au.n, au.mean_latency_us) == (1, 3_000_000)


def test_nonpositive_gaps_counted_not_dropped(spark):
    data = [
        ("c", 0, "a", _ts("2026-01-01 00:00:10")),
        ("c", 1, "b", _ts("2026-01-01 00:00:10")),  # 0 gap
        ("c", 2, "a", _ts("2026-01-01 00:00:08")),  # -2s (clock skew)
    ]
    got = _rows(spark, data)
    assert got[("a", "b")].n_nonpositive == 1
    ba = got[("b", "a")]
    assert (ba.min_latency_us, ba.n_nonpositive) == (-2_000_000, 1)


def test_single_turn_conversations_emit_nothing(spark):
    data = [("c1", 0, "u", _ts("2026-01-01 00:00:00")),
            ("c2", 0, "u", _ts("2026-01-01 00:00:09"))]
    assert _rows(spark, data) == {}


def test_conversations_isolated(spark):
    # the gap between c1's last turn and c2's first must not appear
    data = [
        ("c1", 0, "u", _ts("2026-01-01 00:00:00")),
        ("c1", 1, "a", _ts("2026-01-01 00:00:01")),
        ("c2", 0, "u", _ts("2026-01-01 09:00:00")),
        ("c2", 1, "a", _ts("2026-01-01 09:00:04")),
    ]
    got = _rows(spark, data)
    assert list(got) == [("u", "a")]
    r = got[("u", "a")]
    assert (r.n, r.min_latency_us, r.max_latency_us) == (
        2, 1_000_000, 4_000_000,
    )


def test_order_is_turn_idx_not_ts(spark):
    # adjacency follows turn_idx even when ts disagrees
    data = [
        ("c", 1, "b", _ts("2026-01-01 00:00:00")),
        ("c", 0, "a", _ts("2026-01-01 00:00:05")),
    ]
    got = _rows(spark, data)
    assert list(got) == [("a", "b")]
    assert got[("a", "b")].min_latency_us == -5_000_000
