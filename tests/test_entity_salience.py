"""entity_salience (operators/conversation.py): rank determinism,
share arithmetic, per-conversation isolation."""

from nlp_series_relation_extraction_spark.operators.conversation import (
    entity_salience,
)

T = "conv_id string, turn_idx int, entity_id long"


def _sal(spark, rows):
    return {
        (r.conv_id, r.entity_id): r
        for r in entity_salience(spark.createDataFrame(rows, T)).collect()
    }


def test_frequency_then_earliness_then_id(spark):
    rows = (
        [("c", 0, 1)] * 3          # e1: 3 mentions, first at 0
        + [("c", 2, 2)] * 3        # e2: 3 mentions, first at 2
        + [("c", 1, 3)] * 5        # e3: 5 mentions -> rank 1
        + [("c", 0, 4)] * 3        # e4: ties e1 on (count, first)
    )
    s = _sal(spark, rows)
    assert s[("c", 3)].salience_rank == 1
    assert s[("c", 1)].salience_rank == 2   # (3, first 0), id 1 < 4
    assert s[("c", 4)].salience_rank == 3   # id tiebreak after e1
    assert s[("c", 2)].salience_rank == 4   # first turn 2 sorts last


def test_share_and_turn_counts(spark):
    rows = [("c", 0, 1), ("c", 0, 1), ("c", 3, 1), ("c", 5, 2)]
    s = _sal(spark, rows)
    r = s[("c", 1)]
    assert r.n_mentions == 3 and r.n_turns == 2
    assert (r.first_turn_idx, r.last_turn_idx) == (0, 3)
    assert r.share_ppm == 750_000
    assert s[("c", 2)].share_ppm == 250_000


def test_conversations_isolated(spark):
    rows = [("a", 0, 1), ("a", 1, 2), ("b", 0, 2)]
    s = _sal(spark, rows)
    assert s[("b", 2)].salience_rank == 1
    assert s[("b", 2)].share_ppm == 1_000_000
