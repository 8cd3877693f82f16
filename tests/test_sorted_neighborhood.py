"""sorted_neighborhood (operators/linking.py): merge/purge sliding-window
candidate generation — window semantics, tie determinism, partition
invariance, and the adjacency-recall property blocking misses."""

import pytest

from nlp_series_relation_extraction_spark.operators.linking import (
    sorted_neighborhood,
)

E = "entity_id long, sn_key string"


def _pairs(spark, rows, window, **kw):
    df = sorted_neighborhood(
        spark.createDataFrame(rows, E), window=window, **kw
    )
    return sorted(
        (r.id_a, r.id_b, r.sn_offset) for r in df.collect()
    )


def test_window_semantics_hand_computed(spark):
    # sort order by key: b->2, c->3, d->1, e->4 ; window 3 pairs each row
    # with the next 1..2 rows in that order
    rows = [(1, "d"), (2, "b"), (3, "c"), (4, "e")]
    assert _pairs(spark, rows, window=3) == sorted([
        (1, 4, 1),          # d->e adjacent
        (2, 3, 1), (2, 1, 2),
        (3, 1, 1), (3, 4, 2),
    ])


def test_pair_counts_per_offset(spark):
    # n rows -> exactly n-k pairs at offset k
    rows = [(i, f"k{i:03d}") for i in range(20)]
    got = _pairs(spark, rows, window=4)
    for k in (1, 2, 3):
        assert sum(1 for (_, _, o) in got if o == k) == 20 - k
    assert len(got) == 19 + 18 + 17


def test_key_ties_break_by_id(spark):
    # identical keys: order is (key, id), so 10<20<30 deterministically
    rows = [(30, "same"), (10, "same"), (20, "same")]
    assert _pairs(spark, rows, window=2) == [(10, 20, 1), (20, 30, 1)]


def test_partition_invariance(spark):
    rows = [(i, f"key{(i * 7) % 50:03d}") for i in range(120)]
    one = _pairs(spark, rows, window=5, num_partitions=1)
    many = _pairs(spark, rows, window=5, num_partitions=13)
    assert one == many and len(one) == 119 + 118 + 117 + 116


def test_adjacent_typo_recall_where_blocking_fails(spark):
    # classic merge/purge motivation: a first-character-preserving typo
    # keeps records sort-adjacent even though equality blocking separates
    # them; every (2i, 2i+1) dup pair must be window-covered
    rows = []
    for i in range(40):
        rows.append((2 * i, f"smith{i:04d}x"))
        rows.append((2 * i + 1, f"smith{i:04d}y"))  # the "typo" twin
    got = {(a, b) for (a, b, _) in _pairs(spark, rows, window=2)}
    for i in range(40):
        assert (2 * i, 2 * i + 1) in got


def test_window_must_be_at_least_two(spark):
    with pytest.raises(ValueError):
        sorted_neighborhood(spark.createDataFrame([(1, "a")], E), window=1)
