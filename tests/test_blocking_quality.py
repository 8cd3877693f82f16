"""blocking_quality (operators/linking.py): reduction ratio, pairs
completeness, pairs quality — hand-computed on tiny block layouts."""

from nlp_series_relation_extraction_spark.operators.linking import (
    blocking_quality,
)

B = "entity_id long, block_key string"
G = "id_a long, id_b long"


def _q(spark, blocks, gold):
    [row] = blocking_quality(
        spark.createDataFrame(blocks, B),
        spark.createDataFrame(gold, G),
    ).collect()
    return row


def test_hand_computed_single_pass(spark):
    # blocks: k1={1,2,3}, k2={4,5}; entities 1..5
    blocks = [(1, "k1"), (2, "k1"), (3, "k1"), (4, "k2"), (5, "k2")]
    # gold: (1,2) covered, (1,4) not, (4,5) covered
    gold = [(1, 2), (4, 1), (4, 5)]
    r = _q(spark, blocks, gold)
    assert (r.n_entities, r.n_blocks) == (5, 2)
    assert r.n_comparisons == 3 + 1          # C(3,2) + C(2,2)
    assert r.max_block_size == 3
    # all-pairs C(5,2)=10 -> rr = 1e6 - 4*1e6 div 10
    assert r.reduction_ratio_ppm == 1_000_000 - 400_000
    assert r.completeness_ppm == 2 * 1_000_000 // 3
    assert r.quality_ppm == 2 * 1_000_000 // 4


def test_multi_pass_counts_comparisons_per_key(spark):
    # pair (1,2) shares TWO keys: compared twice (multiset convention),
    # but covered gold pairs count once
    blocks = [(1, "a"), (2, "a"), (1, "b"), (2, "b")]
    gold = [(1, 2)]
    r = _q(spark, blocks, gold)
    assert r.n_comparisons == 2
    assert r.completeness_ppm == 1_000_000
    assert r.quality_ppm == 500_000


def test_orientation_and_duplicate_gold_normalized(spark):
    blocks = [(1, "a"), (2, "a")]
    gold = [(2, 1), (1, 2)]  # same pair twice, both orientations
    r = _q(spark, blocks, gold)
    assert r.completeness_ppm == 1_000_000


def test_no_gold_and_singleton_blocks(spark):
    # singleton blocks generate zero comparisons -> quality NULL
    blocks = [(1, "a"), (2, "b")]
    r = _q(spark, blocks, [])
    assert r.n_comparisons == 0
    assert r.reduction_ratio_ppm == 1_000_000
    assert r.completeness_ppm is None
    assert r.quality_ppm is None
