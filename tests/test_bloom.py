"""Bloom semi-join pruning (functions/bloom.py): no false negatives,
exact semi-join equivalence, fp-rate sanity, parameter guards."""

import pytest

from nlp_series_relation_extraction_spark.functions.bloom import (
    bloom_might_contain,
    bloom_semi_join,
    build_bloom,
)

TB = "k long, payload string"
TS = "k long"


def test_no_false_negatives_and_exact_result(spark):
    big = spark.createDataFrame(
        [(i, f"row{i}") for i in range(500)], TB
    )
    small = spark.createDataFrame([(i,) for i in range(0, 500, 7)], TS)
    got = sorted(
        r.k for r in bloom_semi_join(big, small, "k", "k").collect()
    )
    assert got == list(range(0, 500, 7))


def test_membership_expr_accepts_all_members(spark):
    small = spark.createDataFrame([(i,) for i in range(100)], TS)
    words = build_bloom(small, "k", m_bits=4096, k=4)
    passed = (
        small.where(bloom_might_contain("k", words, 4096, 4)).count()
    )
    assert passed == 100


def test_false_positive_rate_reasonable(spark):
    members = spark.createDataFrame([(i,) for i in range(200)], TS)
    words = build_bloom(members, "k", m_bits=8192, k=4)
    probes = spark.createDataFrame(
        [(i,) for i in range(10_000, 20_000)], TS
    )
    fp = probes.where(bloom_might_contain("k", words, 8192, 4)).count()
    # theory: (1 - e^{-4*200/8192})^4 ~ 7.6e-5 -> expect ~1 of 10k;
    # allow generous slack
    assert fp <= 30


def test_bit63_round_trips(spark):
    # hunt keys whose probes hit bit 63 of a word (sign-bit shifts)
    keys = spark.createDataFrame([(i,) for i in range(2000)], TS)
    words = build_bloom(keys, "k", m_bits=256, k=2)  # dense filter
    assert any(w < 0 for w in words)  # sign bit set somewhere
    assert keys.where(bloom_might_contain("k", words, 256, 2)).count() == 2000


def test_param_guards(spark):
    small = spark.createDataFrame([(1,)], TS)
    with pytest.raises(ValueError, match="m_bits"):
        build_bloom(small, "k", m_bits=100)
    with pytest.raises(ValueError, match="k must"):
        build_bloom(small, "k", k=0)
