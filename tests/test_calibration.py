"""calibration_report (evaluation/metrics.py): reliability bins + ECE
decomposition — hand-computed tables, edge bins, perfect calibration."""

import pytest

from nlp_series_relation_extraction_spark.evaluation.metrics import (
    calibration_report,
)

S = "score_ppm long, label int"


def _rows(spark, data, n_bins=10):
    out = calibration_report(
        spark.createDataFrame(data, S), n_bins=n_bins
    ).collect()
    return {r.bin: r for r in out}


def test_hand_computed_two_bins(spark):
    # bin 0: scores 100k/300k labels 0,1 -> mean 200k, frac 500k, gap 300k
    # bin 1: scores 900k/900k labels 1,1 -> mean 900k, frac 1e6, gap 100k
    data = [(100_000, 0), (300_000, 1), (900_000, 1), (900_000, 1)]
    got = _rows(spark, data, n_bins=2)
    b0, b1 = got[0], got[1]
    assert (b0.n, b0.n_pos, b0.mean_score_ppm, b0.frac_pos_ppm) == (
        2, 1, 200_000, 500_000,
    )
    assert b0.gap_ppm == 300_000
    assert b0.ece_contrib_ppm == 2 * 300_000 // 4
    assert (b1.n, b1.mean_score_ppm, b1.frac_pos_ppm, b1.gap_ppm) == (
        2, 900_000, 1_000_000, 100_000,
    )
    assert b1.ece_contrib_ppm == 2 * 100_000 // 4


def test_score_one_million_lands_in_last_bin(spark):
    got = _rows(spark, [(1_000_000, 1), (999_999, 1)], n_bins=10)
    assert list(got) == [9] and got[9].n == 2


def test_perfectly_calibrated_scorer_has_zero_gap(spark):
    # bin means equal empirical frequencies exactly
    data = []
    for _ in range(3):
        data += [(250_000, 1)] + [(250_000, 0)] * 3   # frac 250k
        data += [(750_000, 1)] * 3 + [(750_000, 0)]   # frac 750k
    got = _rows(spark, data, n_bins=4)
    assert all(r.gap_ppm == 0 and r.ece_contrib_ppm == 0 for r in got.values())


def test_empty_bins_absent_and_truncation(spark):
    # single example: mean=333333, frac=1e6, gap=666667; only bin 3 exists
    got = _rows(spark, [(333_333, 1)], n_bins=10)
    assert list(got) == [3]
    assert got[3].gap_ppm == 1_000_000 - 333_333
    assert got[3].ece_contrib_ppm == 1_000_000 - 333_333


def test_n_bins_validation(spark):
    with pytest.raises(ValueError):
        calibration_report(spark.createDataFrame([(1, 1)], S), n_bins=0)
