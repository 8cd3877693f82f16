"""mixture_weights (functions/curation.py): temperature arithmetic."""

import pytest

from nlp_series_relation_extraction_spark.functions.curation import (
    mixture_weights,
)

T = "source string, x int"


def _mix(spark, sizes, temperature="sqrt"):
    rows = [(s, i) for s, n in sizes.items() for i in range(n)]
    return {
        r.group: r
        for r in mixture_weights(
            spark.createDataFrame(rows, T), "source", temperature
        ).collect()
    }


def test_sqrt_rebalances_toward_small(spark):
    out = _mix(spark, {"big": 400, "small": 4})
    # raw shares: 990099 / 9900; sqrt weights: 20000 vs 2000 milli
    assert out["big"].weight_milli == 20_000
    assert out["small"].weight_milli == 2_000
    assert out["small"].sample_share_ppm > out["small"].raw_share_ppm
    assert out["big"].sample_share_ppm < out["big"].raw_share_ppm
    assert out["small"].boost_ppm > 1_000_000
    assert out["big"].boost_ppm < 1_000_000


def test_proportional_is_identity(spark):
    out = _mix(spark, {"a": 30, "b": 10}, temperature="proportional")
    for r in out.values():
        assert r.sample_share_ppm == r.raw_share_ppm


def test_uniform_equalizes(spark):
    out = _mix(spark, {"a": 99, "b": 1}, temperature="uniform")
    assert out["a"].sample_share_ppm == out["b"].sample_share_ppm


def test_bad_temperature(spark):
    df = spark.createDataFrame([("a", 1)], T)
    with pytest.raises(ValueError, match="temperature"):
        mixture_weights(df, "source", "cubed")
