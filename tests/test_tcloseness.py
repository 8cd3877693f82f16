"""t_closeness_report (functions/curation.py): exact integer TVD per
QI group vs the global sensitive distribution, banding, risk flags."""

import pytest

from nlp_series_relation_extraction_spark.functions.curation import (
    t_closeness_report,
)

T = "zip string, disease string"


def _report(spark, rows, t=200_000):
    return {
        r.t_bucket: r
        for r in t_closeness_report(
            spark.createDataFrame(rows, T), ["zip"], "disease",
            t_threshold_ppm=t,
        ).collect()
    }


def test_hand_computed_tvd(spark):
    # global: flu 6, cold 2  (N=8; freqs 0.75 / 0.25)
    # group A (4 rows): flu 3, cold 1 -> freqs identical -> tvd 0
    # group B (4 rows): flu 3, cold 1 ... make B skewed instead:
    rows = (
        [("a", "flu")] * 3 + [("a", "cold")]
        + [("b", "flu")] * 3 + [("b", "cold")]
    )
    out = _report(spark, rows)
    assert list(out) == ["0-10%"]
    r = out["0-10%"]
    assert r.n_groups == 2 and r.n_rows == 8
    assert r.n_groups_at_risk == 0 and r.rows_at_risk == 0
    assert r.rows_share_ppm == 1_000_000


def test_skewed_group_lands_in_high_band(spark):
    # global: flu 5, cold 5 (50/50). group a: 4 flu, 1 cold ->
    # tvd = 1/2 * (|0.8-0.5| + |0.2-0.5|) = 0.3 -> band '20-35%'
    # group b: 1 flu, 4 cold -> symmetric, same band
    rows = (
        [("a", "flu")] * 4 + [("a", "cold")]
        + [("b", "flu")] + [("b", "cold")] * 4
    )
    out = _report(spark, rows)
    assert list(out) == ["20-35%"]
    r = out["20-35%"]
    assert r.n_groups == 2 and r.n_rows == 10
    # exact: tvd_ppm = 300000 > 200000 -> both at risk
    assert r.n_groups_at_risk == 2 and r.rows_at_risk == 10


def test_absent_value_term(spark):
    # global: flu 5, cold 5. group a holds ONLY flu (5 rows):
    # tvd = 1/2 * (|1.0-0.5| + |0.0-0.5|) = 0.5 -> '35%+', at risk
    rows = [("a", "flu")] * 5 + [("b", "cold")] * 5
    out = _report(spark, rows)
    assert list(out) == ["35%+"]
    assert out["35%+"].n_groups == 2
    assert out["35%+"].n_groups_at_risk == 2


def test_threshold_is_exact_boundary(spark):
    # groups from test_skewed: tvd_ppm exactly 300000.  threshold
    # 300000 -> NOT at risk (strict >); 299999 -> at risk.
    rows = (
        [("a", "flu")] * 4 + [("a", "cold")]
        + [("b", "flu")] + [("b", "cold")] * 4
    )
    at_300k = _report(spark, rows, t=300_000)["20-35%"]
    assert at_300k.n_groups_at_risk == 0
    at_299k = _report(spark, rows, t=299_999)["20-35%"]
    assert at_299k.n_groups_at_risk == 2


def test_validation(spark):
    df = spark.createDataFrame([("z", "x")], T)
    with pytest.raises(ValueError, match="qi_cols"):
        t_closeness_report(df, [], "disease")
    with pytest.raises(ValueError, match="t_threshold_ppm"):
        t_closeness_report(df, ["zip"], "disease", t_threshold_ppm=0)
    with pytest.raises(ValueError, match="t_threshold_ppm"):
        t_closeness_report(
            df, ["zip"], "disease", t_threshold_ppm=1_000_000
        )
