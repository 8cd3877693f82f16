"""k_anonymity_report (functions/curation.py): bucket arithmetic and
risk flags."""

import pytest

from nlp_series_relation_extraction_spark.functions.curation import (
    k_anonymity_report,
)

T = "zip string, age int, payload string"


def test_bucketing_and_risk(spark):
    rows = (
        [("94110", 30, "a")]                 # singleton
        + [("94110", 40, "b")] * 3           # 2-4
        + [("10001", 25, "c")] * 7           # 5-19
        + [("60601", 50, "d")] * 25          # 20+
    )
    out = {
        r.k_bucket: r
        for r in k_anonymity_report(
            spark.createDataFrame(rows, T), ["zip", "age"], k_threshold=5
        ).collect()
    }
    assert out["1"].n_groups == 1 and out["1"].n_rows == 1
    assert out["2-4"].n_rows == 3 and out["2-4"].at_risk
    assert out["5-19"].n_rows == 7 and not out["5-19"].at_risk
    assert out["20+"].n_rows == 25 and not out["20+"].at_risk
    total = 36
    assert out["1"].rows_share_ppm == 1_000_000 // total
    assert sum(r.n_rows for r in out.values()) == total


def test_higher_threshold_flags_more(spark):
    rows = [("z", 1, "x")] * 7
    out = k_anonymity_report(
        spark.createDataFrame(rows, T), ["zip"], k_threshold=10
    ).collect()
    assert out[0].k_bucket == "5-19" and out[0].at_risk


def test_guards(spark):
    df = spark.createDataFrame([("z", 1, "x")], T)
    with pytest.raises(ValueError, match="qi_cols"):
        k_anonymity_report(df, [])
    with pytest.raises(ValueError, match="k_threshold"):
        k_anonymity_report(df, ["zip"], k_threshold=1)
