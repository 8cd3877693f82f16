"""l_diversity_report (functions/curation.py): distinct-l bucketing,
homogeneity risk flags, ppm arithmetic."""

import pytest

from nlp_series_relation_extraction_spark.functions.curation import (
    l_diversity_report,
)

T = "zip string, age int, disease string"


def test_bucketing_and_risk(spark):
    rows = (
        # group A: 4 rows, ONE distinct disease -> homogeneity bucket '1'
        [("94110", 30, "flu")] * 4
        # group B: 3 rows, 2 distinct -> bucket '2'
        + [("94110", 40, "flu")] * 2
        + [("94110", 40, "cold")]
        # group C: 4 rows, 3 distinct -> bucket '3-4'
        + [("10001", 25, "flu"), ("10001", 25, "cold"),
           ("10001", 25, "covid"), ("10001", 25, "covid")]
        # group D: 5 rows, 5 distinct -> bucket '5+'
        + [("60601", 50, d) for d in ("a", "b", "c", "d", "e")]
    )
    out = {
        r.l_bucket: r
        for r in l_diversity_report(
            spark.createDataFrame(rows, T), ["zip", "age"], "disease",
            l_threshold=3,
        ).collect()
    }
    assert out["1"].n_groups == 1 and out["1"].n_rows == 4
    assert out["2"].n_groups == 1 and out["2"].n_rows == 3
    assert out["3-4"].n_groups == 1 and out["3-4"].n_rows == 4
    assert out["5+"].n_groups == 1 and out["5+"].n_rows == 5
    assert out["1"].at_risk and out["2"].at_risk
    assert not out["3-4"].at_risk and not out["5+"].at_risk
    total = 16
    for b, r in out.items():
        assert r.rows_share_ppm == r.n_rows * 1_000_000 // total, b


def test_threshold_moves_risk_boundary(spark):
    rows = [("z", 1, "x"), ("z", 1, "y"), ("z", 1, "zz")]  # l = 3
    r5 = l_diversity_report(
        spark.createDataFrame(rows, T), ["zip"], "disease", l_threshold=5
    ).collect()[0]
    assert r5.l_bucket == "3-4" and r5.at_risk  # lo=3 < 5
    r3 = l_diversity_report(
        spark.createDataFrame(rows, T), ["zip"], "disease", l_threshold=3
    ).collect()[0]
    assert not r3.at_risk  # lo=3 >= 3


def test_duplicate_sensitive_values_collapse(spark):
    # 100 rows, all the same disease: k-anonymous at k=100, l = 1
    rows = [("z", 1, "flu")] * 100
    out = l_diversity_report(
        spark.createDataFrame(rows, T), ["zip", "age"], "disease"
    ).collect()
    assert len(out) == 1
    assert out[0].l_bucket == "1" and out[0].n_rows == 100
    assert out[0].at_risk and out[0].rows_share_ppm == 1_000_000


def test_validation(spark):
    df = spark.createDataFrame([("z", 1, "x")], T)
    with pytest.raises(ValueError, match="qi_cols"):
        l_diversity_report(df, [], "disease")
    with pytest.raises(ValueError, match="l_threshold"):
        l_diversity_report(df, ["zip"], "disease", l_threshold=1)
