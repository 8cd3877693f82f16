"""timex_normalize / extract_quantities (operators/timex.py): surface
forms, normalization arithmetic, scope contracts."""

from nlp_series_relation_extraction_spark.operators.timex import (
    extract_quantities,
    timex_normalize,
)

T = "doc_id long, text string"


def _dates(spark, text):
    rows = timex_normalize(
        spark.createDataFrame([(1, text)], T)
    ).collect()
    return [(r.form, r.raw, r.norm_date) for r in rows]


def test_iso_form(spark):
    assert _dates(spark, "released on 2024-03-05, patched 2024-12-31") == [
        ("iso", "2024-03-05", "2024-03-05"),
        ("iso", "2024-12-31", "2024-12-31"),
    ]


def test_month_name_forms(spark):
    got = set(_dates(spark, "March 5, 2024 then 5 March 2024"))
    assert ("mdy", "march 5, 2024", "2024-03-05") in got
    assert ("dmy", "5 march 2024", "2024-03-05") in got


def test_abbrev_ordinal_and_of(spark):
    got = set(
        _dates(spark, "due Sep 3rd 2021; signed the 1st of january 1999")
    )
    assert ("mdy", "sep 3rd 2021", "2021-09-03") in got
    assert ("dmy", "1st of january 1999", "1999-01-01") in got


def test_implausible_dates_dropped(spark):
    assert _dates(spark, "v2 shipped 2024-13-40 and on month 0000-00-00") == []


def test_duplicates_kept_per_occurrence(spark):
    got = _dates(spark, "2020-01-02 and again 2020-01-02")
    assert len(got) == 2


def _quant(spark, text):
    rows = extract_quantities(
        spark.createDataFrame([(1, text)], T)
    ).collect()
    return {(r.currency, r.unit, r.value_micro) for r in rows}


def test_currency_scale(spark):
    got = _quant(spark, "raised $5.2 million for the launch")
    assert ("$", None, 5_200_000_000_000) in got


def test_unit_and_thousands_separator(spark):
    got = _quant(spark, "a 3,200 km route at 4.5ghz and 12% grade")
    assert (None, "km", 3_200_000_000) in got
    assert (None, "ghz", 4_500_000) in got
    assert (None, "%", 12_000_000) in got


def test_bare_numbers_dropped(spark):
    assert _quant(spark, "see issue 1234 from 2019") == set()
