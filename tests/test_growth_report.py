"""kg_growth_report (functions/temporal.py): per-(predicate, bucket)
new-subject share — hand-computed growth curves."""

from nlp_series_relation_extraction_spark.functions.temporal import (
    kg_growth_report,
)

T = "subj string, pred string, bucket string"


def _rows(spark, data):
    out = kg_growth_report(spark.createDataFrame(data, T)).collect()
    return {(r.pred, r.bucket): r for r in out}


def test_hand_computed_growth(spark):
    data = [
        # month 1: subjects a, b both new
        ("a", "p", "2026-01"), ("b", "p", "2026-01"),
        # month 2: a returns, c new
        ("a", "p", "2026-02"), ("c", "p", "2026-02"),
        # month 3: all returning
        ("a", "p", "2026-03"), ("b", "p", "2026-03"), ("c", "p", "2026-03"),
    ]
    got = _rows(spark, data)
    m1, m2, m3 = got[("p", "2026-01")], got[("p", "2026-02")], got[("p", "2026-03")]
    assert (m1.n_subjects, m1.n_new_subjects, m1.new_subject_share_ppm) == (
        2, 2, 1_000_000,
    )
    assert (m2.n_subjects, m2.n_new_subjects, m2.new_subject_share_ppm) == (
        2, 1, 500_000,
    )
    assert (m3.n_subjects, m3.n_new_subjects, m3.new_subject_share_ppm) == (
        3, 0, 0,
    )


def test_fact_multiplicity_counts_facts_not_subjects(spark):
    data = [("a", "p", "2026-01")] * 5 + [("b", "p", "2026-01")]
    r = _rows(spark, data)[("p", "2026-01")]
    assert (r.n_facts, r.n_subjects, r.n_new_subjects) == (6, 2, 2)


def test_first_seen_is_per_predicate(spark):
    # subject a is old news for p but brand new for q in month 2
    data = [
        ("a", "p", "2026-01"),
        ("a", "p", "2026-02"), ("a", "q", "2026-02"),
    ]
    got = _rows(spark, data)
    assert got[("p", "2026-02")].n_new_subjects == 0
    assert got[("q", "2026-02")].n_new_subjects == 1


def test_id_space_break_reads_as_full_novelty(spark):
    # the failure mode the report exists to catch: month 2 renames every
    # subject -> share snaps to 1e6
    data = [("a", "p", "2026-01"), ("b", "p", "2026-01"),
            ("a2", "p", "2026-02"), ("b2", "p", "2026-02")]
    assert _rows(spark, data)[("p", "2026-02")].new_subject_share_ppm \
        == 1_000_000
