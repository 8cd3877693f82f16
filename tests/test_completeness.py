"""capture_recapture_completeness (evaluation/metrics.py): Chapman
estimator arithmetic, union/overlap accounting, dedup of runs."""

from nlp_series_relation_extraction_spark.evaluation.metrics import (
    capture_recapture_completeness,
)

T = "subj_entity_id long, predicate string, obj_entity_id long"


def test_chapman_exact_small_case(spark):
    # truth = facts 1..6; run A sees {1,2,3,4}, run B sees {3,4,5}
    a = spark.createDataFrame([(i, "p", 0) for i in [1, 2, 3, 4]], T)
    b = spark.createDataFrame([(i, "p", 0) for i in [3, 4, 5]], T)
    r = capture_recapture_completeness(a, b).collect()[0]
    assert (r.n_a, r.n_b, r.n_both, r.n_union) == (4, 3, 2, 5)
    # Chapman: (5*4) div 3 - 1 = 5
    assert r.est_total == 5
    assert r.est_missing == 0
    assert r.coverage_union_ppm == 1_000_000


def test_duplicate_extractions_count_once(spark):
    a = spark.createDataFrame([(1, "p", 0), (1, "p", 0), (2, "p", 0)], T)
    b = spark.createDataFrame([(2, "p", 0), (2, "p", 0)], T)
    r = capture_recapture_completeness(a, b).collect()[0]
    assert (r.n_a, r.n_b, r.n_both, r.n_union) == (2, 1, 1, 2)


def test_disjoint_runs_estimate_large_population(spark):
    a = spark.createDataFrame([(i, "p", 0) for i in range(5)], T)
    b = spark.createDataFrame([(i, "p", 0) for i in range(5, 9)], T)
    r = capture_recapture_completeness(a, b).collect()[0]
    assert r.n_both == 0
    # Chapman with zero overlap: (6*5) div 1 - 1 = 29 >> union of 9
    assert r.est_total == 29 and r.est_missing == 20


def test_grouped_per_predicate(spark):
    a = spark.createDataFrame(
        [(1, "p", 0), (2, "p", 0), (1, "q", 0)], T
    )
    b = spark.createDataFrame([(1, "p", 0), (9, "q", 0)], T)
    out = {
        r.predicate: r
        for r in capture_recapture_completeness(a, b).collect()
    }
    assert out["p"].n_both == 1 and out["p"].n_union == 2
    assert out["q"].n_both == 0 and out["q"].n_union == 2


def test_estimator_recovers_planted_population(spark):
    # 400 true facts; two INDEPENDENT md5-keyed Bernoulli captures
    # (modular patterns won't do — two residue rules share i mod k and
    # correlate, which is exactly the bias the estimator assumes away)
    import hashlib

    def keep(i, salt, ppm):
        h = hashlib.md5(f"{i}|{salt}".encode()).hexdigest()
        return int(h[:7], 16) * 1_000_000 // 16**7 < ppm

    truth = [(i, "p", i * 7) for i in range(400)]
    a = spark.createDataFrame(
        [t for t in truth if keep(t[0], "A", 700_000)], T
    )
    b = spark.createDataFrame(
        [t for t in truth if keep(t[0], "B", 600_000)], T
    )
    r = capture_recapture_completeness(a, b).collect()[0]
    assert abs(r.est_total - 400) <= 40  # within 10% of planted truth
