"""generation_ngram_eval (evaluation/metrics.py): clipped n-gram
precision arithmetic — clipping, perfect match, empty contracts."""

from nlp_series_relation_extraction_spark.evaluation.metrics import (
    generation_ngram_eval,
)

T = "pair_id long, candidate string, reference string"


def _eval(spark, rows, **kw):
    return {
        r.n: r
        for r in generation_ngram_eval(
            spark.createDataFrame(rows, T), **kw
        ).collect()
    }


def test_perfect_match_all_precisions_one(spark):
    out = _eval(spark, [(1, "a b c d", "a b c d")])
    for n in range(1, 5):
        assert out[n].precision_ppm == 1_000_000
    assert out[4].n_total == 1  # one 4-gram in a 4-token text
    assert out[1].len_ratio_ppm == 1_000_000


def test_clipping_kills_repeat_exploit(spark):
    # the classic: candidate "the the the the" vs ref with two "the"
    out = _eval(spark, [(1, "the the the the", "the cat the mat")], max_n=1)
    r = out[1]
    assert r.n_total == 4 and r.n_matched == 2
    assert r.precision_ppm == 500_000


def test_disjoint_texts_zero_precision(spark):
    out = _eval(spark, [(1, "x y z", "p q r")], max_n=2)
    assert out[1].n_matched == 0 and out[2].n_matched == 0
    assert out[1].precision_ppm == 0


def test_corpus_sums_over_pairs(spark):
    rows = [(1, "a b", "a b"), (2, "a b", "c d")]
    out = _eval(spark, rows, max_n=2)
    assert out[1].n_matched == 2 and out[1].n_total == 4
    assert out[2].n_matched == 1 and out[2].n_total == 2
    assert out[1].precision_ppm == 500_000


def test_matches_do_not_cross_pairs(spark):
    # candidate grams of pair 1 must not match reference grams of pair 2
    rows = [(1, "q q", "z z"), (2, "z z", "q q")]
    out = _eval(spark, rows, max_n=1)
    assert out[1].n_matched == 0


def test_short_texts_emit_no_higher_grams(spark):
    out = _eval(spark, [(1, "a b c", "a b c")], max_n=4)
    assert out[4].n_total == 0 and out[4].precision_ppm == 0


def test_bad_max_n_raises(spark):
    import pytest

    with pytest.raises(ValueError, match="max_n"):
        generation_ngram_eval(
            spark.createDataFrame([(1, "a", "a")], T), max_n=0
        )
