"""dsir_weights (functions/curation.py): hashed-bigram importance
ratios — target-likeness ordering, short-doc contract, determinism."""

from nlp_series_relation_extraction_spark.functions.curation import (
    dsir_weights,
)

T = "doc_id long, text string, lang string"


def _weights(spark, rows, target_lang="en", **kw):
    docs = spark.createDataFrame(rows, T)
    tgt = docs.filter(docs.lang == target_lang)
    return {
        r.doc_id: r
        for r in dsir_weights(docs, tgt, **kw).collect()
    }


def test_target_like_docs_outscore_offdomain(spark):
    rows = [
        (1, "the cat sat on the mat", "en"),
        (2, "the cat sat on the rug", "xx"),   # shares target bigrams
        (3, "zq qz vv ww kk jj pp", "xx"),     # disjoint from target
    ]
    w = _weights(spark, rows)
    # target doc >= bigram-sharing doc > disjoint doc
    assert w[1].mean_ratio_ppm >= w[2].mean_ratio_ppm
    assert w[2].mean_ratio_ppm > w[3].mean_ratio_ppm
    # selected is exactly the threshold predicate (absolute values are
    # smoothing-dominated at toy scale; the sf0.01 driver query pins a
    # meaningful split)
    for r in w.values():
        assert r.selected == (r.mean_ratio_ppm >= 1_000_000)


def test_short_docs_emit_no_row(spark):
    rows = [
        (1, "alpha beta gamma", "en"),
        (2, "single", "xx"),
        (3, "", "xx"),
        (4, None, "xx"),
    ]
    w = _weights(spark, rows)
    assert set(w) == {1}


def test_event_count_is_bigram_count(spark):
    rows = [(1, "a b c d", "en"), (2, "a b c", "xx")]
    w = _weights(spark, rows)
    assert w[1].n_events == 3 and w[2].n_events == 2
    # mean is the truncating per-event mean
    assert w[2].mean_ratio_ppm == w[2].sum_ratio_ppm // 2


def test_partitioning_invariant(spark):
    rows = [
        (i, f"tok{i % 7} tok{(i + 1) % 7} tok{(i + 2) % 5} end",
         "en" if i % 3 == 0 else "xx")
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, T)
    tgt = docs.filter(docs.lang == "en")
    a = sorted(map(tuple, dsir_weights(docs, tgt).collect()))
    b = sorted(
        map(
            tuple,
            dsir_weights(docs.repartition(13), tgt.coalesce(1)).collect(),
        )
    )
    assert a == b


def test_bad_bucket_count_raises(spark):
    import pytest

    docs = spark.createDataFrame([(1, "a b", "en")], T)
    with pytest.raises(ValueError, match="n_buckets"):
        dsir_weights(docs, docs, n_buckets=1)
