"""Containment near-dup (functions/dedup.py:containment_pairs):
quote-detection semantics (containment high where jaccard is low),
orientation and tie rules, threshold and cap behavior.
dedup_containment carries the bit-exact DuckDB oracle
(tests/test_oracle_crosscheck.py)."""

import pytest

from nlp_series_relation_extraction_spark.functions.dedup import (
    containment_pairs,
    jaccard_pairs,
    word_shingles,
)


def _shingles(spark, rows, n=1):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return word_shingles(df, "doc_id", "text", n=n)


class TestContainmentPairs:
    def test_quote_detected_where_jaccard_misses(self, spark):
        # doc 2 is a 4-word quote inside doc 1's 20 distinct words:
        # containment = 1.0, jaccard = 4/20 = 0.2
        big = " ".join(f"w{i}" for i in range(20))
        rows = [(1, big), (2, "w3 w4 w5 w6")]
        sh = _shingles(spark, rows)
        got = containment_pairs(sh, threshold_ppm=900_000).collect()
        assert len(got) == 1
        r = got[0]
        assert (r.contained_id, r.container_id) == (2, 1)
        assert (r.inter, r.contained_sz, r.container_sz) == (4, 4, 20)
        assert r.containment_ppm == 1_000_000
        assert jaccard_pairs(sh, threshold_pct=30).collect() == []

    def test_orientation_tie_by_smaller_id(self, spark):
        rows = [(7, "a b c"), (3, "a b d")]
        got = containment_pairs(
            _shingles(spark, rows), threshold_ppm=500_000
        ).collect()
        assert len(got) == 1
        assert (got[0].contained_id, got[0].container_id) == (3, 7)
        # 2 shared of 3: floor(2e6/3)
        assert got[0].containment_ppm == 666_666

    def test_threshold_filters(self, spark):
        rows = [(1, "a b c d"), (2, "a x y z")]
        sh = _shingles(spark, rows)
        assert containment_pairs(sh, threshold_ppm=500_000).collect() == []
        low = containment_pairs(sh, threshold_ppm=250_000).collect()
        assert len(low) == 1 and low[0].containment_ppm == 250_000

    def test_max_df_cap_drops_hot_shingles_keeps_sizes(self, spark):
        # 'the' occurs in all 4 docs; with max_df=3 it can't generate
        # candidates, but sizes keep counting it (exact denominator)
        rows = [
            (1, "the alpha beta"),
            (2, "the alpha beta"),
            (3, "the gamma"),
            (4, "the delta"),
        ]
        got = containment_pairs(
            _shingles(spark, rows), threshold_ppm=600_000, max_df=3
        ).collect()
        assert len(got) == 1
        r = got[0]
        assert (r.contained_id, r.container_id) == (1, 2)
        # inter counts only alpha+beta (the capped 'the' is dropped from
        # candidates AND the intersection), denominator still 3
        assert (r.inter, r.contained_sz) == (2, 3)
        assert r.containment_ppm == 666_666

    def test_bad_threshold_rejected(self, spark):
        sh = _shingles(spark, [(1, "a b")])
        with pytest.raises(ValueError, match="threshold_ppm"):
            containment_pairs(sh, threshold_ppm=2_000_000)
