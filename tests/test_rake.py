"""RAKE keyphrase extraction (functions/textstats.py:rake_keyphrases):
hand-computed deg/freq scoring, phrase segmentation at stopword
boundaries, duplicate-candidate collapse, top-k ranking determinism.
Cross-engine bit-parity is pinned by the rake_keyphrases DuckDB oracle
(tests/test_oracle_crosscheck.py)."""

import pytest

from nlp_series_relation_extraction_spark.functions.textstats import (
    rake_keyphrases,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _collect(df):
    return [
        (r.doc_id, r.phrase, r.n_words, r.score_ppm, r.rank)
        for r in df.orderBy("doc_id", "rank").collect()
    ]


class TestRake:
    def test_hand_computed_scores(self, spark):
        # doc: "deep graph learning of deep graph" with stopword 'of'
        # candidates: "deep graph learning" (len 3), "deep graph" (2)
        # freq: deep 2, graph 2, learning 1
        # deg:  deep 3+2=5, graph 5, learning 3
        # wscore: deep 2.5e6, graph 2.5e6, learning 3e6
        # phrase scores: "deep graph learning" = 8e6; "deep graph" = 5e6
        out = _collect(
            rake_keyphrases(
                _docs(spark, [(1, "deep graph learning of deep graph")]),
                k=5,
            )
        )
        assert out == [
            (1, "deep graph learning", 3, 8_000_000, 1),
            (1, "deep graph", 2, 5_000_000, 2),
        ]

    def test_duplicate_phrases_collapse(self, spark):
        # "x of x of x": three identical 1-word candidates -> ONE row
        out = _collect(
            rake_keyphrases(_docs(spark, [(1, "x of x of x")]), k=5)
        )
        # freq(x)=3, deg(x)=3 -> wscore 1e6; single candidate 'x'
        assert out == [(1, "x", 1, 1_000_000, 1)]

    def test_stopword_only_doc_yields_nothing(self, spark):
        out = _collect(
            rake_keyphrases(_docs(spark, [(1, "the of and a")]), k=3)
        )
        assert out == []

    def test_leading_trailing_stopwords_trimmed(self, spark):
        out = _collect(
            rake_keyphrases(_docs(spark, [(1, "the spark engine is")]), k=3)
        )
        assert [o[1] for o in out] == ["spark engine"]

    def test_top_k_and_tie_order(self, spark):
        # two disjoint 1-word candidates with equal scores tie; phrase
        # asc breaks it
        out = _collect(
            rake_keyphrases(_docs(spark, [(1, "zz of aa")]), k=1)
        )
        assert out == [(1, "aa", 1, 1_000_000, 1)]

    def test_case_folded(self, spark):
        out = _collect(
            rake_keyphrases(_docs(spark, [(1, "Spark THE Engine")]), k=3)
        )
        assert [o[1] for o in out] == ["engine", "spark"]

    def test_partitioning_invariant(self, spark):
        rows = [
            (i, "alpha beta of gamma delta and alpha beta") for i in range(20)
        ]
        df = _docs(spark, rows)
        a = _collect(rake_keyphrases(df.repartition(7), k=2))
        b = _collect(rake_keyphrases(df.coalesce(1), k=2))
        assert a == b and len(a) == 40

    def test_bad_k_rejected(self, spark):
        with pytest.raises(ValueError, match="k must be"):
            rake_keyphrases(_docs(spark, [(1, "a b")]), k=0)
