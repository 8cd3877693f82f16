"""BM25 retrieval semantics over chunked corpora.

Pins the ranking behaviors that make BM25 BM25 — rare-term wins, tf
saturation, length normalization, stopword df-pruning — plus the scale
contract: the posting-table join against query terms must be broadcast
(the corpus side never shuffles for it)."""

import pyspark.sql.functions as F

from nlp_series_relation_extraction_spark.functions.retrieval import (
    bm25_topk,
    chunk_postings,
)


def _chunks(spark, rows):
    return spark.createDataFrame(
        [(i, 0, t) for i, t in enumerate(rows)],
        "doc_id long, chunk_idx int, chunk_text string",
    )


def _queries(spark, rows):
    return spark.createDataFrame(
        list(enumerate(rows)), "query_id long, query_text string"
    )


def test_source_chunk_ranks_first(spark):
    chunks = _chunks(
        spark,
        [
            "zebra quark flies over the fence",
            "the cat sat on the mat",
            "dogs bark at the moon",
            "quark physics is the strange topic",
        ],
    )
    out = bm25_topk(chunks, _queries(spark, ["zebra quark"]), k=2).collect()
    assert out[0].rank == 1 and out[0].doc_id == 0  # both rare terms
    assert out[1].doc_id == 3  # quark only


def test_stopword_pruned_above_df_ratio(spark):
    # 'the' occurs in 3/4 chunks (df ratio 0.75 > 0.5) -> pruned: a query
    # of only 'the' matches nothing.
    chunks = _chunks(
        spark,
        [
            "the zebra",
            "the cat",
            "the dog",
            "a mouse",
        ],
    )
    assert bm25_topk(chunks, _queries(spark, ["the"]), k=5).count() == 0
    # but a rare term still retrieves
    assert bm25_topk(chunks, _queries(spark, ["zebra"]), k=5).count() == 1


def test_tf_saturation(spark):
    # same length, tf 1 vs 2 vs 4: score grows, but the 2->4 gain is
    # smaller than the 1->2 gain (k1 saturation).
    chunks = _chunks(
        spark,
        [
            "quark pad pad pad pad pad pad pad",
            "quark quark pad pad pad pad pad pad",
            "quark quark quark quark pad pad pad pad",
            "other words entirely here now yes ok fine",
            "more unrelated filler words sit here",
            "and a final filler chunk lives here",
        ],
    )
    rows = {
        r.doc_id: r.score_milli
        for r in bm25_topk(chunks, _queries(spark, ["quark"]), k=4).collect()
    }
    assert rows[0] < rows[1] < rows[2]
    assert (rows[2] - rows[1]) < (rows[1] - rows[0])


def test_length_normalization(spark):
    # same tf=1; the shorter chunk outranks the longer one
    chunks = _chunks(
        spark,
        [
            "quark a b",
            "quark a b c d e f g h i j k l m n o p",
            "unrelated filler text",
            "still more filler text",
        ],
    )
    out = bm25_topk(chunks, _queries(spark, ["quark"]), k=2).collect()
    assert out[0].doc_id == 0 and out[1].doc_id == 1
    assert out[0].score_milli > out[1].score_milli


def test_posting_table(spark):
    post = chunk_postings(
        _chunks(spark, ["a b a", "b c"])
    ).collect()
    got = {(r.doc_id, r.term): (r.tf, r.dl) for r in post}
    assert got[(0, "a")] == (2, 3)
    assert got[(0, "b")] == (1, 3)
    assert got[(1, "c")] == (1, 2)


def test_query_join_is_broadcast(spark):
    chunks = _chunks(spark, ["quark beam", "beam line", "line noise"])
    plan = (
        bm25_topk(chunks, _queries(spark, ["quark line"]), k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the two small sides (query terms, idf table) broadcast; the posting
    # table must NOT be exchanged for those joins
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_empty_corpus_returns_empty(spark):
    empty = spark.createDataFrame(
        [], "doc_id long, chunk_idx int, chunk_text string"
    )
    out = bm25_topk(empty, _queries(spark, ["anything"]), k=5)
    assert out.count() == 0
    assert out.columns == [
        "query_id", "rank", "doc_id", "chunk_idx", "score_milli",
    ]


def test_all_null_text_returns_empty(spark):
    chunks = spark.createDataFrame(
        [(1, 0, None), (2, 0, None)],
        "doc_id long, chunk_idx int, chunk_text string",
    )
    assert bm25_topk(chunks, _queries(spark, ["anything"]), k=5).count() == 0
