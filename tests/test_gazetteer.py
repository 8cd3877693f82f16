"""gazetteer_match (operators/gazetteer.py): rarest-token anchoring,
span verification, maximal-munch dedup — the no-broadcast dictionary
matcher."""

from nlp_series_relation_extraction_spark.operators.gazetteer import (
    gazetteer_match,
    prepare_gazetteer,
)

TD = "doc_id long, text string"
TG = "entity_id long, name string"


def _match(spark, docs, gaz):
    return sorted(
        (r.doc_id, r.start_tok, r.end_tok, r.entity_id)
        for r in gazetteer_match(
            spark.createDataFrame(docs, TD), spark.createDataFrame(gaz, TG)
        ).collect()
    )


def test_single_and_multi_token_matches(spark):
    docs = [(1, "the new york times reported it")]
    gaz = [(10, "new york"), (11, "new york times"), (12, "reported")]
    got = _match(spark, docs, gaz)
    # "new york" (1..2) is contained in "new york times" (1..3): dropped
    assert got == [(1, 1, 3, 11), (1, 4, 4, 12)]


def test_rarest_token_is_anchor(spark):
    docs = [(1, "the the the zebra the"), (2, "the crossing")]
    gaz = [(7, "the zebra")]
    anchors = prepare_gazetteer(
        spark.createDataFrame(docs, TD), spark.createDataFrame(gaz, TG)
    ).collect()
    assert anchors[0].anchor == "zebra" and anchors[0].anchor_offset == 1
    assert _match(spark, docs, gaz) == [(1, 2, 3, 7)]


def test_absent_token_phrase_never_matches(spark):
    docs = [(1, "alpha beta gamma")]
    gaz = [(1, "beta unicorn"), (2, "beta")]
    assert _match(spark, docs, gaz) == [(1, 1, 1, 2)]


def test_repeated_mentions_all_found(spark):
    docs = [(1, "acme corp bought acme corp")]
    gaz = [(5, "acme corp")]
    assert _match(spark, docs, gaz) == [(1, 0, 1, 5), (1, 3, 4, 5)]


def test_equal_spans_from_distinct_entries_both_kept(spark):
    docs = [(1, "paris is lovely")]
    gaz = [(100, "paris"), (200, "paris")]
    assert _match(spark, docs, gaz) == [(1, 0, 0, 100), (1, 0, 0, 200)]


def test_partial_overlap_not_contained_both_kept(spark):
    # "york times co" overlaps "new york" but neither contains the other
    docs = [(1, "new york times co said")]
    gaz = [(1, "new york"), (2, "york times co")]
    assert _match(spark, docs, gaz) == [(1, 0, 1, 1), (1, 1, 3, 2)]


def test_empty_name_and_empty_text(spark):
    docs = [(1, ""), (2, None), (3, "x y")]
    gaz = [(1, ""), (2, "x y")]
    assert _match(spark, docs, gaz) == [(3, 0, 1, 2)]
