"""Distant supervision (operators/distant.py): weak labels from projecting
a seed KB's surface pairs onto raw text — Mintz 2009's bootstrap, here as a
token-blocked candidate join instead of a doc x surface cross product.

Semantics under test: containment anchored on the surface's first token
(the row must carry that token as a whitespace token AND contain the full
surface as a substring), first-occurrence 1-based positions (instr), and
self-referential KB rows rejected."""

from nlp_series_relation_extraction_spark.operators.distant import (
    distant_supervision,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _kb(spark, rows):
    return spark.createDataFrame(
        rows, "subj_text string, predicate string, obj_text string"
    )


def test_basic_projection_and_positions(spark):
    docs = _docs(
        spark,
        [
            (1, "alice works at acme corp since 2001"),
            (2, "bob met alice at acme corp"),
            (3, "alice likes tea"),  # subj only: no label
            (4, "nothing relevant here"),
        ],
    )
    kb = _kb(spark, [("alice", "employed_by", "acme corp")])
    got = {
        (r.doc_id, r.subj_text, r.predicate, r.obj_text, r.subj_pos, r.obj_pos)
        for r in distant_supervision(docs, kb).collect()
    }
    assert got == {
        (1, "alice", "employed_by", "acme corp", 1, 16),
        (2, "alice", "employed_by", "acme corp", 9, 18),
    }


def test_first_occurrence_is_min_position(spark):
    docs = _docs(spark, [(1, "x y x z y")])
    kb = _kb(spark, [("x", "near", "y")])
    row = distant_supervision(docs, kb).collect()[0]
    # both surfaces repeat; positions are the FIRST occurrence
    assert (row.subj_pos, row.obj_pos) == (1, 3)


def test_self_referential_kb_rows_rejected(spark):
    docs = _docs(spark, [(1, "a a b")])
    kb = _kb(spark, [("a", "same_as", "a"), ("a", "before", "b")])
    got = {(r.subj_text, r.predicate, r.obj_text) for r in
           distant_supervision(docs, kb).collect()}
    assert got == {("a", "before", "b")}


def test_token_anchor_gates_substring_hits(spark):
    # "cat" occurs only inside "catalog": no whitespace token "cat",
    # so the candidate join never forms and no label is emitted —
    # the documented token-anchored-containment contract.
    docs = _docs(spark, [(1, "the catalog lists dog toys")])
    kb = _kb(spark, [("cat", "chases", "dog")])
    assert distant_supervision(docs, kb).count() == 0


def test_multiword_surface_blocks_on_first_token(spark):
    # surface "acme corp": doc tokens include "acme" so the block
    # fires, and instr confirms the full phrase
    docs = _docs(
        spark,
        [
            (1, "acme corp hired dana"),
            (2, "acme shipped parts to dana"),  # token hit, phrase miss
        ],
    )
    kb = _kb(spark, [("acme corp", "hired", "dana")])
    got = {r.doc_id for r in distant_supervision(docs, kb).collect()}
    assert got == {1}


def test_one_label_per_doc_triple_even_with_repeats(spark):
    # repeated tokens must not duplicate the (doc, triple) label
    docs = _docs(spark, [(1, "a b a b a b")])
    kb = _kb(spark, [("a", "next_to", "b")])
    out = distant_supervision(docs, kb).collect()
    assert len(out) == 1
    assert (out[0].subj_pos, out[0].obj_pos) == (1, 3)


def test_custom_id_and_text_columns(spark):
    docs = spark.createDataFrame(
        [("c1", 0, "u v"), ("c1", 1, "v only")],
        "conv_id string, turn_idx int, utterance string",
    )
    kb = _kb(spark, [("u", "rel", "v")])
    got = {
        (r.conv_id, r.turn_idx)
        for r in distant_supervision(
            docs, kb, id_cols=("conv_id", "turn_idx"), text_col="utterance"
        ).collect()
    }
    assert got == {("c1", 0)}
