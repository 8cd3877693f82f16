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


def test_char_blocking_for_cjk_text(spark):
    # unsegmented Chinese: token blocking can never fire (the whole
    # utterance is one "token"); char blocking must
    docs = _docs(
        spark,
        [
            (1, "电影《凤缘山》由马磊丽主演"),
            (2, "马磊丽获得了最佳女主角"),  # obj only: no label
        ],
    )
    kb = _kb(spark, [("凤缘山", "主演", "马磊丽")])
    token_out = distant_supervision(docs, kb).count()
    assert token_out == 0  # the CJK failure mode, pinned
    got = {
        (r.doc_id, r.subj_pos, r.obj_pos)
        for r in distant_supervision(docs, kb, block="char").collect()
    }
    assert got == {(1, 4, 9)}  # 1-based char positions


def test_char_blocking_is_pure_containment(spark):
    # unlike token mode, char blocking is COMPLETE for containment:
    # the first char of a contained surface is always a char of the text
    docs = _docs(spark, [(1, "the catalog lists dog toys")])
    kb = _kb(spark, [("cat", "chases", "dog")])
    got = distant_supervision(docs, kb, block="char").collect()
    assert len(got) == 1  # "cat" inside "catalog" IS found in char mode
    assert got[0].subj_pos == 5


def test_unknown_block_mode_rejected(spark):
    import pytest as _pytest

    docs = _docs(spark, [(1, "a b")])
    kb = _kb(spark, [("a", "r", "b")])
    with _pytest.raises(ValueError, match="unknown block mode"):
        distant_supervision(docs, kb, block="bigram").collect()


class TestWeakSupervisionEndToEnd:
    """The 100-TB bootstrap loop: seed KB -> distant labels over the
    DuIE-style synthetic transcripts -> reference-format training set ->
    the distributed BIO trainer runs on it unchanged."""

    def _corpus_and_kb(self, spark, n=400):
        from pyspark.sql import functions as F

        from nlp_series_relation_extraction_spark.sources.synthetic import (
            gold_triples,
            synth_transcripts,
        )

        t_df = synth_transcripts(spark, n, seed=42).localCheckpoint(
            eager=True
        )
        gold = (
            gold_triples(spark, t_df)
            .select(
                "conv_id",
                "turn_idx",
                F.col("subject").alias("subj_text"),
                "predicate",
                F.element_at("object", "@value").alias("obj_text"),
            )
            # checkpoint BEFORE deriving kb: gold.join(kb-from-gold)
            # would otherwise be a self-join with conflicting lineage
            .localCheckpoint(eager=True)
        )
        # seed KB = the triples of every 3rd turn (the "existing KG"
        # covering part of the world), projected onto ALL turns
        kb = (
            gold.where(F.col("turn_idx") % 3 == 0)
            .select("subj_text", "predicate", "obj_text")
            .distinct()
            .localCheckpoint(eager=True)
        )
        return t_df, gold, kb

    def test_weak_labels_recall_kb_covered_gold(self, spark):
        from pyspark.sql import functions as F

        from nlp_series_relation_extraction_spark.operators.distant import (
            distant_supervision,
        )

        t_df, gold, kb = self._corpus_and_kb(spark)
        weak = distant_supervision(
            t_df, kb, id_cols=("conv_id", "turn_idx"),
            text_col="text", block="char",
        ).localCheckpoint(eager=True)
        trip = ["subj_text", "predicate", "obj_text"]
        # every gold triple whose triple is IN the KB must be re-found:
        # the planted text always contains both surfaces. Exception by
        # CONTRACT: self-referential triples (the 改编自 same-name-novel
        # template plants subject == object) — the operator rejects
        # those because the two roles would alias one mention
        covered = gold.join(kb, trip).where(
            F.col("subj_text") != F.col("obj_text")
        )
        missed = covered.join(
            weak.select("conv_id", "turn_idx", *trip),
            ["conv_id", "turn_idx", *trip],
            "left_anti",
        )
        assert missed.count() == 0
        n_weak = weak.count()
        tp = weak.join(gold, ["conv_id", "turn_idx", *trip]).count()
        assert n_weak > 0
        # distant supervision is NOISY by design (co-occurrence is not
        # assertion), but on planted data most co-occurrences are real
        assert tp / n_weak >= 0.5, f"precision {tp}/{n_weak}"

    def test_weak_training_set_trains_the_bio_head(self, spark):
        import json

        from nlp_series_relation_extraction_spark.operators.distant import (
            weak_training_set,
        )
        from nlp_series_relation_extraction_spark.operators.train import (
            train_bio_head,
        )

        t_df, _gold, kb = self._corpus_and_kb(spark, n=240)
        train = weak_training_set(
            t_df, kb, id_cols=("conv_id", "turn_idx"),
            text_col="text", block="char",
        ).localCheckpoint(eager=True)
        rows = train.collect()
        assert len(rows) > 0
        # reference JSONL shape: parseable spo_list with the exact keys
        spo = json.loads(rows[0].gold_json)[0]
        assert set(spo) == {
            "predicate", "subject", "subject_type", "object", "object_type",
        }
        assert "@value" in spo["object"]
        res = train_bio_head(train, epochs=3, lr=0.08)
        h = res["loss_history"]
        assert len(h) == 3 and h[-1] < h[0], f"no learning: {h}"

    def test_weak_training_set_gold_json_is_deterministic(self, spark):
        from nlp_series_relation_extraction_spark.operators.distant import (
            weak_training_set,
        )

        t_df, _gold, kb = self._corpus_and_kb(spark, n=120)
        a = weak_training_set(
            t_df, kb, id_cols=("conv_id", "turn_idx"),
            text_col="text", block="char",
        )
        b = weak_training_set(
            t_df.repartition(7), kb, id_cols=("conv_id", "turn_idx"),
            text_col="text", block="char",
        )
        ra = {(r.conv_id, r.turn_idx): r.gold_json for r in a.collect()}
        rb = {(r.conv_id, r.turn_idx): r.gold_json for r in b.collect()}
        assert ra == rb  # array_sort pins collect_list's wild order
