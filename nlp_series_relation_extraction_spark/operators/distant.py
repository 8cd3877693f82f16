"""Distant supervision: weak relation labels from a seed KB.

The reference corpus is hand-labeled (`{text, spo_list}` JSONL); at
100-TB transcript scale nobody hand-labels — the standard bootstrap
(Mintz 2009, "Distant supervision for relation extraction without
labeled data") projects an existing triple store onto raw text: any
row whose text contains BOTH surface forms of a KB triple becomes a
weak positive for that triple's predicate. This module is that
projection, shaped for Spark:

* **No cross product.** A naive implementation checks every (row, KB
  surface) pair. Here the text explodes to its DISTINCT tokens once,
  the KB surface dictionary keys by its FIRST token, and candidates
  come from one token equi-join — a row only ever meets the surfaces
  whose first token it contains. The containment check
  (``instr > 0``) then runs on the candidate pairs only, JVM-side.
* **Skew bound.** The join key is the surface's first token; the
  dictionary side is deduped surfaces, so a stopword-leading surface
  contributes ONE dimension row however many KB triples share it, and
  AQE skew-split covers a pathological token on the corpus side.
* **Deterministic output.** Positions are first-occurrence ``instr``
  (1-based, same contract as DuckDB ``strpos``), so the whole label
  table is bit-stable cross-engine and the driver oracle hash-checks
  it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _first_occurrences(
    docs: DataFrame,
    surfaces: DataFrame,
    id_cols: tuple,
    text_col: str,
    block: str = "token",
) -> DataFrame:
    """(id_cols..., surface, pos): first 1-based position of each KB
    surface contained in each row's text, via the blocked candidate
    join described in the module docstring. ``surfaces`` must be a
    single-column DataFrame(surface), pre-deduped by the caller.

    ``block='token'`` keys on the surface's first whitespace token —
    right for space-delimited text. ``block='char'`` keys on the
    surface's FIRST CHARACTER against the text's distinct characters —
    the mode for CJK corpora like the reference's DuIE data
    (dataset/data_utils.py operates on unsegmented Chinese), where a
    whole utterance is one "token" and token blocking can never fire.
    Char keys are higher-fanout than token keys (a text has ~|text|
    distinct chars) but still corpus-linear, and CJK first-chars are
    high-cardinality, so the equi-join stays selective."""
    if block == "char":
        grams = F.expr(
            f"transform(sequence(1, char_length({text_col})),"
            f" i -> substring({text_col}, i, 1))"
        )
        toks = docs.select(
            *id_cols,
            text_col,
            F.explode(F.array_distinct(grams)).alias("tok"),
        )
        dim = surfaces.select(
            "surface",
            F.substring(F.col("surface"), 1, 1).alias("tok"),
        )
    elif block == "token":
        toks = docs.select(
            *id_cols,
            text_col,
            F.explode(
                F.array_distinct(F.split(F.col(text_col), " "))
            ).alias("tok"),
        )
        dim = surfaces.select(
            "surface",
            F.split(F.col("surface"), " ").getItem(0).alias("tok"),
        )
    else:
        raise ValueError(f"unknown block mode: {block!r}")
    return (
        toks.join(F.broadcast(dim), "tok")
        .withColumn("pos", F.instr(F.col(text_col), F.col("surface")))
        .where(F.col("pos") > 0)
        # a multi-word surface can block on its first token in several
        # of the row's token rows; one (row, surface) candidate survives
        .groupBy(*id_cols, "surface")
        .agg(F.min("pos").cast("int").alias("pos"))
    )


def distant_supervision(
    docs: DataFrame,
    kb: DataFrame,
    id_cols: tuple = ("doc_id",),
    text_col: str = "text",
    block: str = "token",
) -> DataFrame:
    """Project a seed KB onto a text corpus: one weak label per
    (row, KB triple) where the row's text contains both surface forms.

    ``docs``: (*id_cols, text_col, ...); ``kb``: (subj_text, predicate,
    obj_text). Returns (*id_cols, subj_text, predicate, obj_text,
    subj_pos, obj_pos) with first-occurrence 1-based positions.
    Self-referential KB rows (subj_text == obj_text) are rejected — the
    two roles would alias one mention, the same reason
    canonical_triples drops self-loops.

    Plan: one mention table (token-blocked candidate join, see
    :func:`_first_occurrences`) reused for BOTH roles, then two
    equi-joins keyed on (row id, surface). The KB rides broadcast as a
    dimension; the mention table is corpus-sized and shuffles once per
    role join on (id, surface) — uniform keys (hot surfaces fan out by
    their true mention count, which is the output size)."""
    id_cols = tuple(id_cols)
    kb = kb.select("subj_text", "predicate", "obj_text").where(
        F.col("subj_text") != F.col("obj_text")
    )
    surfaces = (
        kb.select(F.col("subj_text").alias("surface"))
        .unionByName(kb.select(F.col("obj_text").alias("surface")))
        .distinct()
    )
    mentions = _first_occurrences(
        docs, surfaces, id_cols, text_col, block=block
    )
    subj_m = mentions.select(
        *id_cols,
        F.col("surface").alias("subj_text"),
        F.col("pos").alias("subj_pos"),
    )
    obj_m = mentions.select(
        *id_cols,
        F.col("surface").alias("obj_text"),
        F.col("pos").alias("obj_pos"),
    )
    return (
        subj_m.join(F.broadcast(kb), "subj_text")
        .join(obj_m, [*id_cols, "obj_text"])
        .select(
            *id_cols,
            "subj_text",
            "predicate",
            "obj_text",
            "subj_pos",
            "obj_pos",
        )
    )


def weak_training_set(
    docs: DataFrame,
    kb: DataFrame,
    id_cols: tuple = ("doc_id",),
    text_col: str = "text",
    block: str = "token",
) -> DataFrame:
    """Distant labels assembled into the trainer's input shape: one row
    per doc that received >= 1 weak label, with ``gold_json`` holding
    the spo_list exactly as the reference's hand-labeled JSONL does
    (dataset/data_utils.py reads {text, spo_list}) — so
    operators/train.py trains on it unchanged. THIS is the 100-TB
    bootstrap: seed KB in, training corpus out, no human labels.

    ``kb`` may carry optional ``subject_type`` / ``object_type``
    columns (DuIE-style schemas have them); they pass through into the
    spo entries, defaulting to '' — the label builders key on
    predicate + surface text only (core/labeling.py), so training is
    type-agnostic either way.

    The per-doc spo array is array_sort-ed, making gold_json
    byte-deterministic under any partitioning (collect_list order is
    not)."""
    id_cols = tuple(id_cols)
    if "subject_type" not in kb.columns:
        kb = kb.withColumn("subject_type", F.lit(""))
    if "object_type" not in kb.columns:
        kb = kb.withColumn("object_type", F.lit(""))
    types = kb.select(
        "subj_text", "predicate", "obj_text", "subject_type", "object_type"
    ).distinct()
    labels = distant_supervision(
        docs, kb, id_cols=id_cols, text_col=text_col, block=block
    ).join(F.broadcast(types), ["subj_text", "predicate", "obj_text"])
    # serialize each spo to its JSON object FIRST (structs holding MAP
    # fields are not orderable, so array_sort over the struct itself is
    # a type error), then sort the strings — byte-deterministic and the
    # concatenation is exactly to_json's array form
    spo_json = F.to_json(
        F.struct(
            F.col("predicate"),
            F.col("subj_text").alias("subject"),
            F.col("subject_type"),
            F.create_map(F.lit("@value"), F.col("obj_text")).alias(
                "object"
            ),
            F.create_map(F.lit("@value"), F.col("object_type")).alias(
                "object_type"
            ),
        )
    )
    per_doc = labels.groupBy(*id_cols).agg(
        F.concat(
            F.lit("["),
            F.array_join(
                F.array_sort(F.collect_list(spo_json)), ","
            ),
            F.lit("]"),
        ).alias("gold_json")
    )
    return docs.select(*id_cols, text_col).join(per_doc, list(id_cols))


def bag_denoise(
    weak_labels: DataFrame,
    score_col: str,
    id_cols: tuple = ("doc_id",),
    keep_per_bag: int = 1,
) -> DataFrame:
    """Multi-instance denoising of a distant-supervision label table
    (the at-least-once assumption — Riedel 2010, "Modeling relations
    and their mentions without labeled text": a KB triple guarantees
    only that SOME sentence mentioning both entities expresses the
    relation, so training on every co-mention imports systematic
    noise). Per bag — all weak labels sharing (subj_text, predicate,
    obj_text) — keep the ``keep_per_bag`` highest-scoring instances;
    the caller chooses the score (mention proximity, LM quality, an
    encoder margin), which stays a column so the selection itself is
    exact and engine-checkable.

    Adds ``bag_size`` (instances the bag had before selection) and
    ``sel_rank`` (1 = best). Ties break on (*id_cols) ascending, so
    selection is deterministic under any partitioning.

    Scale shape: ONE shuffle on the bag key feeding two window
    computations over the same partitioning (rank + count — Catalyst
    folds them into one Window node chain, no second exchange). Bags
    are (pair, predicate) groups, so skew is bounded by the hottest
    entity pair's mention count — the quantity bag_size exists to
    audit."""
    if keep_per_bag < 1:
        raise ValueError("bag_denoise: keep_per_bag must be >= 1")
    bag = ["subj_text", "predicate", "obj_text"]
    w = Window.partitionBy(*bag).orderBy(
        F.col(score_col).desc(), *[F.col(c).asc() for c in id_cols]
    )
    wc = Window.partitionBy(*bag)
    return (
        weak_labels.withColumn("sel_rank", F.row_number().over(w))
        .withColumn("bag_size", F.count("*").over(wc).cast("long"))
        .where(F.col("sel_rank") <= int(keep_per_bag))
    )
