"""VoID dataset descriptions (https://www.w3.org/TR/void/) for a
published triple table.

Every serious KG publication ships a VoID sidecar — dataset-level
triple/subject/object counts plus per-property and per-class
partitions — so consumers can plan federated queries without scanning
the dump. This operator emits that description AS TRIPLES (the VoID
vocabulary is itself RDF), ready for the existing N-Triples sink.

Distinct from ``operators/graph.py:predicate_schema`` (modal
subject/object TYPES per predicate) and ``cardinality_profile``
(functional-ness shares): VoID is the W3C-vocabulary cardinality
census — counts only, no typing.

Scale shape: ONE scan feeds four aggregates — the global counts and
the per-property partition reduce over (predicate); the class
partition is a filter on the type predicate + one aggregate over
(class). Exact distinct counts shuffle once on the counted column
(Spark plans count(DISTINCT) via expand + two-phase aggregate); at
100 TB swap exactness for the repo's HLL sketches
(``functions/sketch.py:hll_distinct``) — the emission shape is
identical, so only the aggregate expression changes; exact is kept
here because the description is small and the DuckDB oracle pins it
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TYPE_PREDICATE = "type"


def void_description(
    facts: DataFrame,
    dataset: str = "dataset",
    type_predicate: str = TYPE_PREDICATE,
) -> DataFrame:
    """VoID description triples ``(subj, predicate, obj)`` for
    ``facts`` (subj, predicate, obj):

    - ``(dataset, void:triples|distinctSubjects|distinctObjects|
      properties|classes, n)`` — dataset-wide counts (distinct
      triples; spec counts the SET).
    - ``(dataset, void:propertyPartition, <dataset>/prop/<p>)`` and
      per-partition ``void:property`` / ``void:triples`` /
      ``void:distinctSubjects`` / ``void:distinctObjects``.
    - ``(dataset, void:classPartition, <dataset>/class/<c>)`` and
      per-partition ``void:class`` / ``void:entities`` (instances of
      the class per the type predicate).

    All counts serialize as canonical integer strings (VoID literals
    are xsd:integer)."""
    spark = facts.sparkSession
    base = facts.select("subj", "predicate", "obj").distinct()

    totals = base.agg(
        F.count("*").alias("triples"),
        F.countDistinct("subj").alias("dsubj"),
        F.countDistinct("obj").alias("dobj"),
        F.countDistinct("predicate").alias("props"),
    )
    classes = base.where(F.col("predicate") == type_predicate).select(
        F.col("obj").alias("cls")
    )
    n_classes = classes.agg(
        F.countDistinct("cls").alias("classes")
    )
    global_rows = (
        totals.crossJoin(F.broadcast(n_classes))  # two 1-row frames
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(p).alias("predicate"),
                            F.col(c).cast("string").alias("obj"),
                        )
                        for p, c in (
                            ("void:triples", "triples"),
                            ("void:distinctSubjects", "dsubj"),
                            ("void:distinctObjects", "dobj"),
                            ("void:properties", "props"),
                            ("void:classes", "classes"),
                        )
                    ]
                )
            ).alias("po")
        )
        .select(
            F.lit(dataset).alias("subj"),
            F.col("po.predicate").alias("predicate"),
            F.col("po.obj").alias("obj"),
        )
    )

    pp = (
        base.groupBy("predicate")
        .agg(
            F.count("*").alias("triples"),
            F.countDistinct("subj").alias("dsubj"),
            F.countDistinct("obj").alias("dobj"),
        )
        .select(
            F.concat(
                F.lit(dataset + "/prop/"), F.col("predicate")
            ).alias("part"),
            F.col("predicate").alias("prop"),
            "triples", "dsubj", "dobj",
        )
    )
    pp_rows = pp.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit(dataset).alias("s"),
                    F.lit("void:propertyPartition").alias("p"),
                    F.col("part").alias("o"),
                ),
                F.struct(
                    F.col("part").alias("s"),
                    F.lit("void:property").alias("p"),
                    F.col("prop").alias("o"),
                ),
                F.struct(
                    F.col("part").alias("s"),
                    F.lit("void:triples").alias("p"),
                    F.col("triples").cast("string").alias("o"),
                ),
                F.struct(
                    F.col("part").alias("s"),
                    F.lit("void:distinctSubjects").alias("p"),
                    F.col("dsubj").cast("string").alias("o"),
                ),
                F.struct(
                    F.col("part").alias("s"),
                    F.lit("void:distinctObjects").alias("p"),
                    F.col("dobj").cast("string").alias("o"),
                ),
            )
        ).alias("t")
    ).select(
        F.col("t.s").alias("subj"),
        F.col("t.p").alias("predicate"),
        F.col("t.o").alias("obj"),
    )

    cp = (
        base.where(F.col("predicate") == type_predicate)
        .groupBy(F.col("obj").alias("cls"))
        .agg(F.countDistinct("subj").alias("entities"))
        .select(
            F.concat(F.lit(dataset + "/class/"), F.col("cls"))
            .alias("part"),
            "cls", "entities",
        )
    )
    cp_rows = cp.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit(dataset).alias("s"),
                    F.lit("void:classPartition").alias("p"),
                    F.col("part").alias("o"),
                ),
                F.struct(
                    F.col("part").alias("s"),
                    F.lit("void:class").alias("p"),
                    F.col("cls").alias("o"),
                ),
                F.struct(
                    F.col("part").alias("s"),
                    F.lit("void:entities").alias("p"),
                    F.col("entities").cast("string").alias("o"),
                ),
            )
        ).alias("t")
    ).select(
        F.col("t.s").alias("subj"),
        F.col("t.p").alias("predicate"),
        F.col("t.o").alias("obj"),
    )

    return global_rows.unionByName(pp_rows).unionByName(cp_rows)


def void_description_python_twin(
    facts: list[tuple[str, str, str]],
    dataset: str = "dataset",
    type_predicate: str = TYPE_PREDICATE,
) -> set[tuple[str, str, str]]:
    """Plain-Python oracle for :func:`void_description`."""
    base = set(facts)
    out: set[tuple[str, str, str]] = set()
    subs = {s for s, _, _ in base}
    objs = {o for _, _, o in base}
    preds = {p for _, p, _ in base}
    classes = {o for _, p, o in base if p == type_predicate}
    out.add((dataset, "void:triples", str(len(base))))
    out.add((dataset, "void:distinctSubjects", str(len(subs))))
    out.add((dataset, "void:distinctObjects", str(len(objs))))
    out.add((dataset, "void:properties", str(len(preds))))
    out.add((dataset, "void:classes", str(len(classes))))
    for p in preds:
        rows = {(s, o) for s, pp, o in base if pp == p}
        part = f"{dataset}/prop/{p}"
        out.add((dataset, "void:propertyPartition", part))
        out.add((part, "void:property", p))
        out.add((part, "void:triples", str(len(rows))))
        out.add((part, "void:distinctSubjects",
                 str(len({s for s, _ in rows}))))
        out.add((part, "void:distinctObjects",
                 str(len({o for _, o in rows}))))
    for c in classes:
        inst = {s for s, p, o in base if p == type_predicate and o == c}
        part = f"{dataset}/class/{c}"
        out.add((dataset, "void:classPartition", part))
        out.add((part, "void:class", c))
        out.add((part, "void:entities", str(len(inst))))
    return out
