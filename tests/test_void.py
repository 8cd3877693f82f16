"""VoID dataset descriptions (operators/void_stats.py): exact counts
vs the plain-Python twin, partition structure, empty-class handling."""

import random

from nlp_series_relation_extraction_spark.operators.void_stats import (
    void_description,
    void_description_python_twin,
)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, predicate string, obj string"
    )


def _run(spark, rows, **kw):
    return {
        tuple(r) for r in void_description(_df(spark, rows), **kw).collect()
    }


class TestVoid:
    def test_small_graph_exact(self, spark):
        rows = [
            ("a", "knows", "b"), ("a", "knows", "c"),
            ("b", "knows", "c"),
            ("a", "type", "Person"), ("b", "type", "Person"),
            ("c", "type", "Robot"),
            ("a", "knows", "b"),           # duplicate: set semantics
        ]
        got = _run(spark, rows)
        want = void_description_python_twin(rows)
        assert got == want
        assert ("dataset", "void:triples", "6") in got
        assert ("dataset/prop/knows", "void:triples", "3") in got
        assert ("dataset/prop/knows", "void:distinctSubjects", "2") in got
        assert ("dataset/class/Person", "void:entities", "2") in got

    def test_no_type_rows_means_no_class_partitions(self, spark):
        rows = [("a", "p", "b")]
        got = _run(spark, rows)
        assert ("dataset", "void:classes", "0") in got
        assert not any(
            r[1] in ("void:classPartition", "void:class", "void:entities")
            for r in got
        )

    def test_custom_dataset_and_type_predicate(self, spark):
        rows = [("a", "rdf:type", "T"), ("a", "p", "b")]
        got = _run(spark, rows, dataset="ds1",
                   type_predicate="rdf:type")
        want = void_description_python_twin(
            rows, dataset="ds1", type_predicate="rdf:type"
        )
        assert got == want
        assert ("ds1/class/T", "void:entities", "1") in got

    def test_randomized_twin_equivalence(self, spark):
        rng = random.Random(47)
        nodes = [f"n{i}" for i in range(12)]
        preds = ["p", "q", "type"]
        rows = list({
            (rng.choice(nodes), rng.choice(preds),
             rng.choice(nodes + ["C1", "C2"]))
            for _ in range(200)
        })
        got = _run(spark, rows)
        want = void_description_python_twin(rows)
        assert got == want
        assert len(want) > 20
