"""edges_to_reified_ntriples (sources/rdf.py): W3C standard
reification with provenance qualifiers — line shapes, skolem-id
determinism, qualifier presence, reparse roundtrip."""

from nlp_series_relation_extraction_spark.sources.rdf import (
    edges_to_reified_ntriples,
    parse_ntriples,
)

E = (
    "subj_entity_id long, predicate string, obj_entity_id long,"
    " n_evidence long, first_conv_id string"
)


def _lines(spark, rows, schema=E):
    df = spark.createDataFrame(rows, schema)
    return [r.line for r in edges_to_reified_ntriples(df).collect()]


def test_six_lines_per_edge_with_conv(spark):
    lines = _lines(spark, [(1, "knows", 2, 3, "conv_7")])
    assert len(lines) == 6
    stmts = {ln.split(" ")[0] for ln in lines}
    assert len(stmts) == 1  # one statement node
    joined = "\n".join(lines)
    assert "rdf-syntax-ns#Statement" in joined
    assert "rdf-syntax-ns#subject> <http://kg.example/e/1>" in joined
    assert "rdf-syntax-ns#object> <http://kg.example/e/2>" in joined
    assert (
        '<http://kg.example/p/nEvidence> "3"'
        "^^<http://www.w3.org/2001/XMLSchema#integer> ." in joined
    )
    assert (
        "<http://kg.example/p/firstSeenIn> <http://kg.example/g/conv_7> ."
        in joined
    )


def test_five_lines_without_conv(spark):
    rows = [(1, "knows", 2, 3)]
    schema = (
        "subj_entity_id long, predicate string, obj_entity_id long,"
        " n_evidence long"
    )
    assert len(_lines(spark, rows, schema)) == 5


def test_statement_id_is_deterministic_and_distinct(spark):
    a = _lines(spark, [(1, "knows", 2, 1, "c")])
    b = _lines(spark, [(1, "knows", 2, 9, "d")])  # same triple, new meta
    assert a[0].split(" ")[0] == b[0].split(" ")[0]
    c = _lines(spark, [(1, "knows", 3, 1, "c")])  # different triple
    assert c[0].split(" ")[0] != a[0].split(" ")[0]


def test_reparse_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, "knows", 2, 3, "c0"), (4, "likes", 5, 1, "c1")], E
    )
    out = edges_to_reified_ntriples(df)
    parsed = parse_ntriples(out)
    assert parsed.count() == 12
    # every parsed line keeps the statement subject; 4 core + 2
    # qualifier predicates per statement
    from pyspark.sql import functions as F

    per_stmt = parsed.groupBy("subj").agg(F.count("*").alias("n"))
    assert {r.n for r in per_stmt.collect()} == {6}
