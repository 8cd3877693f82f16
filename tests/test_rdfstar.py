"""RDF-star export/import (sources/rdf.py): line grammar, roundtrip,
coexistence with plain N-Triples parsing."""

from nlp_series_relation_extraction_spark.sources.rdf import (
    edges_to_ntriples_star,
    ntriples_star_to_edges,
    parse_ntriples_star,
)

TE = (
    "subj_entity_id long, predicate string, obj_entity_id long, "
    "n_evidence long, first_conv_id string"
)


def _edges(spark):
    return spark.createDataFrame(
        [(1, "works_at", 2, 3, "conv9"), (4, "located_in", 5, 1, None)],
        TE,
    )


def test_export_line_shapes(spark):
    lines = {r.line for r in edges_to_ntriples_star(_edges(spark)).collect()}
    assert (
        "<http://kg.example/e/1> <http://kg.example/p/works_at>"
        " <http://kg.example/e/2> ." in lines
    )
    assert (
        "<< <http://kg.example/e/1> <http://kg.example/p/works_at>"
        " <http://kg.example/e/2> >> <http://kg.example/p/nEvidence>"
        ' "3"^^<http://www.w3.org/2001/XMLSchema#integer> .' in lines
    )
    assert (
        "<< <http://kg.example/e/1> <http://kg.example/p/works_at>"
        " <http://kg.example/e/2> >> <http://kg.example/p/firstSeenIn>"
        " <http://kg.example/g/conv9> ." in lines
    )
    # edge with NULL conv emits no firstSeenIn line: 3 + 2 lines total
    assert len(lines) == 5


def test_roundtrip(spark):
    edges = _edges(spark)
    dump = edges_to_ntriples_star(edges)
    back = ntriples_star_to_edges(dump)
    got = sorted(map(tuple, back.collect()))
    want = sorted(map(tuple, edges.collect()))
    assert got == want


def test_parser_ignores_plain_and_malformed(spark):
    rows = [
        ("<http://x/e/1> <http://x/p/p> <http://x/e/2> .",),
        ("<< broken",),
        ("",),
        (
            "<< <http://x/e/1> <http://x/p/p> <http://x/e/2> >>"
            ' <http://x/p/q> "v" .',
        ),
    ]
    out = parse_ntriples_star(
        spark.createDataFrame(rows, "line string")
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.qual_iri == "http://x/p/q"
    assert r.value_lit == "v" and r.value_iri is None
    assert r.value_dtype is None


def test_annotation_value_iri_vs_literal(spark):
    rows = [
        (
            "<< <http://x/e/1> <http://x/p/p> <http://x/e/2> >>"
            " <http://x/p/seen> <http://x/g/c1> .",
        ),
        (
            "<< <http://x/e/1> <http://x/p/p> <http://x/e/2> >>"
            ' <http://x/p/n> "7"^^<http://www.w3.org/2001/XMLSchema#integer> .',
        ),
    ]
    out = {
        r.qual_iri: r
        for r in parse_ntriples_star(
            spark.createDataFrame(rows, "line string")
        ).collect()
    }
    assert out["http://x/p/seen"].value_iri == "http://x/g/c1"
    assert out["http://x/p/n"].value_lit == "7"
    assert out["http://x/p/n"].value_dtype.endswith("integer")
