"""Turtle export/import (sources/turtle.py): spec-example parsing,
export round-trip through the parser, N-Triples cross-equivalence,
fail-loud grammar errors."""

import pytest
from pyspark.sql import functions as F

from nlp_series_relation_extraction_spark.sources.turtle import (
    RDF_NS,
    XSD_NS,
    edges_to_turtle,
    parse_turtle,
    parse_turtle_document,
    turtle_header,
)

BASE = "http://kg.example/"


def _edges(spark, rows):
    return spark.createDataFrame(
        [(s, p, o) for s, p, o in rows],
        "subj_entity_id long, predicate string, obj_entity_id long",
    )


def _rows(text):
    return set(parse_turtle_document(text))


def test_spec_example_prefixes_semicolon_comma_a():
    text = """
@prefix rel: <http://example.org/rel/> .
@prefix ex: <http://example.org/> .
# a comment
ex:green-goblin rel:enemyOf ex:spiderman ;
                a ex:Villain ;
                rel:alias "Green Goblin", "GG"@en .
"""
    got = _rows(text)
    gg = "http://example.org/green-goblin"
    assert (gg, "iri", "http://example.org/rel/enemyOf",
            "http://example.org/spiderman", "iri", None, None) in got
    assert (gg, "iri", RDF_NS + "type", "http://example.org/Villain",
            "iri", None, None) in got
    assert (gg, "iri", "http://example.org/rel/alias", "Green Goblin",
            "literal", None, None) in got
    assert (gg, "iri", "http://example.org/rel/alias", "GG",
            "literal", "en", None) in got
    assert len(got) == 4


def test_numeric_boolean_and_typed_literals():
    text = """
@prefix : <http://e/> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
:s :n 42 ; :d 3.14 ; :e 1.2e3 ; :b true ; :t "7"^^xsd:byte ;
   :l '''long
line''' .
"""
    got = _rows(text)
    def obj(pred):
        return next(
            (o, lang, dt) for s, _, p, o, k, lang, dt in got
            if p == f"http://e/{pred}"
        )
    assert obj("n") == ("42", None, XSD_NS + "integer")
    assert obj("d") == ("3.14", None, XSD_NS + "decimal")
    assert obj("e") == ("1.2e3", None, XSD_NS + "double")
    assert obj("b") == ("true", None, XSD_NS + "boolean")
    assert obj("t") == ("7", None, XSD_NS + "byte")
    assert obj("l") == ("long\nline", None, None)


def test_bnode_property_lists_and_labels():
    text = """
@prefix foaf: <http://xmlns.com/foaf/0.1/> .
_:alice foaf:knows [ foaf:name "Bob" ; foaf:knows _:carol ] .
"""
    got = _rows(text)
    anon = next(
        o for s, sk, p, o, k, _, _ in got
        if s == "alice" and p.endswith("knows") and k == "bnode"
    )
    assert (anon, "bnode", "http://xmlns.com/foaf/0.1/name", "Bob",
            "literal", None, None) in got
    assert (anon, "bnode", "http://xmlns.com/foaf/0.1/knows", "carol",
            "bnode", None, None) in got
    assert len(got) == 3


def test_collections_expand_to_rdf_lists():
    text = """
@prefix : <http://e/> .
:s :vals ( 1 2 ) .
:t :empty () .
"""
    got = _rows(text)
    # empty collection is rdf:nil directly
    assert ("http://e/t", "iri", "http://e/empty", RDF_NS + "nil",
            "iri", None, None) in got
    head = next(
        o for s, _, p, o, k, _, _ in got
        if p == "http://e/vals" and k == "bnode"
    )
    firsts = {
        (s, o) for s, _, p, o, _, _, dt in got
        if p == RDF_NS + "first"
    }
    assert any(s == head and o == "1" for s, o in firsts)
    rests = {
        (s, o) for s, _, p, o, _, _, _ in got if p == RDF_NS + "rest"
    }
    # the chain terminates at nil
    assert any(o == RDF_NS + "nil" for _, o in rests)


def test_base_resolution_and_sparql_style_directives():
    text = """
BASE <http://host/dir/>
PREFIX x: <sub/>
<item1> x:rel <../other> .
"""
    got = _rows(text)
    (row,) = got
    assert row[0] == "http://host/dir/item1"
    assert row[2] == "http://host/dir/sub/rel"
    assert row[3] == "http://host/other"


def test_export_roundtrips_through_parser(spark):
    rows = [(1, "likes", 2), (1, "knows", 3), (2, "likes~odd", 3)]
    edges = _edges(spark, rows)
    blocks = [r.line for r in edges_to_turtle(edges, BASE).collect()]
    doc = "\n".join(turtle_header(BASE) + blocks)
    parsed = parse_turtle_document(doc)
    got = {
        (int(s.rsplit("/", 1)[1]), p.rsplit("/", 1)[1],
         int(o.rsplit("/", 1)[1]))
        for s, sk, p, o, ok, _, _ in parsed
    }
    from urllib.parse import unquote

    assert {(s, unquote(p), o) for s, p, o in got} == set(rows)


def test_distributed_parse_matches_single_doc(spark):
    text = """
@prefix : <http://e/> .
:a :p :b . :b :p :c .
"""
    docs = spark.createDataFrame([(text,), (text,), (None,)],
                                 "doc string")
    out = parse_turtle(docs).collect()
    assert len(out) == 4  # two docs x two triples; NULL doc skipped
    assert {(r.subj, r.pred, r.obj) for r in out} == {
        ("http://e/a", "http://e/p", "http://e/b"),
        ("http://e/b", "http://e/p", "http://e/c"),
    }


def test_turtle_and_ntriples_parsers_agree(spark):
    from nlp_series_relation_extraction_spark.sources.rdf import (
        parse_ntriples,
    )

    nt = [
        '<http://e/a> <http://e/p> <http://e/b> .',
        '<http://e/a> <http://e/q> "hi\\nthere"@en .',
    ]
    ttl = """
<http://e/a> <http://e/p> <http://e/b> ;
             <http://e/q> "hi\\nthere"@en .
"""
    nt_rows = {
        tuple(r) for r in parse_ntriples(
            spark.createDataFrame([(l,) for l in nt], "line string")
        ).collect()
    }
    ttl_rows = set(parse_turtle_document(ttl))
    assert nt_rows == ttl_rows


@pytest.mark.parametrize(
    "bad",
    [
        ":s :p :o .",                      # undeclared prefix
        "@prefix : <http://e/> .\n:s :p .",  # missing object
        "@prefix : <http://e/> .\n:s :p 'x' ",  # missing final dot
        "@prefix : <http://e/> .\n:s :p 'x",    # unterminated string
        "@prefix : <http://e/> .\n:s :p _:genid7 .",  # reserved label
        "<http://e/ s> <http://e/p> <http://e/o> .",  # space in IRI
    ],
)
def test_fails_loud(bad):
    with pytest.raises(ValueError, match="malformed Turtle|offset"):
        parse_turtle_document(bad)


def test_export_is_jvm_side(spark):
    plan = edges_to_turtle(
        _edges(spark, [(1, "p", 2)]), BASE
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "mapInPandas" not in plan.lower()


def test_pn_local_escaping_of_nasty_predicates(spark):
    rows = [(1, "ends.", 2), (1, "-leads", 3), (1, "mid~tilde", 4)]
    blocks = [
        r.line for r in edges_to_turtle(_edges(spark, rows), BASE).collect()
    ]
    doc = "\n".join(turtle_header(BASE) + blocks)
    parsed = parse_turtle_document(doc)
    from urllib.parse import unquote

    preds = {unquote(p.rsplit("/", 1)[1]) for _, _, p, *_ in parsed}
    assert preds == {"ends.", "-leads", "mid~tilde"}
