"""N-Triples export/import (sources/rdf.py): spec escaping, roundtrip,
full-parser conformance, fail-loud on malformed input."""

import pytest
from pyspark.sql import functions as F

from nlp_series_relation_extraction_spark.sources.rdf import (
    edges_to_ntriples,
    labels_to_ntriples,
    ntriples_to_edges,
    parse_ntriples,
    _unescape,
)


def _edges_df(spark, rows):
    return spark.createDataFrame(
        rows, "subj_entity_id long, predicate string, obj_entity_id long"
    )


def _lines_df(spark, lines):
    return spark.createDataFrame([(l,) for l in lines], "line string")


EDGES = [
    (1, "likes", 2),
    (1, "knows", 3),
    (2, "作者", 7),          # non-ASCII predicate -> percent-encoded IRI
    (5, "has part", 1),      # space -> %20 (raw space is illegal in IRIs)
    (5, "a/b#c?d", 9),       # reserved chars must all encode (safe='')
]


def test_edge_roundtrip(spark):
    df = _edges_df(spark, EDGES)
    lines = edges_to_ntriples(df)
    back = ntriples_to_edges(lines)
    assert sorted(
        (r.subj_entity_id, r.predicate, r.obj_entity_id)
        for r in back.collect()
    ) == sorted(EDGES)


def test_exported_lines_are_spec_shaped(spark):
    lines = [r.line for r in edges_to_ntriples(_edges_df(spark, EDGES)).collect()]
    assert all(l.endswith(" .") for l in lines)
    joined = "\n".join(lines)
    # IRIs may not contain raw spaces or raw non-encoded reserved chars
    for l in lines:
        for term in l[:-2].split("> <"):
            assert " " not in term.strip("<> ")
    assert "%E4%BD%9C%E8%80%85" in joined  # 作者
    assert "has%20part" in joined
    assert "a%2Fb%23c%3Fd" in joined


def test_label_escaping_roundtrip(spark):
    nodes = spark.createDataFrame(
        [
            (1, 'say "hi"'),
            (2, "back\\slash"),
            (3, "line\nbreak\rcr"),
            (4, "汉字 label"),
        ],
        "entity_id long, canonical_name string",
    )
    lines = labels_to_ntriples(nodes, lang="en")
    parsed = parse_ntriples(lines)
    got = {
        int(r.subj.rsplit("/", 1)[1]): (r.obj, r.obj_kind, r.lang)
        for r in parsed.collect()
    }
    want = {r.entity_id: r.canonical_name for r in nodes.collect()}
    assert {k: v[0] for k, v in got.items()} == want
    assert all(kind == "literal" and lang == "en" for _, kind, lang in got.values())
    raw = {r.line for r in lines.collect()}
    assert any('\\"hi\\"' in l for l in raw)
    assert any("back\\\\slash" in l for l in raw)
    assert any("line\\nbreak\\rcr" in l for l in raw)


def test_parser_full_grammar(spark):
    lines = [
        "# a comment line",
        "",
        "   ",
        '<http://a/s> <http://a/p> "plain" .',
        '<http://a/s> <http://a/p> "tagged"@en-US .',
        '<http://a/s> <http://a/p> "typed"^^<http://www.w3.org/2001/XMLSchema#int> .',
        '<http://a/s> <http://a/p> "esc \\u0041\\U0001F600 \\t\\\\" . # trailing comment',
        "_:b0 <http://a/p> <http://a/o> .",
        "<http://a/s> <http://a/p> _:b1 .",
    ]
    rows = parse_ntriples(_lines_df(spark, lines)).collect()
    assert len(rows) == 6
    by_obj = {r.obj: r for r in rows}
    assert by_obj["plain"].lang is None and by_obj["plain"].dtype is None
    assert by_obj["tagged"].lang == "en-US"
    assert by_obj["typed"].dtype == "http://www.w3.org/2001/XMLSchema#int"
    assert "esc A\U0001f600 \t\\" in by_obj
    bnodes = [r for r in rows if "bnode" in (r.subj_kind, r.obj_kind)]
    assert {r.subj_kind for r in bnodes} | {r.obj_kind for r in bnodes} >= {
        "bnode",
        "iri",
    }


@pytest.mark.parametrize(
    "bad",
    [
        "<http://a/s> <http://a/p> <http://a/o>",        # missing dot
        '<http://a/s> "lit-as-pred" <http://a/o> .',     # literal predicate
        "_:b <http://a/p> .",                            # missing object
        '<http://a/s> <http://a/p> "bad escape \\q" .',  # invalid ECHAR
        "<http://a/ s> <http://a/p> <http://a/o> .",     # raw space in IRI
    ],
)
def test_parser_fails_loud(spark, bad):
    with pytest.raises(Exception):
        parse_ntriples(_lines_df(spark, [bad])).collect()


def test_mixed_dump_import_filters_labels(spark):
    edges = _edges_df(spark, EDGES)
    nodes = spark.createDataFrame(
        [(1, "one"), (2, "two")], "entity_id long, canonical_name string"
    )
    dump = edges_to_ntriples(edges).unionByName(labels_to_ntriples(nodes))
    back = ntriples_to_edges(dump)
    assert back.count() == len(EDGES)


def test_export_is_jvm_side(spark):
    """The line-building stage must not contain a Python eval: only the
    schema-sized predicate dimension touches Python."""
    plan = edges_to_ntriples(_edges_df(spark, EDGES))._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan


def test_unescape_unit():
    assert _unescape(r"A\n\t\\\"") == 'A\n\t\\"'
    with pytest.raises(ValueError):
        _unescape(r"\x41")


def test_write_text_roundtrip(spark, tmp_path):
    """The dump really is .write.text-shaped: file out, file in, graph
    equal."""
    out = str(tmp_path / "dump")
    edges = _edges_df(spark, EDGES)
    edges_to_ntriples(edges).write.mode("overwrite").text(out)
    back = ntriples_to_edges(
        spark.read.text(out).withColumnRenamed("value", "line")
    )
    assert sorted(
        (r.subj_entity_id, r.predicate, r.obj_entity_id)
        for r in back.collect()
    ) == sorted(EDGES)


# --- N-Quads --------------------------------------------------------------


def _quad_edges_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "subj_entity_id long, predicate string, obj_entity_id long, "
        "first_conv_id string",
    )


QUAD_EDGES = [
    (1, "likes", 2, "conv-1"),
    (1, "knows", 3, "conv 2"),       # space in conv id -> %20
    (2, "作者", 7, "c+d"),           # literal plus -> %2B (decode-safe)
    (5, "has part", 1, "对话9"),     # non-ASCII conv id
]


def test_nquad_roundtrip_with_provenance(spark):
    from nlp_series_relation_extraction_spark.sources.rdf import (
        edges_to_nquads,
        nquads_to_edges,
    )

    lines = edges_to_nquads(_quad_edges_df(spark, QUAD_EDGES))
    back = nquads_to_edges(lines)
    got = sorted(
        (r.subj_entity_id, r.predicate, r.obj_entity_id, r.conv_id)
        for r in back.collect()
    )
    assert got == sorted(QUAD_EDGES)


def test_nquad_lines_are_spec_shaped(spark):
    from nlp_series_relation_extraction_spark.sources.rdf import (
        edges_to_nquads,
    )

    lines = [
        r.line
        for r in edges_to_nquads(_quad_edges_df(spark, QUAD_EDGES)).collect()
    ]
    assert all(l.endswith("> .") for l in lines)
    # four IRI terms per line, no raw spaces inside any IRI
    for l in lines:
        terms = [t for t in l[:-2].split(" ") if t]
        assert len(terms) == 4, l
        assert all(t.startswith("<") and t.endswith(">") for t in terms), l
    assert any("%20" in l for l in lines)      # 'conv 2'
    assert any("%2B" in l for l in lines)      # 'c+d'


def test_parse_nquads_default_graph_and_bnode_graph(spark):
    from nlp_series_relation_extraction_spark.sources.rdf import (
        parse_nquads,
    )

    rows = parse_nquads(
        _lines_df(
            spark,
            [
                "<http://x/a> <http://x/p> <http://x/b> .",  # N-Triples line
                "<http://x/a> <http://x/p> \"lit\"@en <http://x/g1> .",
                "_:b1 <http://x/p> <http://x/b> _:g2 .",
                "  # comment only",
                "",
            ],
        )
    ).collect()
    by_subj = {r.subj: r for r in rows}
    assert by_subj["http://x/a"].graph in (None, "http://x/g1")
    default = [r for r in rows if r.graph is None]
    assert len(default) == 1 and default[0].graph_kind is None
    lit = [r for r in rows if r.obj_kind == "literal"][0]
    assert (lit.graph, lit.graph_kind, lit.lang) == (
        "http://x/g1", "iri", "en",
    )
    bn = [r for r in rows if r.subj_kind == "bnode"][0]
    assert (bn.graph, bn.graph_kind) == ("g2", "bnode")


@pytest.mark.parametrize(
    "bad",
    [
        '<http://x/a> <http://x/p> <http://x/b> "lit-graph" .',  # literal graph
        "<http://x/a> <http://x/p> <http://x/b> <http://x/g> extra .",
        "<http://x/a> <http://x/p> .",
    ],
)
def test_parse_nquads_fails_loud(spark, bad):
    from nlp_series_relation_extraction_spark.sources.rdf import (
        parse_nquads,
    )

    with pytest.raises(Exception, match="malformed N-Quads"):
        parse_nquads(_lines_df(spark, [bad])).collect()


def test_nquads_export_is_jvm_side(spark):
    """No Python stage in the export plan: the dump must stay a pure
    whole-stage-codegen concat (same contract as the N-Triples test)."""
    from nlp_series_relation_extraction_spark.sources.rdf import (
        edges_to_nquads,
    )

    plan = edges_to_nquads(
        _quad_edges_df(spark, QUAD_EDGES)
    )._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan


def test_nquads_driver_query_matches_duckdb(spark):
    import duckdb
    import pandas as pd

    from nlp_series_relation_extraction_spark.plans.queries import (
        oracle_sql,
        queries,
    )

    sf = "/root/testdata/sf0.001"
    got = (
        queries()["kg_rdf_nquads"](spark, sf)
        .toPandas()
        .sort_values("line")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf}/lineitem.parquet'"
    )
    want = (
        con.execute(oracle_sql()["kg_rdf_nquads"])
        .fetchdf()
        .sort_values("line")
        .reset_index(drop=True)
    )
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=True)


def test_skolemize_replaces_bnodes_deterministically(spark):
    import hashlib

    from nlp_series_relation_extraction_spark.sources.rdf import (
        parse_ntriples,
        skolemize,
    )

    lines = _lines_df(spark, [
        '_:b0 <http://x/p> "lit"@en .',
        '<http://x/s> <http://x/p> _:b0 .',
        '<http://x/s> <http://x/q> <http://x/o> .',
    ])
    out = {tuple(r) for r in skolemize(
        parse_ntriples(lines), base="https://ex.org"
    ).collect()}
    gid = ("https://ex.org/.well-known/genid/"
           + hashlib.sha256(b"b0").hexdigest())
    assert out == {
        (gid, "iri", "http://x/p", "lit", "literal", "en", None),
        ("http://x/s", "iri", "http://x/p", gid, "iri", None, None),
        ("http://x/s", "iri", "http://x/q", "http://x/o", "iri",
         None, None),
    }
    # same label in subject and object position -> same skolem IRI


def test_skolemize_is_identity_without_bnodes(spark):
    from nlp_series_relation_extraction_spark.sources.rdf import (
        parse_ntriples,
        skolemize,
    )

    lines = _lines_df(spark, ['<http://x/s> <http://x/p> "v" .'])
    parsed = parse_ntriples(lines)
    assert {tuple(r) for r in skolemize(parsed).collect()} == {
        tuple(r) for r in parsed.collect()
    }
