"""edges_to_jsonld (sources/rdf.py): flattened expanded-form JSON-LD —
byte determinism, valid JSON, lossless triple roundtrip."""

import json

from nlp_series_relation_extraction_spark.sources.rdf import (
    DEFAULT_BASE,
    edges_to_jsonld,
)

E = "subj_entity_id long, predicate string, obj_entity_id long"


def _lines(spark, edges):
    df = edges_to_jsonld(spark.createDataFrame(edges, E))
    return sorted(r.line for r in df.collect())


def test_single_edge_shape(spark):
    [line] = _lines(spark, [(7, "likes", 9)])
    assert line == (
        '{"@id":"http://kg.example/e/7",'
        '"http://kg.example/p/likes":[{"@id":"http://kg.example/e/9"}]}'
    )


def test_every_line_is_valid_json_and_roundtrips(spark):
    edges = [
        (1, "knows", 2), (1, "knows", 3), (1, "works_at", 4),
        (2, "knows", 1), (3, "likes", 3),
        (1, "knows", 2),  # duplicate edge collapses
    ]
    lines = _lines(spark, edges)
    got = set()
    for line in lines:
        obj = json.loads(line)
        sid = int(obj.pop("@id").rsplit("/", 1)[1])
        for pred_iri, vals in obj.items():
            pred = pred_iri.rsplit("/", 1)[1]
            for v in vals:
                got.add((sid, pred, int(v["@id"].rsplit("/", 1)[1])))
    assert got == {(s, p, o) for s, p, o in edges}


def test_deterministic_bytes_under_partitioning(spark):
    edges = [(i % 7, f"p{i % 3}", (i * 5) % 11) for i in range(60)]
    a = _lines(spark, edges)
    b = sorted(
        r.line
        for r in edges_to_jsonld(
            spark.createDataFrame(edges, E).repartition(13)
        ).collect()
    )
    assert a == b


def test_predicates_sorted_and_objects_sorted(spark):
    edges = [(1, "zebra", 5), (1, "alpha", 9), (1, "alpha", 2)]
    [line] = _lines(spark, edges)
    obj = json.loads(line)
    keys = [k for k in obj if k != "@id"]
    assert keys == sorted(keys)
    assert [v["@id"] for v in obj[f"{DEFAULT_BASE}p/alpha"]] == [
        f"{DEFAULT_BASE}e/2", f"{DEFAULT_BASE}e/9",
    ]


def test_predicate_iri_percent_encoding(spark):
    [line] = _lines(spark, [(1, "has part/of", 2)])
    obj = json.loads(line)
    assert f"{DEFAULT_BASE}p/has%20part%2Fof" in obj
