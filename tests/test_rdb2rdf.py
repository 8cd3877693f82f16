"""W3C Direct Mapping (operators/rdb2rdf.py): twin exactness, NULL
handling, foreign-key reference triples computed without a join,
composite keys, and declaration validation."""

import pytest
from pyspark.sql.functions import lit as F_lit

from nlp_series_relation_extraction_spark.operators.rdb2rdf import (
    direct_mapping,
    direct_mapping_python_twin,
)

PEOPLE = [
    {"id": 1, "name": "ada", "dept_id": 10},
    {"id": 2, "name": None, "dept_id": 20},
    {"id": 3, "name": "cy", "dept_id": None},
]
DEPTS = [{"d_id": 10, "dname": "eng"}, {"d_id": 20, "dname": "ops"}]
PKS = {"people": "id", "depts": "d_id"}
FKS = {"people": [("dept_id", "depts")]}


def _spark_tables(spark):
    return {
        "people": spark.createDataFrame(
            [(r["id"], r["name"], r["dept_id"]) for r in PEOPLE],
            "id int, name string, dept_id int",
        ),
        "depts": spark.createDataFrame(
            [(r["d_id"], r["dname"]) for r in DEPTS],
            "d_id int, dname string",
        ),
    }


def _collect(df):
    return {(r.subj, r.predicate, r.obj) for r in df.collect()}


class TestDirectMapping:
    def test_matches_python_twin(self, spark):
        got = _collect(
            direct_mapping(_spark_tables(spark), PKS, FKS)
        )
        want = set(
            direct_mapping_python_twin(
                {"people": PEOPLE, "depts": DEPTS}, PKS, FKS
            )
        )
        assert got == want

    def test_triple_shapes(self, spark):
        got = _collect(direct_mapping(_spark_tables(spark), PKS, FKS))
        assert ("people/id=1", "rdf:type", "people") in got
        assert ("people/id=1", "people#name", "ada") in got
        assert ("people/id=1", "people#dept_id", "10") in got
        assert ("people/id=1", "people#ref-dept_id", "depts/d_id=10") in got
        assert ("depts/d_id=10", "depts#dname", "eng") in got

    def test_null_column_emits_no_triple(self, spark):
        got = _collect(direct_mapping(_spark_tables(spark), PKS, FKS))
        assert not any(
            s == "people/id=2" and p == "people#name" for s, p, _ in got
        )
        # null FK: neither the literal nor the reference triple
        assert not any(
            s == "people/id=3" and "dept" in p for s, p, _ in got
        )

    def test_null_primary_key_row_maps_to_nothing(self, spark):
        t = {
            "people": spark.createDataFrame(
                [(None, "ghost", 10)], "id int, name string, dept_id int"
            )
        }
        assert _collect(direct_mapping(t, {"people": "id"})) == set()

    def test_composite_primary_key(self, spark):
        t = {
            "enroll": spark.createDataFrame(
                [(1, 7, "A")], "sid int, cid int, grade string"
            )
        }
        got = _collect(
            direct_mapping(t, {"enroll": ["sid", "cid"]})
        )
        assert ("enroll/sid=1;cid=7", "enroll#grade", "A") in got
        want = set(
            direct_mapping_python_twin(
                {"enroll": [{"sid": 1, "cid": 7, "grade": "A"}]},
                {"enroll": ["sid", "cid"]},
            )
        )
        assert got == want

    def test_base_iri_prefixes_everything(self, spark):
        t = {"depts": _spark_tables(spark)["depts"]}
        got = _collect(
            direct_mapping(t, PKS, base="http://kg/")
        )
        assert (
            "http://kg/depts/d_id=10",
            "rdf:type",
            "http://kg/depts",
        ) in got
        assert all(
            s.startswith("http://kg/") and p.startswith(("rdf:", "http://kg/"))
            for s, p, _ in got
        )

    def test_fk_reference_needs_no_join(self, spark):
        """The referenced IRI is a concat over the FK VALUE: the plan
        must contain no join at all (one scan per table, exploded)."""
        df = direct_mapping(_spark_tables(spark), PKS, FKS)
        txt = df._jdf.queryExecution().optimizedPlan().toString()
        assert "Join" not in txt

    def test_validation_errors(self, spark):
        t = _spark_tables(spark)
        with pytest.raises(ValueError, match="primary key"):
            direct_mapping({"people": t["people"]}, {"people": "nope"})
        with pytest.raises(ValueError, match="foreign key"):
            direct_mapping(
                t, PKS, {"people": [("nope", "depts")]}
            )
        with pytest.raises(ValueError, match="no tables"):
            direct_mapping({}, {})


class TestR2rmlMapping:
    def _tables(self, spark):
        return _spark_tables(spark)

    def test_term_map_kinds_and_class(self, spark):
        from nlp_series_relation_extraction_spark.operators.rdb2rdf import (
            r2rml_mapping,
        )

        got = _collect(
            r2rml_mapping(
                self._tables(spark),
                [
                    {
                        "table": "people",
                        "subject": "p/{id}",
                        "class": "Person",
                        "predicate_objects": [
                            ("hasName", {"column": "name"}),
                            ("inDept", "d/{dept_id}"),
                            ("src", {"constant": "hr"}),
                        ],
                    }
                ],
            )
        )
        assert ("p/1", "rdf:type", "Person") in got
        assert ("p/1", "hasName", "ada") in got
        assert ("p/1", "inDept", "d/10") in got
        assert ("p/1", "src", "hr") in got

    def test_null_column_suppresses_one_triple_only(self, spark):
        from nlp_series_relation_extraction_spark.operators.rdb2rdf import (
            r2rml_mapping,
        )

        got = _collect(
            r2rml_mapping(
                self._tables(spark),
                [
                    {
                        "table": "people",
                        "subject": "p/{id}",
                        "predicate_objects": [
                            ("hasName", {"column": "name"}),
                            ("inDept", "d/{dept_id}"),
                        ],
                    }
                ],
            )
        )
        # row 2: name NULL -> no hasName, dept triple survives
        assert ("p/2", "inDept", "d/20") in got
        assert not any(s == "p/2" and p == "hasName" for s, p, _ in got)
        # row 3: dept NULL -> no inDept, name triple survives
        assert ("p/3", "hasName", "cy") in got
        assert not any(s == "p/3" and p == "inDept" for s, p, _ in got)

    def test_null_in_subject_template_suppresses_row(self, spark):
        from nlp_series_relation_extraction_spark.operators.rdb2rdf import (
            r2rml_mapping,
        )

        got = _collect(
            r2rml_mapping(
                self._tables(spark),
                [
                    {
                        "table": "people",
                        # name is NULL on row 2: that row maps to nothing
                        "subject": "p/{id}-{name}",
                        "predicate_objects": [("k", {"constant": "v"})],
                    }
                ],
            )
        )
        assert {s for s, _, _ in got} == {"p/1-ada", "p/3-cy"}

    def test_multi_column_template(self, spark):
        from nlp_series_relation_extraction_spark.operators.rdb2rdf import (
            r2rml_mapping,
        )

        got = _collect(
            r2rml_mapping(
                self._tables(spark),
                [
                    {
                        "table": "depts",
                        "subject": "d/{d_id}",
                        "predicate_objects": [
                            ("tag", "dept-{dname}-{d_id}"),
                        ],
                    }
                ],
            )
        )
        assert ("d/10", "tag", "dept-eng-10") in got

    def test_validation_errors(self, spark):
        from nlp_series_relation_extraction_spark.operators.rdb2rdf import (
            r2rml_mapping,
        )

        t = self._tables(spark)
        with pytest.raises(ValueError, match="unclosed"):
            r2rml_mapping(
                t, [{"table": "depts", "subject": "d/{d_id",
                     "predicate_objects": [("k", {"constant": "v"})]}]
            )
        with pytest.raises(ValueError, match="not in"):
            r2rml_mapping(
                t, [{"table": "depts", "subject": "d/{nope}",
                     "predicate_objects": [("k", {"constant": "v"})]}]
            )
        with pytest.raises(ValueError, match="not supported"):
            r2rml_mapping(
                t, [{"table": "depts", "subject": "d/{d_id}",
                     "predicate_objects": [("k", {"inverse": "x"})]}]
            )
        with pytest.raises(ValueError, match="emits nothing"):
            r2rml_mapping(t, [{"table": "depts", "subject": "d/{d_id}"}])

    def test_zero_join_plan(self, spark):
        from nlp_series_relation_extraction_spark.operators.rdb2rdf import (
            r2rml_mapping,
        )

        df = r2rml_mapping(
            self._tables(spark),
            [
                {
                    "table": "people",
                    "subject": "p/{id}",
                    "class": "Person",
                    "predicate_objects": [("inDept", "d/{dept_id}")],
                },
                {
                    "table": "depts",
                    "subject": "d/{d_id}",
                    "predicate_objects": [("hasName", {"column": "dname"})],
                },
            ],
        )
        txt = df._jdf.queryExecution().optimizedPlan().toString()
        assert "Join" not in txt

    def test_can_replay_the_direct_mapping(self, spark):
        """r2rml_mapping configured as the Direct Mapping of depts
        produces the identical triple set."""
        from nlp_series_relation_extraction_spark.operators.rdb2rdf import (
            direct_mapping,
            r2rml_mapping,
        )

        t = {"depts": self._tables(spark)["depts"]}
        dm = _collect(direct_mapping(t, {"depts": "d_id"}))
        rr = _collect(
            r2rml_mapping(
                t,
                [
                    {
                        "table": "depts",
                        "subject": "depts/d_id={d_id}",
                        "class": "depts",
                        "predicate_objects": [
                            ("depts#d_id", {"column": "d_id"}),
                            ("depts#dname", {"column": "dname"}),
                        ],
                    }
                ],
            )
        )
        assert rr == dm


class TestR2rmlReferencingObjectMap:
    """rr:parentTriplesMap + rr:joinCondition — the join path for
    parent subjects a child-side template cannot address."""

    def _tables(self, spark):
        return _spark_tables(spark)

    def test_ref_joins_to_parent_subject(self, spark):
        from nlp_series_relation_extraction_spark.operators.rdb2rdf import (
            r2rml_mapping,
        )

        # parent subject is built from dname, which people does NOT
        # hold: a template over dept_id cannot produce it.
        got = _collect(
            r2rml_mapping(
                self._tables(spark),
                [
                    {
                        "table": "people",
                        "subject": "p/{id}",
                        "predicate_objects": [
                            (
                                "worksIn",
                                {"ref": {
                                    "table": "depts",
                                    "join": [("dept_id", "d_id")],
                                }},
                            ),
                        ],
                    },
                    {
                        "table": "depts",
                        "subject": "dept/{dname}",
                        "predicate_objects": [
                            ("hasId", {"column": "d_id"}),
                        ],
                    },
                ],
            )
        )
        assert ("p/1", "worksIn", "dept/eng") in got
        assert ("p/2", "worksIn", "dept/ops") in got
        # row 3 has NULL dept_id: inner-join semantics drop it
        assert not any(s == "p/3" and p == "worksIn" for s, p, _ in got)
        # the parent map still emits its own triples
        assert ("dept/eng", "hasId", "10") in got

    def test_explicit_subject_override_and_broadcast_plan(self, spark):
        from nlp_series_relation_extraction_spark.operators.rdb2rdf import (
            r2rml_mapping,
        )

        df = r2rml_mapping(
            self._tables(spark),
            [
                {
                    "table": "people",
                    "subject": "p/{id}",
                    "predicate_objects": [
                        (
                            "worksIn",
                            {"ref": {
                                "table": "depts",
                                "join": [("dept_id", "d_id")],
                                "subject": "D:{dname}:{d_id}",
                                "broadcast": True,
                            }},
                        ),
                    ],
                },
            ],
        )
        got = _collect(df)
        assert got == {
            ("p/1", "worksIn", "D:eng:10"),
            ("p/2", "worksIn", "D:ops:20"),
        }
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan

    def test_parent_pruned_before_join(self, spark):
        """Only join keys + subject-template columns of the parent
        reach the join: extra parent columns never shuffle."""
        from nlp_series_relation_extraction_spark.operators.rdb2rdf import (
            r2rml_mapping,
        )

        t = self._tables(spark)
        t["depts"] = t["depts"].withColumn(
            "huge_payload", F_lit("x" * 10)
        )
        df = r2rml_mapping(
            t,
            [
                {
                    "table": "people",
                    "subject": "p/{id}",
                    "predicate_objects": [
                        ("worksIn", {"ref": {
                            "table": "depts",
                            "join": [("dept_id", "d_id")],
                            "subject": "dept/{dname}",
                        }}),
                    ],
                },
            ],
        )
        txt = df._jdf.queryExecution().optimizedPlan().toString()
        assert "huge_payload" not in txt

    def test_composite_join_condition(self, spark):
        from nlp_series_relation_extraction_spark.operators.rdb2rdf import (
            r2rml_mapping,
        )

        t = {
            "child": spark.createDataFrame(
                [(1, "a", 7), (2, "b", 8), (3, "a", 8)],
                "cid int, k1 string, k2 int",
            ),
            "parent": spark.createDataFrame(
                [("a", 7, "P1"), ("b", 8, "P2")],
                "p1 string, p2 int, pname string",
            ),
        }
        got = _collect(
            r2rml_mapping(
                t,
                [
                    {
                        "table": "child",
                        "subject": "c/{cid}",
                        "predicate_objects": [
                            ("ref", {"ref": {
                                "table": "parent",
                                "join": [("k1", "p1"), ("k2", "p2")],
                                "subject": "P/{pname}",
                            }}),
                        ],
                    },
                ],
            )
        )
        # (a,8) matches neither composite key
        assert got == {("c/1", "ref", "P/P1"), ("c/2", "ref", "P/P2")}

    def test_ref_validation_errors(self, spark):
        from nlp_series_relation_extraction_spark.operators.rdb2rdf import (
            r2rml_mapping,
        )

        t = self._tables(spark)

        def _one(spec):
            return [{
                "table": "people",
                "subject": "p/{id}",
                "predicate_objects": [("x", {"ref": spec})],
            }]

        with pytest.raises(ValueError, match="missing 'table'"):
            r2rml_mapping(t, _one({"join": [("dept_id", "d_id")]}))
        with pytest.raises(ValueError, match="not in"):
            r2rml_mapping(
                t, _one({"table": "nope", "join": [("dept_id", "d_id")]})
            )
        with pytest.raises(ValueError, match=">=1 join"):
            r2rml_mapping(t, _one({"table": "depts", "join": []}))
        with pytest.raises(ValueError, match="child column"):
            r2rml_mapping(
                t, _one({"table": "depts", "join": [("nope", "d_id")],
                         "subject": "d/{d_id}"})
            )
        with pytest.raises(ValueError, match="parent column"):
            r2rml_mapping(
                t, _one({"table": "depts", "join": [("dept_id", "nope")],
                         "subject": "d/{d_id}"})
            )
        # no triples map declares depts -> needs explicit subject
        with pytest.raises(ValueError, match="explicit 'subject'"):
            r2rml_mapping(
                t, _one({"table": "depts", "join": [("dept_id", "d_id")]})
            )
        # a ref term map must be exactly {"ref": ...}
        with pytest.raises(ValueError, match="exactly"):
            r2rml_mapping(
                t,
                [{
                    "table": "people",
                    "subject": "p/{id}",
                    "predicate_objects": [
                        ("x", {"ref": {"table": "depts",
                                       "join": [("dept_id", "d_id")],
                                       "subject": "d/{d_id}"},
                               "column": "name"}),
                    ],
                }],
            )


class TestR2rmlTermsAndQuads:
    """rr:termType / rr:language / rr:datatype / rr:graphMap."""

    def _tables(self, spark):
        return _spark_tables(spark)

    def test_terms_output_metadata(self, spark):
        from nlp_series_relation_extraction_spark.operators.rdb2rdf import (
            r2rml_mapping,
        )
        out = r2rml_mapping(
            self._tables(spark),
            [{"table": "depts", "subject": "d/{d_id}",
              "class": "Dept",
              "predicate_objects": [
                  ("name", {"column": "dname", "language": "en"}),
                  ("size", {"constant": "9",
                            "datatype": "xsd:integer"}),
                  ("home", {"template": "iri/{d_id}"}),
                  ("node", {"template": "b{d_id}",
                            "term_type": "BlankNode"}),
              ]}],
            output="terms",
        )
        got = {tuple(r) for r in out.collect()}
        assert ("d/10", "name", "eng", "literal", "en", None) in got
        assert ("d/10", "size", "9", "literal", None, "xsd:integer") in got
        assert ("d/10", "home", "iri/10", "iri", None, None) in got
        assert ("d/10", "node", "b10", "bnode", None, None) in got
        assert ("d/10", "rdf:type", "Dept", "iri", None, None) in got

    def test_column_defaults_to_literal_template_to_iri(self, spark):
        from nlp_series_relation_extraction_spark.operators.rdb2rdf import (
            r2rml_mapping,
        )
        out = r2rml_mapping(
            self._tables(spark),
            [{"table": "depts", "subject": "d/{d_id}",
              "predicate_objects": [
                  ("name", {"column": "dname"}),
                  ("ref", "x/{d_id}"),
              ]}],
            output="terms",
        )
        kinds = {(r.predicate, r.obj_kind) for r in out.collect()}
        assert kinds == {("name", "literal"), ("ref", "iri")}

    def test_language_datatype_exclusive(self, spark):
        from nlp_series_relation_extraction_spark.operators.rdb2rdf import (
            r2rml_mapping,
        )
        with pytest.raises(ValueError, match="mutually exclusive"):
            r2rml_mapping(
                self._tables(spark),
                [{"table": "depts", "subject": "d/{d_id}",
                  "predicate_objects": [
                      ("name", {"column": "dname", "language": "en",
                                "datatype": "xsd:string"}),
                  ]}],
            )

    def test_meta_on_non_literal_raises(self, spark):
        from nlp_series_relation_extraction_spark.operators.rdb2rdf import (
            r2rml_mapping,
        )
        with pytest.raises(ValueError, match="require term type Literal"):
            r2rml_mapping(
                self._tables(spark),
                [{"table": "depts", "subject": "d/{d_id}",
                  "predicate_objects": [
                      ("name", {"column": "dname", "language": "en",
                                "term_type": "IRI"}),
                  ]}],
            )

    def test_quads_graph_template_and_default(self, spark):
        from nlp_series_relation_extraction_spark.operators.rdb2rdf import (
            r2rml_mapping,
        )
        out = r2rml_mapping(
            self._tables(spark),
            [{"table": "depts", "subject": "d/{d_id}",
              "graph": "g/{dname}",
              "predicate_objects": [("name", {"column": "dname"})]},
             {"table": "people", "subject": "p/{id}",
              "predicate_objects": [("pid", {"column": "id"})]}],
            output="quads",
        )
        got = {(r.graph, r.subj, r.predicate, r.obj)
               for r in out.collect()}
        assert ("g/eng", "d/10", "name", "eng") in got
        assert ("", "p/1", "pid", "1") in got      # no graph map: default

    def test_null_graph_term_suppresses_quad(self, spark):
        from nlp_series_relation_extraction_spark.operators.rdb2rdf import (
            r2rml_mapping,
        )
        out = r2rml_mapping(
            self._tables(spark),
            [{"table": "people", "subject": "p/{id}",
              "graph": "g/{name}",          # name NULL for id=2
              "predicate_objects": [("pid", {"column": "id"})]}],
            output="quads",
        )
        subjects = {r.subj for r in out.collect()}
        assert subjects == {"p/1", "p/3"}

    def test_referencing_map_carries_graph_and_kind(self, spark):
        from nlp_series_relation_extraction_spark.operators.rdb2rdf import (
            r2rml_mapping,
        )
        out = r2rml_mapping(
            self._tables(spark),
            [{"table": "people", "subject": "p/{id}",
              "graph": {"constant": "gP"},
              "predicate_objects": [
                  ("inDept", {"ref": {"table": "depts",
                                      "join": [("dept_id", "d_id")],
                                      "broadcast": True}}),
              ]},
             {"table": "depts", "subject": "dept/{dname}",
              "predicate_objects": [("dn", {"column": "dname"})]}],
            output="quads",
        )
        ref_rows = {tuple(r) for r in out.collect()
                    if r.predicate == "inDept"}
        assert ref_rows == {
            ("gP", "p/1", "inDept", "dept/eng", "iri", None, None),
            ("gP", "p/2", "inDept", "dept/ops", "iri", None, None),
        }

    def test_triples_output_unchanged_shape(self, spark):
        from nlp_series_relation_extraction_spark.operators.rdb2rdf import (
            r2rml_mapping,
        )
        out = r2rml_mapping(
            self._tables(spark),
            [{"table": "depts", "subject": "d/{d_id}",
              "predicate_objects": [
                  ("name", {"column": "dname", "language": "en"})]}],
        )
        assert out.columns == ["subj", "predicate", "obj"]

    def test_bad_output_raises(self, spark):
        from nlp_series_relation_extraction_spark.operators.rdb2rdf import (
            r2rml_mapping,
        )
        with pytest.raises(ValueError, match="output"):
            r2rml_mapping(
                self._tables(spark),
                [{"table": "depts", "subject": "d/{d_id}",
                  "predicate_objects": [("n", {"column": "dname"})]}],
                output="ntriples",
            )
