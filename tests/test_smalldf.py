"""local_df: JVM-local small constant frames (round-6 optimization) —
row parity with createDataFrame, plan shape (no Python RDD scan), and
the fallback paths."""

import pytest

from nlp_series_relation_extraction_spark.functions.smalldf import (
    MAX_LOCAL_ROWS,
    local_df,
)


# session-scoped ``spark`` fixture comes from tests/conftest.py


ROWS = [("a", 1, 0.5), ("b", 2, None), (None, 3, 2.25)]
DDL = "s string, n long, x double"


def test_rows_match_createdataframe(spark):
    got = set(map(tuple, local_df(spark, ROWS, DDL).collect()))
    want = set(map(tuple, spark.createDataFrame(ROWS, DDL).collect()))
    assert got == want
    assert [f.dataType for f in local_df(spark, ROWS, DDL).schema] == [
        f.dataType for f in spark.createDataFrame(ROWS, DDL).schema
    ]


def test_plan_is_jvm_local_no_python_rdd(spark):
    plan = local_df(spark, ROWS, DDL)._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" not in plan  # the python-parallelize scan


def test_empty_frame_schema(spark):
    df = local_df(spark, [], DDL)
    assert df.count() == 0
    assert [f.name for f in df.schema] == ["s", "n", "x"]


def test_array_column(spark):
    df = local_df(spark, [([1.0, 2.0],), (None,)], "v array<double>")
    got = [r.v for r in df.collect()]
    assert sorted(got, key=lambda v: (v is None, v)) in (
        [[1.0, 2.0], None],
        [None, [1.0, 2.0]],
    ) or set(map(lambda v: tuple(v) if v else None, got)) == {
        (1.0, 2.0),
        None,
    }


def test_fallback_on_map_type(spark):
    rows = [({"k": "v"},)]
    df = local_df(spark, rows, "m map<string,string>")
    assert df.collect()[0].m == {"k": "v"}


def test_fallback_on_many_rows(spark):
    rows = [(i,) for i in range(MAX_LOCAL_ROWS + 10)]
    df = local_df(spark, rows, "n long")
    assert df.count() == MAX_LOCAL_ROWS + 10
