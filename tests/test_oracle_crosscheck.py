"""In-tree replica of the driver's correctness gate: every oracle_sql()
entry is executed in DuckDB against the sf0.001 parquet tables and compared
to the Spark query's result — column names sorted, rows sorted, dtypes
strict, null-safe. Catches Spark/SQL drift before the driver does."""

import os

import duckdb
import pandas as pd
import pytest

from nlp_series_relation_extraction_spark.plans import queries as Q

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF), reason="driver test data not present"
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from '{SF}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(Q.oracle_sql().keys()))
def test_oracle_matches_spark(spark, duck, name):
    s = Q.queries()[name](spark, SF).toPandas()
    o = duck.execute(Q.oracle_sql()[name]).fetchdf()
    cols = sorted(s.columns)
    assert cols == sorted(o.columns), (cols, sorted(o.columns))
    s = s[cols].sort_values(cols).reset_index(drop=True)
    o = o[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(s, o, check_dtype=True)
