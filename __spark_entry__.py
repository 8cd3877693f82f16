"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: full KG extraction (mpn cascade-pointer head,
planted fixtures) over deterministic synthetic transcripts sized from
/root/testdata/sf0.001, returning the extracted triple table.

``queries()`` / ``oracle_sql()`` — operator coverage from SURVEY.md §2 plus
the training-data-pipeline operators; SQL-expressible ones carry a DuckDB
oracle (identical column names & dtypes), KG-head extraction entries are
rows-only (their exactness is pytest-verified against a plain-Python oracle
and a planted-gold roundtrip at P/R == 1.0).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nlp_series_relation_extraction_spark.plans import queries as _Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _Q.queries()["kg_extract_mpn"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _Q.queries()


def oracle_sql() -> dict[str, str]:
    return _Q.oracle_sql()
