"""JVM-local construction of SMALL constant DataFrames.

``spark.createDataFrame(py_rows, ddl)`` compiles to ``Scan ExistingRDD``
over a Python ``parallelize`` — defaultParallelism tasks, each paying a
Python-worker round trip, re-executed EVERY time the frame is scanned
(and a broadcast-exchange build is a scan, so an ontology table joined
in a fixpoint loop pays it once per join per round). Measured on this
install (local[32]): ~440 ms per action for a 5-row table vs ~114 ms
for the same rows as a ``LocalTableScan`` (pure job overhead); the
owl_class event log showed 0.5-1.8 s broadcast-build stages doing
nothing but re-materializing 5-row Python RDDs (guide §4: eliminate the
Python boundary — here the boundary was smuggled in by the *driver*).

``local_df`` builds the same rows as a literal expression tree
(``inline(array(struct(lit(...))))`` over ``range(1)``) — analyzed and
constant-folded JVM-side, no Python workers, no RDD. Falls back to
``createDataFrame`` for anything big or non-atomic (maps, nested rows),
so call sites can switch unconditionally. Literal values are the same
Python objects either way, so results are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    AtomicType,
    ArrayType,
    StructType,
)

# beyond this the literal expression tree costs more to analyze than the
# python-RDD scan costs to run; createDataFrame also streams better
MAX_LOCAL_ROWS = 512


def _lit_value(v, dtype):
    if isinstance(dtype, ArrayType):
        if v is None:
            return F.lit(None).cast(dtype)
        return F.array(
            *[_lit_value(x, dtype.elementType) for x in v]
        ).cast(dtype)
    return F.lit(v).cast(dtype)


def _supported(dtype) -> bool:
    if isinstance(dtype, AtomicType):
        return True
    if isinstance(dtype, ArrayType):
        return isinstance(dtype.elementType, AtomicType)
    return False


def local_df(spark: SparkSession, rows, schema) -> DataFrame:
    """Small constant DataFrame as a JVM-local relation; falls back to
    ``spark.createDataFrame`` when rows are many or types non-atomic.
    ``schema``: DDL string ("a string, b long") or StructType."""
    st = (
        StructType.fromDDL(schema) if isinstance(schema, str) else schema
    )
    rows = list(rows)
    if (
        len(rows) > MAX_LOCAL_ROWS
        or not all(_supported(f.dataType) for f in st.fields)
    ):
        return spark.createDataFrame(rows, schema)
    if not rows:
        return spark.range(0).select(
            *[
                F.lit(None).cast(f.dataType).alias(f.name)
                for f in st.fields
            ]
        )
    structs = [
        F.struct(
            *[
                _lit_value(v, f.dataType).alias(f.name)
                for f, v in zip(st.fields, row)
            ]
        )
        for row in rows
    ]
    return spark.range(1).select(F.inline(F.array(*structs)))
