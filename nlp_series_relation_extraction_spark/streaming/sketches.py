"""Continuously-maintained sketches over streams.

The batch sketch builds (functions/sketch.py) are pure groupBy
aggregations whose merge operators are associative and commutative (MAX
for HLL registers, SUM for count-min cells) — exactly the algebra
Structured Streaming's state store maintains incrementally. So the SAME
plan runs on a stream: each micro-batch's partial registers/cells fold
into the state, and the state IS the sketch — constant-size (<= 2^p
registers / d*w cells) no matter how long the stream runs, which is what
makes "distinct users so far" and "hot keys so far" answerable at
transcript-firehose rates without ever re-scanning history.

Restart-safety comes from the checkpoint: a query resumed with
availableNow drains only new files and its state still equals the
from-scratch batch sketch over everything seen — asserted in
tests/test_pipeline_io_streaming.py (stream==batch and
resume-increment==batch).

Emit with outputMode("complete") (the sketch is tiny) or wrap in
foreachBatch to publish the estimate row per micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..functions.sketch import cm_sketch, hll_registers


def hll_registers_stream(stream: DataFrame, key_col: str) -> DataFrame:
    """Streaming HLL register maintenance: same plan as the batch build;
    state = the register table (bounded by 2^HLL_P rows)."""
    return hll_registers(stream, key_col)


def cm_sketch_stream(stream: DataFrame, key_col: str) -> DataFrame:
    """Streaming count-min cell maintenance: state = the d×w cell table."""
    return cm_sketch(stream, key_col)
