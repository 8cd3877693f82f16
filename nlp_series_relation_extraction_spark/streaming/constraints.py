"""Live ontology-violation monitor over a typed edge stream.

Same-plan-on-stream pattern as streaming/kmeans.py: induce the
domain/range schema ONCE on trusted batch data (operators/graph.py:
constraint_violations' modal induction), freeze it, and keep per-
predicate violation counts over the incoming edge firehose. The counts
(n_triples, n_domain_violations, n_range_violations) are plain SUMs
keyed on a schema-sized space — exactly the mergeable algebra the
Structured Streaming state store maintains incrementally, so the state
after draining the stream equals the batch count over everything seen
(pinned with checkpoint-resume in tests/test_pipeline_io_streaming.py).

Use: a KG build publishes its induced ontology, then watches extraction
output continuously — a rising violation_ppm on a predicate means the
upstream extractor (or the source distribution) drifted and the triples
flowing into the edge table no longer match the published schema. State
is #predicates rows no matter how long the stream runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.graph import violations_against_schema


def violation_monitor_stream(
    stream: DataFrame, schema: DataFrame
) -> DataFrame:
    """Streaming violation counts against a FROZEN (predicate,
    domain_type, range_type) schema; same plan as the batch count."""
    return violations_against_schema(stream, schema)
