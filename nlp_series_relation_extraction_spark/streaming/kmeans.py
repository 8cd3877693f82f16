"""Continuously-maintained cluster census against a trained k-means model.

Same-plan-on-stream pattern as streaming/sketches.py: the batch census
(functions/distml.py:kmeans_census) is a SUM aggregation over a bounded
key space — (cluster, pos) with k*(d+1) keys — against FROZEN broadcast
centroids, and integer (quantized) sums make the fold order-free. That is
exactly the algebra Structured Streaming's state store maintains
incrementally, so the state after draining a stream equals the batch
census over everything seen (pinned with resume in
tests/test_pipeline_io_streaming.py).

Use: train centroids once (distml.kmeans_fit, or the bounded-sample fit),
then keep a LIVE census of an embedding firehose — per-cluster counts and
running means — and monitor drift: when a cluster's running mean
(s[c, :] / (quant * n_c)) wanders from its centroid, the live data has
shifted from the training distribution and the model needs a re-fit. The
state is k*(d+1) rows no matter how long the stream runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..functions.distml import kmeans_census


def kmeans_census_stream(
    stream: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: "np.ndarray",
    quant: int = 1000,
) -> DataFrame:
    """Streaming census maintenance: same plan as the batch build; state
    = the (cluster, pos) -> integer-sum table (k*(d+1) rows)."""
    return kmeans_census(stream, id_col, vec_col, centroids, quant=quant)
