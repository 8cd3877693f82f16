"""Deterministic R-MAT generator (sources/synthetic.py:rmat_edges):
bit-exact against the pure-python md5 twin, structurally skewed (the
point of R-MAT), and stable under partitioning — the fixture-free
benchmark-graph source."""

from nlp_series_relation_extraction_spark.sources.synthetic import (
    rmat_edges,
    rmat_edges_python,
)


def test_edges_bit_exact_vs_python_twin(spark):
    got = sorted(tuple(r) for r in rmat_edges(spark, 300, 9).collect())
    assert got == sorted(rmat_edges_python(300, 9))


def test_partitioning_does_not_change_edges(spark):
    a = sorted(
        tuple(r) for r in rmat_edges(spark, 500, 10).repartition(13).collect()
    )
    b = sorted(tuple(r) for r in rmat_edges(spark, 500, 10).collect())
    assert a == b


def test_degree_skew_is_power_law_shaped(spark):
    e = rmat_edges(spark, 8_000, 11)
    degs = [
        r["d"]
        for r in e.groupBy("src").agg(
            __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("d")
        ).collect()
    ]
    mean = sum(degs) / len(degs)
    assert max(degs) > 6 * mean  # hub far above average: R-MAT skew
    assert min(degs) >= 1


def test_vertex_ids_bounded_by_scale(spark):
    rows = rmat_edges(spark, 400, 8).collect()
    for r in rows:
        assert 0 <= r["src"] < 256 and 0 <= r["dst"] < 256
