"""Data-layout planning: Z-order (Morton) clustering and its pruning
payoff, measured.

The 100-TB fact: a table file-clustered on ONE key prunes scans on
that key only; a two-dimensional box query (part × supplier, user ×
time...) over a naturally-loaded table touches nearly every file.
Interleaving the key bits (the Morton / Z-order curve — the technique
behind Delta's and Iceberg's OPTIMIZE ZORDER) gives every file a
small min/max rectangle in BOTH dimensions, so file-skipping works
for 2-D predicates.

This module keeps the whole story deterministic and engine-portable:

* `morton_code_expr(x, y, bits)` — the bit-interleave as one closed-
  form SQL expression (shift/mask/or terms, no UDF, no loop state);
  identical text runs on Spark and DuckDB.
* `zorder_pruning_report` — instead of physical files (layout-
  dependent, not reproducible in a test), buckets are ntile(n) over
  a SORT ORDER: 'natural' (the incoming key order) vs 'zorder' (the
  Morton code). Per bucket the min/max of both dims form the skip
  rectangle; a box predicate then touches a bucket iff the ranges
  overlap — exactly the file-skipping arithmetic of a real table
  format, computed on stand-in buckets. Output compares layouts:
  (layout, n_buckets, n_touched, touched_ppm, n_rows_in_box).

At real scale the same Morton column feeds repartitionByRange +
sortWithinPartitions before the write; the report is the evidence the
rewrite pays before you burn the cluster time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def morton_code_expr(x: str, y: str, bits: int = 16) -> str:
    """SQL expression interleaving the low ``bits`` of ``x`` (even
    positions) and ``y`` (odd positions) into a single BIGINT Morton
    code. 2*bits <= 62 keeps everything positive."""
    if bits < 1 or bits > 31:
        raise ValueError(f"morton_code_expr: bits must be 1..31: {bits}")
    terms = []
    for i in range(bits):
        terms.append(f"(shiftleft((shiftright({x}, {i}) & 1), {2 * i}))")
        terms.append(f"(shiftleft((shiftright({y}, {i}) & 1), {2 * i + 1}))")
    return "(" + " | ".join(terms) + ")"


def _morton_sql(x: str, y: str, bits: int) -> str:
    """DuckDB spelling of the same interleave (operator shifts)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def zorder_pruning_report(
    df: DataFrame,
    x_col: str,
    y_col: str,
    x_range: tuple,
    y_range: tuple,
    n_buckets: int = 64,
    bits: int = 16,
) -> DataFrame:
    """Measure the file-skipping payoff of Z-ordering ``df`` on
    (x_col, y_col) for the box predicate x in x_range, y in y_range.
    Two stand-in layouts, each ntile(n_buckets) over a sort order:

      natural — ordered by (x, y): the single-key clustering a
                sorted-on-x load produces;
      zorder  — ordered by the Morton interleave.

    Per bucket, min/max of both dims form the skip rectangle; the
    bucket is 'touched' iff both ranges overlap the box. Returns one
    row per layout: (layout, n_buckets, n_touched, touched_ppm,
    n_rows_in_box) — n_rows_in_box is layout-invariant (sanity
    anchor); touched_ppm is the scan fraction a skipping reader pays.

    Scale shape: the Morton code is a projection; each layout costs
    one global-sort window (ntile) + one bucket aggregation. At real
    scale you'd sample instead of sorting everything — this report's
    contract is exactness for the oracle, so it sorts; n_buckets rows
    out."""
    if n_buckets < 2:
        raise ValueError(
            f"zorder_pruning_report: n_buckets must be >= 2: {n_buckets}"
        )
    from pyspark.sql import Window

    x_lo, x_hi = int(x_range[0]), int(x_range[1])
    y_lo, y_hi = int(y_range[0]), int(y_range[1])
    base = df.select(
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    ).withColumn("z", F.expr(morton_code_expr("x", "y", bits)))

    def layout(name: str, order_cols) -> DataFrame:
        w = Window.orderBy(*order_cols)
        b = base.withColumn("bucket", F.ntile(n_buckets).over(w))
        agg = b.groupBy("bucket").agg(
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
        )
        touched = agg.select(
            (
                (F.col("x_min") <= F.lit(x_hi))
                & (F.col("x_max") >= F.lit(x_lo))
                & (F.col("y_min") <= F.lit(y_hi))
                & (F.col("y_max") >= F.lit(y_lo))
            )
            .cast("long")
            .alias("t")
        ).agg(
            F.lit(name).alias("layout"),
            F.count("*").cast("long").alias("n_buckets"),
            F.sum("t").cast("long").alias("n_touched"),
        )
        return touched

    in_box = base.where(
        F.col("x").between(x_lo, x_hi) & F.col("y").between(y_lo, y_hi)
    ).agg(F.count("*").cast("long").alias("n_rows_in_box"))

    nat = layout("natural", [F.col("x"), F.col("y"), F.col("z")])
    zo = layout("zorder", [F.col("z"), F.col("x"), F.col("y")])
    return (
        nat.unionByName(zo)
        .crossJoin(F.broadcast(in_box))
        .select(
            "layout",
            "n_buckets",
            "n_touched",
            F.expr("n_touched * 1000000 div n_buckets").alias(
                "touched_ppm"
            ),
            "n_rows_in_box",
        )
    )
