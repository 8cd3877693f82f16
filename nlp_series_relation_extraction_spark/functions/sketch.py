"""Mergeable sketches for corpus-scale statistics.

At 100 TB, "how many distinct users / URLs / n-grams" and "which keys are
hot" cannot afford an exact shuffle of every key: a count-distinct over a
trillion rows shuffles the full key set, and a top-k needs the same. The
standard answer is a *mergeable sketch*: a constant-size summary each
partition builds locally (map-side partial aggregation) and the reducer
merges associatively — network traffic is O(sketch size × partitions), not
O(rows).

Both sketches here are *cross-engine deterministic* (the repo's oracle
discipline, cf. functions/dedup.py): hashing is md5-hex based, register
math is integer-only (`length(bin(v))` = bit length in both Spark and
DuckDB), so the DuckDB oracle reproduces every register and estimate
bit-for-bit — an approximate algorithm with an EXACT correctness gate.

* HyperLogLog      — p-bit register index + leading-zero rank from one md5;
                     registers merge by MAX. The estimate uses the classic
                     alpha_m * m^2 / sum(2^-M_j) with the small-range
                     linear-counting correction (Flajolet et al. 2007).
                     The 2^-M_j sum is carried as an exact integer
                     (scaled by 2^MAX_RANK) so both engines agree on every
                     bit before the single final float division.
* Count-min        — d independent md5 hash rows × w buckets; cells merge
                     by SUM; a key's frequency estimate is the MIN over its
                     d cells (Cormode & Muthukrishnan 2005) — always an
                     over-estimate, never under. Heavy hitters = keys whose
                     estimate clears a total-fraction threshold (integer
                     cross-multiplied, no float compare).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# --- HyperLogLog -------------------------------------------------------------

HLL_P = 12  # 2^12 = 4096 registers -> ~1.6% typical relative error
HLL_M = 1 << HLL_P
# rank is computed over the 32 bits following the register index; ranks are
# in 1..33 (33 = all 32 bits zero), so 2^(MAX_RANK - rank) is an exact int.
HLL_MAX_RANK = 33
# alpha_m for m >= 128 (Flajolet et al. 2007, fig. 3)
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def hll_registers(df: DataFrame, key_col: str) -> DataFrame:
    """(idx, max_rho): the HLL register table for the distinct values of
    ``key_col`` — at most 2^p rows regardless of input size.

    idx = first 3 md5 hex chars (12 bits); the rank rho = leading-zero
    count of the next 32 bits + 1. groupBy(idx).max(rho) is the whole
    sketch build: Catalyst's partial aggregation makes every partition
    emit <= m rows, so the single shuffle moves O(m × partitions) rows —
    the property that makes this the 100-TB count-distinct."""
    h = F.md5(F.col(key_col).cast("string"))
    idx = F.conv(F.substring(h, 1, 3), 16, 10).cast("int")
    v = F.conv(F.substring(h, 4, 8), 16, 10).cast("bigint")
    # leading zeros of a 32-bit value via bit length: bin(v) has no leading
    # zeros in either engine, so bit_length = length(bin(v)); v = 0 -> rank
    # MAX_RANK (all 32 bits zero).
    rho = F.when(v == 0, F.lit(HLL_MAX_RANK)).otherwise(
        F.lit(33) - F.length(F.bin(v))
    )
    return (
        df.where(F.col(key_col).isNotNull())
        .select(idx.alias("idx"), rho.alias("rho"))
        .groupBy("idx")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_estimate(registers: DataFrame) -> DataFrame:
    """One row: (m, n_filled, s_scaled, est_hll, est_linear, est).

    s_scaled = sum over ALL m registers of 2^(MAX_RANK - M_j) with empty
    registers at M_j = 0 — an exact bigint both engines agree on, so the
    raw estimate alpha*m^2*2^MAX_RANK/s differs only by one shared float
    division. Small-range correction: when est_hll <= 2.5m and empty
    registers exist, linear counting m*ln(m/V) is the better estimator
    (est_linear, and `est` picks it); both sides are rounded to 2 decimals
    AFTER the branch so the oracle's branch decision is identical."""
    agg = registers.agg(
        F.count("*").cast("bigint").alias("n_filled"),
        F.coalesce(
            F.sum(F.expr(f"shiftleft(1L, {HLL_MAX_RANK} - max_rho)")),
            F.lit(0).cast("bigint"),
        ).alias("s_filled"),
    )
    m = F.lit(HLL_M).cast("bigint")
    zeros = (m - F.col("n_filled")).alias("n_zero")
    s_scaled = (
        F.col("s_filled")
        + (m - F.col("n_filled")) * F.lit(1 << HLL_MAX_RANK).cast("bigint")
    ).alias("s_scaled")
    out = agg.select(m.alias("m"), F.col("n_filled"), zeros, s_scaled)
    est_raw = (
        F.lit(HLL_ALPHA)
        * F.lit(float(HLL_M))
        * F.lit(float(HLL_M))
        * F.lit(float(1 << HLL_MAX_RANK))
        / F.col("s_scaled").cast("double")
    )
    est_lin = F.when(
        F.col("n_zero") > 0,
        F.lit(float(HLL_M)) * F.log(m.cast("double") / F.col("n_zero").cast("double")),
    ).otherwise(est_raw)
    chosen = F.when(
        (est_raw <= F.lit(2.5 * HLL_M)) & (F.col("n_zero") > 0), est_lin
    ).otherwise(est_raw)
    return out.select(
        "m",
        "n_filled",
        "s_scaled",
        F.round(est_raw, 2).alias("est_hll"),
        F.round(est_lin, 2).alias("est_linear"),
        F.round(chosen, 2).alias("est"),
    )


def hll_distinct(df: DataFrame, key_col: str) -> DataFrame:
    """End-to-end approximate count-distinct: one row (see hll_estimate)."""
    return hll_estimate(hll_registers(df, key_col))


def hll_sql(table: str, key_col: str) -> str:
    """DuckDB twin of hll_distinct — bit-identical registers and estimate."""
    return f"""
WITH hashed AS (
  SELECT md5(cast({key_col} AS VARCHAR)) AS h
  FROM {table} WHERE {key_col} IS NOT NULL
), rows_ AS (
  SELECT cast(concat('0x', substr(h, 1, 3)) AS BIGINT) AS idx,
         cast(concat('0x', substr(h, 4, 8)) AS BIGINT) AS v
  FROM hashed
), regs AS (
  SELECT idx,
         max(CASE WHEN v = 0 THEN {HLL_MAX_RANK}
                  ELSE 33 - length(bin(v)) END) AS max_rho
  FROM rows_ GROUP BY idx
), agg AS (
  SELECT cast(count(*) AS BIGINT) AS n_filled,
         cast(coalesce(sum((1::BIGINT << ({HLL_MAX_RANK} - max_rho))), 0)
              AS BIGINT) AS s_filled
  FROM regs
), wide AS (
  SELECT cast({HLL_M} AS BIGINT) AS m, n_filled,
         cast({HLL_M} AS BIGINT) - n_filled AS n_zero,
         s_filled + (cast({HLL_M} AS BIGINT) - n_filled)
                    * (1::BIGINT << {HLL_MAX_RANK}) AS s_scaled
  FROM agg
), est AS (
  SELECT *,
         {HLL_ALPHA!r}::DOUBLE * {float(HLL_M)!r}::DOUBLE * {float(HLL_M)!r}::DOUBLE
           * {float(1 << HLL_MAX_RANK)!r}::DOUBLE / cast(s_scaled AS DOUBLE) AS e_raw,
         CASE WHEN n_zero > 0
              THEN {float(HLL_M)!r}::DOUBLE * ln(cast(m AS DOUBLE) / cast(n_zero AS DOUBLE))
              ELSE {HLL_ALPHA!r}::DOUBLE * {float(HLL_M)!r}::DOUBLE * {float(HLL_M)!r}::DOUBLE
                   * {float(1 << HLL_MAX_RANK)!r}::DOUBLE / cast(s_scaled AS DOUBLE)
         END AS e_lin
  FROM wide
)
SELECT m, n_filled, s_scaled,
       round(e_raw, 2) AS est_hll,
       round(e_lin, 2) AS est_linear,
       round(CASE WHEN e_raw <= {2.5 * HLL_M!r}::DOUBLE AND n_zero > 0
                  THEN e_lin ELSE e_raw END, 2) AS est
FROM est
"""


# --- Count-min sketch --------------------------------------------------------

CM_DEPTH = 4
CM_WIDTH = 512


def _cm_bucket(j: int, key):
    h = F.md5(F.concat(F.lit(f"{j}#"), key.cast("string")))
    return F.conv(F.substring(h, 1, 7), 16, 10).cast("bigint") % CM_WIDTH


def cm_sketch(df: DataFrame, key_col: str) -> DataFrame:
    """(j, bucket, cnt): the d×w count-min cell table — at most
    CM_DEPTH * CM_WIDTH rows however large the input. Each input row
    increments one bucket per hash row; partial aggregation combines
    per-partition, so the shuffle is sketch-sized."""
    key = F.col(key_col)
    cells = F.array(
        *[
            F.struct(F.lit(j).alias("j"), _cm_bucket(j, key).alias("bucket"))
            for j in range(CM_DEPTH)
        ]
    )
    return (
        df.where(key.isNotNull())
        .select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.j").alias("j"), F.col("c.bucket").alias("bucket"))
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )


def cm_estimate(sketch: DataFrame, keys: DataFrame, key_col: str) -> DataFrame:
    """(key_col, est): frequency estimate per key = min over the d cells the
    key hashes into. The sketch side is tiny — broadcast — so estimating any
    number of keys is a map-side join."""
    key = F.col(key_col)
    probes = keys.select(
        key,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"), _cm_bucket(j, key).alias("bucket")
                    )
                    for j in range(CM_DEPTH)
                ]
            )
        ).alias("c"),
    ).select(key_col, F.col("c.j").alias("j"), F.col("c.bucket").alias("bucket"))
    # LEFT join + coalesce(0): a probed (j, bucket) with no cell row means
    # NOTHING hashed there — its count is 0, and the min over the d cells
    # must see it. An inner join would silently drop empty cells, turning
    # a never-seen key's estimate into min-over-nonzero-cells (arbitrarily
    # wrong) or dropping the key from the output entirely.
    return (
        probes.join(F.broadcast(sketch), ["j", "bucket"], "left")
        .groupBy(key_col)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("bigint"))).alias(
                "est"
            )
        )
    )


def cm_heavy_hitters(
    df: DataFrame, key_col: str, fraction_ppm: int = 10_000
) -> DataFrame:
    """Keys whose count-min estimate is >= fraction_ppm/1e6 of all rows:
    (key, est, exact, total). CM never under-estimates, so every true heavy
    hitter is present (possible false positives carry est > exact — the
    exact column, computed here for the driver check, shows the gap).
    Threshold compare is integer cross-multiplied: est * 1e6 >= total * ppm."""
    sk = cm_sketch(df, key_col)
    keys = df.where(F.col(key_col).isNotNull()).select(key_col).distinct()
    est = cm_estimate(sk, keys, key_col)
    exact = (
        df.where(F.col(key_col).isNotNull())
        .groupBy(key_col)
        .agg(F.count("*").cast("bigint").alias("exact"))
    )
    total = df.where(F.col(key_col).isNotNull()).agg(
        F.count("*").cast("bigint").alias("total")
    )
    return (
        est.join(exact, key_col)
        .crossJoin(F.broadcast(total))
        .where(F.col("est") * 1_000_000 >= F.col("total") * fraction_ppm)
        .select(key_col, "est", "exact", "total")
    )


def cm_heavy_hitters_sql(
    table: str, key_col: str, fraction_ppm: int = 10_000
) -> str:
    """DuckDB twin of cm_heavy_hitters (bit-identical integers)."""
    probes = " UNION ALL ".join(
        f"SELECT {key_col} AS k, {j} AS j, "
        f"cast(concat('0x', substr(md5(concat('{j}#', cast({key_col} AS VARCHAR))), 1, 7)) AS BIGINT) % {CM_WIDTH} AS bucket "
        f"FROM {table} WHERE {key_col} IS NOT NULL"
        for j in range(CM_DEPTH)
    )
    return f"""
WITH rows_ AS ({probes}),
cells AS (
  SELECT j, bucket, cast(count(*) AS BIGINT) AS cnt
  FROM rows_ GROUP BY j, bucket
),
probe AS (SELECT DISTINCT k, j, bucket FROM rows_),
est AS (
  SELECT p.k AS {key_col}, min(c.cnt) AS est
  FROM probe p JOIN cells c ON p.j = c.j AND p.bucket = c.bucket
  GROUP BY p.k
),
exact AS (
  SELECT {key_col} AS k, cast(count(*) AS BIGINT) AS exact
  FROM {table} WHERE {key_col} IS NOT NULL GROUP BY {key_col}
),
tot AS (
  SELECT cast(count(*) AS BIGINT) AS total FROM {table}
  WHERE {key_col} IS NOT NULL
)
SELECT e.{key_col}, e.est, x.exact, t.total
FROM est e JOIN exact x ON e.{key_col} = x.k CROSS JOIN tot t
WHERE e.est * 1000000 >= t.total * {fraction_ppm}
"""


# --- Log-binned histogram (HDR-style percentiles) ----------------------------

HDR_SCALE = 1 << 20
# sub-octave thresholds 2^(i/8), i=0..7, as integer ratios scaled by 2^20;
# shared verbatim with the SQL twin so bin edges are identical bigints.
HDR_RATIOS = [round(2 ** (i / 8) * HDR_SCALE) for i in range(8)]
_HDR_RATIO_ARRAY = "array(" + ",".join(f"{r}L" for r in HDR_RATIOS) + ")"


def hdr_histogram(df: DataFrame, value_col: str) -> DataFrame:
    """(bin, cnt): log-binned histogram of a positive integer column —
    the ungrouped (single-histogram) case of hdr_histogram_grouped; see
    that function for the bin math, determinism, and scale notes."""
    return hdr_histogram_grouped(df, [], value_col)


def hdr_percentiles(hist: DataFrame, percentiles=(50, 95, 99)) -> DataFrame:
    """(p, bin, lo, cum, total): percentile bins off one histogram — the
    ungrouped case of hdr_percentiles_grouped (its windows degenerate to
    the whole ≤ few-hundred-bin table, where one task is the correct
    plan)."""
    return hdr_percentiles_grouped(hist, [], percentiles)


def hdr_percentiles_sql(
    table: str, value_expr: str, percentiles=(50, 95, 99)
) -> str:
    """DuckDB twin of hdr_histogram |> hdr_percentiles (bit-exact):
    the grouped template with a constant group key, projected away — ONE
    copy of the bin math serves both paths."""
    grouped = hdr_percentiles_grouped_sql(table, "0", value_expr, percentiles)
    return f"SELECT p, bin, lo, cum, total FROM ({grouped}) sub ORDER BY p"

def hdr_histogram_grouped(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """(group..., bin, cnt): one log-binned histogram PER GROUP — the
    per-tenant / per-event-type percentile sketch. Same integer bin math
    as hdr_histogram; the shuffle carries at most (groups x bins) rows,
    and the grouped windows below parallelize across groups (no global
    window — partitions are the group keys)."""
    subs = " + ".join(
        f"(case when _v * {HDR_SCALE} >="
        f" shiftleft(1L, _oct) * {r}L then 1 else 0 end)"
        for r in HDR_RATIOS
    )
    return (
        df.where(F.col(value_col).isNotNull())
        .select(*group_cols, F.col(value_col).cast("bigint").alias("_v"))
        .withColumn("_oct", F.expr("cast(length(bin(_v)) - 1 as int)"))
        .select(
            *group_cols,
            F.expr(
                "case when _v < 1 then 0L"
                f" else cast(_oct as bigint) * 8 + ({subs}) - 1 end"
            ).alias("bin"),
        )
        .groupBy(*group_cols, "bin")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )


def hdr_percentiles_grouped(
    hist: DataFrame, group_cols: list[str], percentiles=(50, 95, 99)
) -> DataFrame:
    """(group..., p, bin, lo, cum, total): each group's percentile bins,
    read off its own histogram slice. Windows partition on the group key
    — parallelism is the number of groups, each group's frame is <= a few
    hundred bins."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    total_w = Window.partitionBy(*group_cols).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = hist.select(
        *group_cols,
        "bin",
        "cnt",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(total_w).alias("total"),
    )
    lo = F.expr(
        "case when bin = 0 then 0L else cast((shiftleft(1L,"
        " cast(bin div 8 as int)) * element_at("
        + _HDR_RATIO_ARRAY
        + f", cast(bin % 8 + 1 as int))) div {HDR_SCALE} as bigint) end"
    )
    pcts = F.array(*[F.lit(int(p)) for p in percentiles])
    return (
        cum.select(
            *group_cols,
            F.explode(pcts).alias("p"),
            "bin",
            lo.alias("lo"),
            "cum",
            "total",
        )
        .where(F.col("cum") * 100 >= F.col("total") * F.col("p"))
        .groupBy(*group_cols, "p")
        .agg(F.min(F.struct("bin", "lo", "cum", "total")).alias("h"))
        .select(
            *group_cols,
            F.col("p").cast("int").alias("p"),
            F.col("h.bin").alias("bin"),
            F.col("h.lo").alias("lo"),
            F.col("h.cum").alias("cum"),
            F.col("h.total").alias("total"),
        )
    )


def hdr_percentiles_grouped_sql(
    table: str, group_expr: str, value_expr: str, percentiles=(50, 95, 99)
) -> str:
    """DuckDB twin of the grouped histogram + percentile read (bit-exact).
    ``group_expr`` is a single SQL expression aliased as ``grp``."""
    ratio_list = ",".join(str(r) for r in HDR_RATIOS)
    subs = " + ".join(
        f"(CASE WHEN v * {HDR_SCALE} >= (1::BIGINT << oct) * {r}"
        " THEN 1 ELSE 0 END)"
        for r in HDR_RATIOS
    )
    pct_rows = " UNION ALL ".join(f"SELECT {int(p)} AS p" for p in percentiles)
    return f"""
WITH vals AS (
  SELECT {group_expr} AS grp, cast({value_expr} AS BIGINT) AS v
  FROM {table} WHERE {value_expr} IS NOT NULL
), binned AS (
  SELECT grp, CASE WHEN v < 1 THEN 0
         ELSE (length(bin(v)) - 1)::BIGINT * 8 + ({subs}) - 1 END AS bin
  FROM (SELECT grp, v, (length(bin(v)) - 1) AS oct FROM vals)
), hist AS (
  SELECT grp, bin, cast(count(*) AS BIGINT) AS cnt
  FROM binned GROUP BY grp, bin
), cum AS (
  SELECT grp, bin, cnt,
         sum(cnt) OVER (PARTITION BY grp ORDER BY bin
                        ROWS UNBOUNDED PRECEDING)::BIGINT AS cum,
         sum(cnt) OVER (PARTITION BY grp)::BIGINT AS total
  FROM hist
), pcts AS ({pct_rows})
SELECT grp, p, bin,
       CASE WHEN bin = 0 THEN 0::BIGINT
            ELSE ((1::BIGINT << cast(bin // 8 AS INT))
                  * ([{ratio_list}])[cast(bin % 8 + 1 AS INT)])
                 // {HDR_SCALE} END AS lo,
       cum, total
FROM (
  SELECT grp, p, bin, cum, total,
         row_number() OVER (PARTITION BY grp, p ORDER BY bin) AS rn
  FROM pcts JOIN cum ON cum * 100 >= total * p
) WHERE rn = 1 ORDER BY grp, p
"""
