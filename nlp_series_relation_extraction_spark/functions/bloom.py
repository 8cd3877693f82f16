"""Bloom-filter semi-join pruning — cut a shuffle before it happens.

The 100-TB problem this solves: a semi-join of a huge fact table
against a small-but-not-broadcastable key set normally shuffles the
ENTIRE fact table on the join key. A Bloom filter of the key set is a
few KB of longs; shipping it to every scan task filters most
non-matching rows BEFORE the exchange, so the shuffle moves only
(matches + false positives). Spark's own runtime filters do this
opportunistically (`spark.sql.optimizer.runtime.bloomFilter.enabled`);
this module makes it an explicit, deterministic, cross-engine-
reproducible operator so curated pipelines can pin the behavior and
DuckDB can replay it bit-for-bit (md5-derived probe positions, no
engine-private hash).

Mechanics: k probe positions per key, h_i(key) = (first 15 hex digits
of md5(key + '|' + i)) mod m_bits — 60-bit integers, the repo's
cross-engine hash idiom. The filter is m_bits/64 longs built by a
bit_or aggregation; `build_bloom` collects THAT (bounded by the m_bits
config, like an index-training sample — never data-sized) and
`bloom_might_contain` embeds it as a literal array in the scan's
filter expression: pure JVM arithmetic, no join, no UDF.

Standard contract: no false negatives ever (pinned by test); false
positive rate ~ (1 - e^{-kn/m})^k, the classic bound.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _probe(col: str, i: int, m_bits: int) -> str:
    return (
        f"cast(conv(substring(md5(concat(cast({col} as string), '|', "
        f"'{i}')), 1, 15), 16, 10) as bigint) % {m_bits}"
    )


def build_bloom(
    keys: DataFrame, key_col: str, m_bits: int = 8192, k: int = 4
) -> list:
    """Aggregate the key set into a Bloom bit array; returns the
    m_bits/64 words as a Python list (driver-side, bounded by the
    m_bits CONFIG — independent of key count). One explode(k) + one
    word-keyed bit_or aggregation; the collect moves <= m_bits/8
    bytes."""
    if m_bits % 64 != 0 or m_bits <= 0:
        raise ValueError(f"build_bloom: m_bits must be a multiple of 64: {m_bits}")
    if k < 1:
        raise ValueError(f"build_bloom: k must be >= 1: {k}")
    probes = F.array(
        *[F.expr(_probe(key_col, i, m_bits)) for i in range(k)]
    )
    words = (
        keys.select(F.explode(probes).alias("h"))
        .select(
            (F.col("h") / 64).cast("long").alias("word"),
            F.expr("shiftleft(1L, cast(h % 64 as int))").alias("bit"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(bit)").alias("w"))
        .collect()
    )
    arr = [0] * (m_bits // 64)
    for r in words:
        arr[int(r.word)] = int(r.w)
    return arr


def bloom_might_contain(
    key_col: str, words: list, m_bits: int, k: int
) -> Column:
    """Membership-test column: True iff every probe bit of ``key_col``
    is set in ``words``. The array rides the plan as a literal (the
    task-side 'tiny build side'), each probe is element_at + shift +
    mask — whole-stage-codegen friendly, zero joins."""
    lits = ",".join(f"{int(w)}L" for w in words)
    conds = []
    for i in range(k):
        h = _probe(key_col, i, m_bits)
        conds.append(
            f"(shiftright(element_at(array({lits}),"
            f" cast(({h}) / 64 as int) + 1),"
            f" cast(({h}) % 64 as int)) & 1L) = 1L"
        )
    return F.expr(" AND ".join(conds))


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    m_bits: int = 8192,
    k: int = 4,
) -> DataFrame:
    """Exact semi-join with Bloom pre-pruning: filter ``big`` by the
    Bloom filter of ``small``'s keys (map-side, pre-shuffle), THEN
    left_semi join to remove the false positives. Result is exactly
    the plain semi-join (no-false-negative guarantee); the shuffle
    after pruning carries matches + ~fp-rate of the table instead of
    the whole table."""
    words = build_bloom(small.select(small_key), small_key, m_bits, k)
    pruned = big.where(bloom_might_contain(big_key, words, m_bits, k))
    return pruned.join(
        small.select(F.col(small_key).alias(big_key)).distinct(),
        big_key,
        "left_semi",
    )
