"""Edit-distance similarity join (SymSpell-style deletion blocking).

Entity linking's blocking stage (operators/linking.py) is set-based
(char-2-gram Jaccard); real alias tables also need an EDIT-DISTANCE
join — "Customer#000000042" vs "Customer#000000043" share almost all
2-grams with thousands of siblings, but only true typo-neighbors sit
within Levenshtein distance 1.  The reference never canonicalizes at
all (run_evaluation.py:222-255 compares raw strings), so this is a
north-rule addition, not a port.

Algorithm — symmetric-delete blocking (public knowledge: the SymSpell
scheme, Garbe 2012; same property used by FastSS, Bocek et al. 2007):

    if levenshtein(a, b) <= d then the sets of strings reachable from
    a and from b by deleting at most d characters intersect.

Proof sketch: fix an optimal alignment; delete from ``a`` every
character the alignment substitutes or deletes (<= d of them), and from
``b`` every character it substitutes or inserts (<= d).  Both sides are
left with exactly the aligned matched characters — the same string.

So candidate generation is: emit every <=d-deletion variant of every
distinct string as a block key, self-join on the key, then VERIFY with
the exact JVM ``levenshtein`` (candidates are a superset — the blocking
is complete, never lossy; verification makes it exact).

100-TB shape:
* **dedup first** — the distinct-string table is the skew firewall; hot
  mentions collapse to one row before any pairwise work.
* **O(L^d) keys per string**, all built with JVM ``transform`` /
  ``substring`` expressions inside whole-stage codegen — no Python in
  the plan (plan-asserted by tests/test_stringsim.py).
* the self-join shuffles on variant keys; a key's block only contains
  strings within d deletions of the SAME short string, so block sizes
  track true near-duplicate density, not corpus size.  Output size is
  the real lower bound — if the data contains quadratically many true
  pairs, so does every correct algorithm.
* verification (`levenshtein(a,b) <= d`) and the `abs(len diff) <= d`
  pre-filter are JVM-side; nothing leaves codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def deletion_variants(col: str, d: int):
    """Column: array of all distinct strings reachable from ``col`` by
    deleting at most ``d`` characters (includes the string itself).

    Built as d nested JVM ``transform`` passes; ``case when length = 0``
    guards the descending-``sequence(1,0)`` trap (cf. plans/queries.py
    word-shingles note).
    """
    if d < 0:
        raise ValueError(f"d must be >= 0, got {d}")
    acc = f"array({col})"
    cur = f"array({col})"
    for _ in range(d):
        cur = (
            f"array_distinct(flatten(transform({cur}, t -> "
            f"case when length(t) = 0 then array() else "
            f"transform(sequence(1, length(t)), "
            f"i -> concat(substring(t, 1, i - 1), "
            f"substring(t, i + 1, length(t)))) end)))"
        )
        acc = f"array_union({acc}, {cur})"
    return F.expr(f"array_distinct({acc})")


def edit_distance_join(
    strings: DataFrame,
    col: str = "mention",
    max_dist: int = 1,
) -> DataFrame:
    """All unordered pairs of DISTINCT values of ``col`` within
    Levenshtein distance ``max_dist``.

    Returns (a, b, dist) with a < b lexicographically; ``dist`` is the
    exact Levenshtein distance (long).  Exact — blocking is complete
    (see module docstring), verification is the JVM levenshtein.

    ``max_dist`` is the scale knob: candidate keys per string grow
    O(L^max_dist); 1-2 is the useful typo range (transpositions cost 2
    under plain Levenshtein — pinned by tests).
    """
    if max_dist < 1:
        raise ValueError(f"max_dist must be >= 1, got {max_dist}")
    ds = strings.select(F.col(col).cast("string").alias("s")).where(
        F.col("s").isNotNull() & (F.length("s") > 0)
    ).distinct()
    # Pin the SELF-JOIN's partition count too (round-6: the deletion-key
    # join stage generates the candidate cross product per key group —
    # compute-dense, byte-tiny, so AQE's byte-based coalescing was
    # running it near-single-task; an explicit repartition(N, k)
    # satisfies the join's required distribution, replaces the implicit
    # exchange rather than adding one, and AQE leaves user-pinned
    # partition counts alone. Measured min-of-2 at sf0.1:
    # mention_edit_join ~10s -> ~3s).
    n_part = strings.sparkSession.sparkContext.defaultParallelism
    blocks = ds.select(
        "s",
        F.explode(deletion_variants("s", max_dist)).alias("k"),
    ).repartition(n_part, "k")
    a = blocks.alias("a")
    b = blocks.alias("b")
    # Pin the dedup exchange's partition count: with a bare distinct(),
    # AQE coalesces the ~tens-of-MB candidate shuffle to ONE task at
    # small SF, and the O(L^2) levenshtein verify that follows runs in
    # the same stage — single-core (the round-4 extraction lesson:
    # CPU-bound stages must be sized by cores, not bytes; measured 5.4s
    # -> ~0.2s on local[32] at sf0.1). repartition(N, keys) satisfies
    # dropDuplicates' required distribution, so no extra exchange.
    pairs = (
        a.join(b, "k")
        .where(F.col("a.s") < F.col("b.s"))
        # cheap JVM pre-filter before the O(L^2) verify
        .where(
            F.abs(F.length("a.s") - F.length("b.s")) <= F.lit(max_dist)
        )
        .select(F.col("a.s").alias("a"), F.col("b.s").alias("b"))
        .repartition(n_part, "a", "b")
        .dropDuplicates(["a", "b"])
        .withColumn("dist", F.levenshtein("a", "b").cast("long"))
        .where(F.col("dist") <= F.lit(max_dist))
    )
    return pairs


def levenshtein_python(a: str, b: str) -> int:
    """Plain-DP twin for tests (O(|a||b|), no early exit — clarity)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (ca != cb),
                )
            )
        prev = cur
    return prev[-1]


def jaro(a: str, b: str) -> float:
    """Jaro similarity (Jaro 1989), the record-linkage classic: match
    window max(|a|,|b|)/2 - 1, transpositions = out-of-order matches/2.
    Conventions locked to DuckDB's jaro_similarity BIT-EXACTLY (fuzzed
    over 20k random pairs in tests/test_jw.py): empty strings score 0
    (even '' vs ''), equal strings 1."""
    if not a or not b:
        return 0.0
    if a == b:
        return 1.0
    la, lb = len(a), len(b)
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    ma = [False] * la
    mb = [False] * lb
    m = 0
    for i in range(la):
        lo, hi = max(0, i - window), min(lb, i + window + 1)
        for j in range(lo, hi):
            if not mb[j] and a[i] == b[j]:
                ma[i] = mb[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    j = 0
    for i in range(la):
        if ma[i]:
            while not mb[j]:
                j += 1
            if a[i] != b[j]:
                t += 1
            j += 1
    t //= 2
    return (m / la + m / lb + (m - t) / m) / 3.0


def jaro_winkler(a: str, b: str, p: float = 0.1, boost: float = 0.7) -> float:
    """Jaro-Winkler (Winkler 1990): boost by the common prefix (cap 4)
    only when the Jaro score exceeds 0.7 — the exact convention DuckDB's
    jaro_winkler_similarity implements (bit-exact fuzz pin)."""
    j = jaro(a, b)
    if j > boost:
        l = 0
        for x, y in zip(a[:4], b[:4]):
            if x != y:
                break
            l += 1
        j = j + l * p * (1.0 - j)
    return j


def jw_similarity_join(
    names: DataFrame,
    col: str,
    threshold_ppm: int = 900_000,
    block_prefix: int = 3,
    max_len_diff: int = 2,
) -> DataFrame:
    """Jaro-Winkler similarity self-join over distinct strings: the
    fuzzy-alias detector for entity mentions where edit distance is too
    coarse (JW weights prefixes, the signal in names). Blocking =
    shared ``block_prefix``-char prefix + length band — sound for the
    high-JW regime this targets (a pair with >= 0.9 JW and a long
    common prefix shares its first chars; pairs failing the block are
    below threshold for realistic name lengths, and the same block is
    replayed verbatim in the oracle, so the CONTRACT is
    blocked-join equality, not unblocked completeness).

    Scale shape: candidate pairs come from an equi-join on the prefix
    key (skew = block size, bounded by the prefix length knob); scoring
    runs in one Arrow-batched mapInPandas over the pair table (the DP
    is per-pair python — the same inside-Arrow convention as the codec
    decoders); output is thresholded in the same pass, so only
    accepted pairs ever shuffle. Returns (a, b, jw_ppm).
    """
    import pandas as pd

    ds = names.select(F.col(col).alias("s")).where(
        F.length("s") > 0
    ).distinct()
    blocked = ds.withColumn(
        "blk", F.substring("s", 1, block_prefix)
    )
    pairs = (
        blocked.alias("x")
        .join(blocked.alias("y"), "blk")
        .where(
            (F.col("x.s") < F.col("y.s"))
            & (
                F.abs(F.length("x.s") - F.length("y.s"))
                <= max_len_diff
            )
        )
        .select(F.col("x.s").alias("a"), F.col("y.s").alias("b"))
    )

    thr = threshold_ppm

    def score(batches):
        for pdf in batches:
            ppm = [
                int(jaro_winkler(a, b) * 1_000_000)
                for a, b in zip(pdf["a"], pdf["b"])
            ]
            pdf = pdf.assign(jw_ppm=ppm)
            yield pdf[pdf["jw_ppm"] >= thr]

    return pairs.mapInPandas(score, "a string, b string, jw_ppm long")
