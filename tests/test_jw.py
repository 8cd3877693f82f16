"""Jaro-Winkler similarity (functions/stringsim.py:jaro,jaro_winkler)
locked BIT-EXACT to DuckDB's built-ins over a 20k-pair fuzz — the lock
that makes mention_jw_join's oracle sound — plus published hand values
and the blocked-join equality contract."""

import random

import duckdb
import pytest

from nlp_series_relation_extraction_spark.functions.stringsim import (
    jaro,
    jaro_winkler,
    jw_similarity_join,
)


def test_published_hand_values():
    assert jaro_winkler("MARTHA", "MARHTA") == pytest.approx(
        0.9611111111111111, abs=1e-15
    )
    assert jaro_winkler("DIXON", "DICKSONX") == pytest.approx(
        0.8133333333333332, abs=1e-12
    )
    assert jaro("CRATE", "TRACE") == pytest.approx(0.7333333333, abs=1e-9)
    # duckdb conventions: empty scores 0, even '' vs ''
    assert jaro("", "") == 0.0
    assert jaro_winkler("", "abc") == 0.0
    assert jaro_winkler("x", "x") == 1.0


def test_boost_applies_only_above_threshold():
    # jaro('aXXXX','aYYYY') = (1/5 + 1/5 + 1)/3 = 0.4667 <= 0.7:
    # prefix boost must NOT apply
    assert jaro_winkler("aXXXX", "aYYYY") == jaro("aXXXX", "aYYYY")
    # prefix cap at 4 even with longer shared prefixes
    j = jaro("aaaaaabc", "aaaaaabd")
    assert jaro_winkler("aaaaaabc", "aaaaaabd") == pytest.approx(
        j + 4 * 0.1 * (1 - j), abs=1e-15
    )


def test_bit_exact_vs_duckdb_fuzz():
    con = duckdb.connect()
    rng = random.Random(17)
    alpha = "abcdef"
    for _ in range(20_000):
        a = "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 10)))
        b = "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 10)))
        want = con.execute(
            "select jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert jaro_winkler(a, b) == want, (a, b)


def test_bit_exact_vs_duckdb_fuzz_realistic_names():
    """Round-6 ADVICE: the short-string fuzz never exercised the
    match-window/transposition/boost paths at the 20-50 char lengths the
    driver query actually scores. Fuzz long, spaced, shared-prefix-heavy
    pairs (part-name shaped) against DuckDB directly."""
    con = duckdb.connect()
    rng = random.Random(23)
    words = [
        "almond", "antique", "aquamarine", "azure", "beige", "bisque",
        "blanched", "blush", "burlywood", "chartreuse", "chiffon",
        "chocolate", "coral", "cornflower", "cornsilk", "cream", "cyan",
    ]

    def name():
        n = rng.randrange(2, 6)
        return " ".join(rng.choice(words) for _ in range(n))[:50]

    for _ in range(4_000):
        a = name()
        if rng.random() < 0.5:
            # shared-prefix mutation: realistic near-duplicate names
            cut = rng.randrange(0, len(a))
            b = a[:cut] + name()[: rng.randrange(0, 20)]
        else:
            b = name()
        want = con.execute(
            "select jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert jaro_winkler(a, b) == want, (a, b)


def test_blocked_join_matches_naive(spark):
    names = [
        "jonathan smith", "jonathon smith", "jonathan smyth",
        "mary jones", "marie jones", "completely different",
        "jon smith",
    ]
    df = spark.createDataFrame([(n,) for n in names], "mention string")
    got = {
        (r["a"], r["b"]): r["jw_ppm"]
        for r in jw_similarity_join(
            df, "mention", threshold_ppm=900_000
        ).collect()
    }
    # naive twin with the SAME blocking contract
    want = {}
    ds = sorted(set(names))
    for i, a in enumerate(ds):
        for b in ds[i + 1 :]:
            if a[:3] != b[:3] or abs(len(a) - len(b)) > 2:
                continue
            ppm = int(jaro_winkler(a, b) * 1_000_000)
            if ppm >= 900_000:
                want[(a, b)] = ppm
    assert got == want
    assert ("jonathan smith", "jonathon smith") in got
    assert all("completely different" not in k for pair in got for k in pair)
