"""Edit-distance similarity join: exactness vs a brute-force DP twin,
completeness of the symmetric-delete blocking, and plan shape."""

import random

import pytest

from nlp_series_relation_extraction_spark.functions.stringsim import (
    deletion_variants,
    edit_distance_join,
    levenshtein_python,
)


def _brute(strings, d):
    """Brute-force truth: all distinct pairs within distance d."""
    ds = sorted({s for s in strings if s})
    out = set()
    for i, a in enumerate(ds):
        for b in ds[i + 1 :]:
            dist = levenshtein_python(a, b)
            if dist <= d:
                out.add((a, b, dist))
    return out


def _spark_pairs(spark, strings, d):
    df = spark.createDataFrame([(s,) for s in strings], ["mention"])
    rows = edit_distance_join(df, "mention", max_dist=d).collect()
    return {(r.a, r.b, r.dist) for r in rows}


def test_dp_twin_known_values():
    assert levenshtein_python("kitten", "sitting") == 3
    assert levenshtein_python("", "abc") == 3
    assert levenshtein_python("abc", "abc") == 0
    assert levenshtein_python("ab", "ba") == 2  # transposition costs 2


def test_deletion_variants_d1(spark):
    df = spark.createDataFrame([("abc",)], ["s"])
    got = set(
        df.select(deletion_variants("s", 1).alias("v")).collect()[0].v
    )
    assert got == {"abc", "bc", "ac", "ab"}


def test_deletion_variants_d2_includes_empty_for_len2(spark):
    df = spark.createDataFrame([("ab",)], ["s"])
    got = set(
        df.select(deletion_variants("s", 2).alias("v")).collect()[0].v
    )
    assert got == {"ab", "a", "b", ""}


@pytest.mark.parametrize("d", [1, 2])
def test_matches_bruteforce_random(spark, d):
    rng = random.Random(42 + d)
    alphabet = "abcd"
    strings = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
        for _ in range(120)
    ]
    assert _spark_pairs(spark, strings, d) == _brute(strings, d)


def test_planted_typo_classes_d1(spark):
    base = "knowledge graph"
    corpus = [
        base,
        "knowledge grph",  # deletion: dist 1
        "knowledge graphs",  # insertion: dist 1
        "knowledge graph",  # hmm: insertion of a, dist 1
        "knowladge graph",  # substitution: dist 1
        "knowledge grpah",  # transposition: dist 2 -> NOT found at d=1
        "entity linking",  # far away
    ]
    got = _spark_pairs(spark, corpus, 1)
    partners = {b for a, b, _ in got if a == base} | {
        a for a, b, _ in got if b == base
    }
    assert "knowledge grph" in partners
    assert "knowledge graphs" in partners
    assert "knowladge graph" in partners
    assert "knowledge grpah" not in partners
    assert "entity linking" not in partners
    # ...but the transposition IS found at d=2, with exact dist recorded
    got2 = _spark_pairs(spark, corpus, 2)
    assert (base, "knowledge grpah", 2) in got2 or (
        "knowledge grpah",
        base,
        2,
    ) in got2


def test_unicode_and_duplicates(spark):
    corpus = ["café", "cafe", "café", "caf", "", None]
    got = _spark_pairs(spark, corpus, 1)
    assert got == _brute([s for s in corpus if s], 1)
    assert ("caf", "cafe", 1) in got
    # café vs cafe is one substitution
    assert ("cafe", "café", 1) in got


def test_plan_is_python_free(spark):
    df = spark.createDataFrame([("abc",), ("abd",)], ["mention"])
    plan = (
        edit_distance_join(df, "mention", 1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "FlatMapGroupsInPandas" not in plan


def test_bad_max_dist_rejected(spark):
    df = spark.createDataFrame([("x",)], ["mention"])
    with pytest.raises(ValueError):
        edit_distance_join(df, "mention", 0)
