"""Prefix-filtered exact set-similarity join (functions/dedup.py:
ppjoin_pairs) — must equal the uncapped inverted-index jaccard_pairs
EXACTLY (it is a candidate-pruning strategy, not an approximation), with
strictly fewer candidate pairs than the full inverted index on skewed
corpora."""

import random

from pyspark.sql import functions as F

from nlp_series_relation_extraction_spark.functions.dedup import (
    _ppjoin_prefixes,
    jaccard_pairs,
    ppjoin_pairs,
    word_shingles,
)


def _shingled(spark, texts, n=2):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return word_shingles(docs, "doc_id", "text", n=n).localCheckpoint()


def _pairs(df):
    return sorted(
        (r["a_id"], r["b_id"], r["inter"], r["a_sz"], r["b_sz"])
        for r in df.collect()
    )


def _random_texts(seed, n_docs=40, vocab=25, length=12):
    rng = random.Random(seed)
    base = [f"w{i}" for i in range(vocab)]
    texts = []
    for _ in range(n_docs):
        texts.append(" ".join(rng.choice(base) for _ in range(length)))
    # plant near-dup pairs: copies with small edits
    for i in range(0, 6, 2):
        words = texts[i].split()
        words[rng.randrange(len(words))] = "edited"
        texts.append(" ".join(words))
    return texts


def test_equals_uncapped_jaccard_pairs_random(spark):
    for seed in (1, 2, 3):
        sh = _shingled(spark, _random_texts(seed))
        for pct in (30, 50, 80):
            got = _pairs(ppjoin_pairs(sh, threshold_pct=pct))
            want = _pairs(jaccard_pairs(sh, threshold_pct=pct))
            assert got == want, (seed, pct)


def test_exact_boundary_pair_included(spark):
    # two docs sharing exactly half their shingles: jaccard = 1/3
    # (inter=2, union=6) -> kept at 33, dropped at 34
    texts = ["a b c d e", "a b c x y"]  # 2-gram shingles: 4 each, inter 2
    sh = _shingled(spark, texts)
    assert len(_pairs(ppjoin_pairs(sh, threshold_pct=33))) == 1
    assert len(_pairs(ppjoin_pairs(sh, threshold_pct=34))) == 0


def test_identical_docs_and_disjoint_docs(spark):
    texts = ["p q r s", "p q r s", "zz yy xx ww"]
    sh = _shingled(spark, texts)
    got = _pairs(ppjoin_pairs(sh, threshold_pct=90))
    assert got == [(0, 1, 3, 3, 3)]


def test_prefix_candidates_prune_hot_tokens(spark):
    # skewed corpus: every doc opens with a hot 3-word header (2 hot
    # shingles) and ends with a distinctive rare tail (3 rare shingles,
    # sz=5). At t=70 the prefix is 5 - ceil(3.5) + 1 = 2 rarest tokens
    # — hot shingles never enter it, so the quadratic hot core is
    # pruned entirely; one planted exact copy must still be found
    # through its rare prefix.
    texts = [f"h1 h2 h3 r{i}a r{i}b r{i}c" for i in range(20)]
    texts.append(texts[0])
    sh = _shingled(spark, texts)
    pre = _ppjoin_prefixes(sh, 70)
    n_cand = (
        pre.alias("a")
        .join(pre.alias("b"), "shingle")
        .where(F.col("a.id") < F.col("b.id"))
        .select("a.id", "b.id")
        .distinct()
        .count()
    )
    full = (
        sh.alias("a")
        .join(sh.alias("b"), "shingle")
        .where(F.col("a.id") < F.col("b.id"))
        .select("a.id", "b.id")
        .distinct()
        .count()
    )
    assert full == 21 * 20 // 2  # hot shingles pair everyone
    assert n_cand == 1  # only the planted copy survives prefix filtering
    # and the survivors are still exact: the copy, nothing else
    got = _pairs(ppjoin_pairs(sh, threshold_pct=70))
    assert got == [(0, 20, 5, 5, 5)]
    assert got == _pairs(jaccard_pairs(sh, threshold_pct=70))


def test_short_docs_emit_nothing(spark):
    sh = _shingled(spark, ["one", "two words here", "one"], n=3)
    # docs 0/2 have <3 words -> no shingles -> cannot pair
    got = _pairs(ppjoin_pairs(sh, threshold_pct=50))
    assert got == []
