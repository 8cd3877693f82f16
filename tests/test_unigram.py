"""Distributed unigram-LM tokenizer training (functions/unigram.py):
twin parity, EM likelihood monotonicity, pruning contracts, Viterbi
segmentation semantics."""

import math

import numpy as np
import pytest

from nlp_series_relation_extraction_spark.functions.unigram import (
    _viterbi,
    unigram_fit,
    unigram_fit_python,
    unigram_tokenize,
)

TEXTS = [
    "the cat sat on the mat",
    "the cats sat on the mats",
    "a cat and a mat",
    "the mat the cat the mat",
    "cats like mats and cats like cats",
]


def _docs(spark, texts=TEXTS):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_matches_python_twin(spark):
    m = unigram_fit(_docs(spark), vocab_size=32, seed_size=64, n_iters=3)
    t = unigram_fit_python(TEXTS, vocab_size=32, seed_size=64, n_iters=3)
    assert np.allclose(m["loglik"], t["loglik"], rtol=1e-9)
    assert set(m["probs"]) == set(t["probs"])
    for s in m["probs"]:
        assert math.isclose(
            m["probs"][s], t["probs"][s], rel_tol=1e-9
        ), s


def test_em_loglik_monotone_and_probs_normalized(spark):
    # run WITHOUT pruning (vocab_size above seed size): pure EM, so the
    # corpus log-likelihood must be non-decreasing per iteration
    m = unigram_fit(
        _docs(spark), vocab_size=10_000, seed_size=64, n_iters=4
    )
    ll = m["loglik"]
    # tolerance absorbs the <=1e-9-mass char-floor perturbation
    assert all(b >= a - 1e-5 for a, b in zip(ll, ll[1:])), ll
    assert math.isclose(sum(m["probs"].values()), 1.0, rel_tol=1e-9)


def test_pruning_keeps_chars_and_hits_target(spark):
    m = unigram_fit(
        _docs(spark), vocab_size=24, seed_size=256, n_iters=6,
        shrink_factor=0.5,
    )
    chars = {c for t in TEXTS for w in t.split() for c in w}
    assert chars <= set(m["probs"])  # single chars are immortal
    assert len(m["probs"]) <= max(24, len(chars))
    # frequent whole words survive pruning as single pieces
    assert "cat" in m["probs"] or "cats" in m["probs"]


def test_viterbi_semantics():
    logp = {
        "a": math.log(0.3), "b": math.log(0.3), "ab": math.log(0.4)
    }
    assert _viterbi("ab", logp, 4) == ["ab"]  # 0.4 > 0.09
    assert _viterbi("aab", logp, 4) == ["a", "ab"]
    assert _viterbi("zz", logp, 4) is None  # unsegmentable
    # tie toward the longer last piece: p(ab)=p(a)p(b) exactly
    logp2 = {"a": math.log(0.5), "b": math.log(0.5), "ab": math.log(0.25)}
    assert _viterbi("ab", logp2, 4) == ["ab"]


def test_tokenize_counts(spark):
    m = unigram_fit(_docs(spark), vocab_size=64, seed_size=64, n_iters=3)
    out = {
        r.doc_id: (r.n_words, r.n_tokens, r.n_unsegmentable)
        for r in unigram_tokenize(_docs(spark), m).collect()
    }
    assert set(out) == set(range(len(TEXTS)))
    for i, t in enumerate(TEXTS):
        n_words, n_tokens, n_bad = out[i]
        assert n_words == len(t.split())
        assert n_bad == 0  # chars are immortal: everything segments
        assert n_tokens >= n_words  # at least one piece per word
    # out-of-vocab characters are counted unsegmentable, not dropped
    docs2 = spark.createDataFrame(
        [(0, "cat éé")], "doc_id long, text string"
    )
    r = unigram_tokenize(docs2, m).collect()[0]
    assert (r.n_words, r.n_unsegmentable) == (2, 1)


def test_empty_corpus_raises(spark):
    with pytest.raises(ValueError, match="empty corpus"):
        unigram_fit(_docs(spark, [""]), vocab_size=8)
