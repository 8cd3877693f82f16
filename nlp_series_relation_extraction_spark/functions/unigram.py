"""Distributed unigram-LM tokenizer training (SentencePiece's unigram
model — Kudo 2018, "Subword Regularization: Improving Neural Network
Translation Models with Multiple Subword Candidates") + Viterbi
segmentation, Spark-first.

The third tokenizer-training family next to BPE (functions/bpe.py) and
wordpiece (core/tokenization.py): instead of greedy merge learning, a
PROBABILISTIC piece vocabulary p(s) is fitted by EM over the latent
segmentation of each word, then pruned to a target size; tokenization
is the Viterbi (max-probability) segmentation.

Spark shape — what survives 100 TB:

* The corpus collapses to DISTINCT WORDS weighted by count first (the
  same skew firewall as train_bpe): all per-word work downstream is
  vocabulary-sized, not corpus-sized.
* Seed vocabulary = all substrings up to ``max_piece_len`` weighted by
  word count — one JVM flatten/transform explode + one groupBy, then a
  bounded top-``seed_size`` collect (model-sized, like index training).
* E-step: one ``mapInPandas`` pass over the word table with the piece
  log-prob dict broadcast in the closure; per-word forward-backward
  expected counts are PRE-COMBINED per Arrow batch into (piece, e)
  scalar partials, so the shuffle is model-sized (the kge.py gradient
  channel shape). The per-word lattice is tiny (len <= _MAX_WORD_LEN).
* M-step + pruning: driver-side on the vocab-sized aggregate —
  renormalize, keep all single chars (so every string stays
  segmentable), drop the lowest-expected-count pieces down to
  ``shrink_factor`` per round until ``vocab_size`` (expected-count
  pruning; SentencePiece's exact loss-delta pruning is a refinement of
  the same schedule, documented simplification).
* Viterbi tokenization: one ``mapInPandas`` over documents; the DP per
  word is O(len * max_piece_len) with the final vocab broadcast.

The python twin (``unigram_fit_python``) runs the identical seed rule
and EM recursion; only float summation ORDER differs from the
distributed run (same contract as kge_fit's twin).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from .partitioning import ensure_parallelism
from .partitioning import checkpoint_nostats as _ckpt_nostats

_MAX_WORD_LEN = 48  # lattice cap: longer "words" are data noise, skipped


def _word_counts(docs: DataFrame, text_col: str) -> DataFrame:
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .where(
            (F.length("word") > 0) & (F.length("word") <= _MAX_WORD_LEN)
        )
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def _substring_counts(words: DataFrame, max_piece_len: int) -> DataFrame:
    sub = F.expr(
        "flatten(transform(sequence(1, length(word)), i ->"
        " transform(sequence(i, least(length(word),"
        f" i + {max_piece_len - 1})), j -> substring(word, i, j - i + 1))))"
    )
    return (
        words.select("cnt", F.explode(sub).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("cnt").cast("long").alias("pcount"))
    )


def seed_pieces(
    words: DataFrame, max_piece_len: int = 6, seed_size: int = 1024
) -> list[tuple[str, int]]:
    """Seed vocabulary: single chars (always, so every word stays
    segmentable) + the top multi-char substrings by (count * length)
    score — frequency-weighted coverage, the standard seed heuristic.
    Deterministic tie-break (score desc, piece asc); bounded collect."""
    subs = _substring_counts(words, max_piece_len).transform(_ckpt_nostats)
    chars = subs.where(F.length("piece") == 1)
    multi = (
        subs.where(F.length("piece") >= 2)
        .orderBy(
            (F.col("pcount") * F.length("piece")).desc(), F.asc("piece")
        )
        .limit(seed_size)
    )
    rows = chars.unionByName(multi).collect()
    return sorted((r.piece, int(r.pcount)) for r in rows)


def _forward_backward(
    word: str, cnt: float, logp: dict[str, float], max_piece_len: int,
    e_acc: dict[str, float],
) -> float:
    """Accumulate expected piece counts of one word into ``e_acc``;
    returns cnt * log-likelihood. Probability-space DP (words are
    capped at _MAX_WORD_LEN, far above underflow territory)."""
    n = len(word)
    p = {}
    for j in range(n):
        for i in range(j + 1, min(n, j + max_piece_len) + 1):
            s = word[j:i]
            lp = logp.get(s)
            if lp is not None:
                p[(j, i)] = math.exp(lp)
    alpha = [0.0] * (n + 1)
    alpha[0] = 1.0
    for i in range(1, n + 1):
        a = 0.0
        for j in range(max(0, i - max_piece_len), i):
            pij = p.get((j, i))
            if pij is not None and alpha[j] > 0.0:
                a += alpha[j] * pij
        alpha[i] = a
    if alpha[n] <= 0.0:  # unsegmentable under current vocab: skip
        return 0.0
    beta = [0.0] * (n + 1)
    beta[n] = 1.0
    for j in range(n - 1, -1, -1):
        b = 0.0
        for i in range(j + 1, min(n, j + max_piece_len) + 1):
            pij = p.get((j, i))
            if pij is not None and beta[i] > 0.0:
                b += pij * beta[i]
        beta[j] = b
    z = alpha[n]
    for (j, i), pij in p.items():
        if alpha[j] > 0.0 and beta[i] > 0.0:
            s = word[j:i]
            e_acc[s] = e_acc.get(s, 0.0) + cnt * alpha[j] * pij * beta[i] / z
    return cnt * math.log(z)


def _viterbi(
    word: str, logp: dict[str, float], max_piece_len: int
) -> list[str] | None:
    """Max-log-prob segmentation; ties break toward the LONGER last
    piece (deterministic). None if unsegmentable."""
    n = len(word)
    best = [-math.inf] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    for i in range(1, n + 1):
        for j in range(max(0, i - max_piece_len), i):
            lp = logp.get(word[j:i])
            if lp is None or best[j] == -math.inf:
                continue
            cand = best[j] + lp
            # strictly-greater keeps the SMALLEST j (longest last piece)
            # because j ascends and we require > to replace
            if cand > best[i]:
                best[i] = cand
                back[i] = j
    if best[n] == -math.inf:
        return None
    out = []
    i = n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    return out[::-1]


def _normalize(e: dict[str, float]) -> dict[str, float]:
    tot = sum(e.values())
    if tot <= 0.0:
        raise ValueError("unigram EM: zero total expected count")
    return {s: v / tot for s, v in e.items()}


_CHAR_FLOOR = 1e-9


def _floor_chars(
    probs: dict[str, float], char_set: set[str]
) -> dict[str, float]:
    """Keep every corpus character segmentable: EM drives a character's
    probability to zero geometrically once longer pieces dominate its
    every occurrence (underflow then deletes it from the model — the
    classic unigram-EM pathology SentencePiece guards its required-char
    set against). Floor chars at _CHAR_FLOOR and renormalize; the
    perturbation is <= |chars| * 1e-9 of total mass."""
    out = dict(probs)
    for c in char_set:
        if out.get(c, 0.0) < _CHAR_FLOOR:
            out[c] = _CHAR_FLOOR
    return _normalize(out)


def _prune(
    probs: dict[str, float],
    e: dict[str, float],
    vocab_size: int,
    shrink_factor: float,
) -> dict[str, float]:
    """Expected-count pruning toward vocab_size: single chars are
    immortal; multi-char pieces survive by (expected count desc, piece
    asc) rank. Shrinks at most shrink_factor per round."""
    chars = {s for s in probs if len(s) == 1}
    multi = sorted(
        (s for s in probs if len(s) >= 2),
        key=lambda s: (-e.get(s, 0.0), s),
    )
    keep_total = max(vocab_size, int(len(probs) * shrink_factor))
    keep_multi = max(0, keep_total - len(chars))
    kept = chars | set(multi[:keep_multi])
    return _normalize({s: probs[s] for s in kept})


def unigram_fit(
    docs: DataFrame,
    text_col: str = "text",
    vocab_size: int = 256,
    max_piece_len: int = 6,
    seed_size: int = 1024,
    n_iters: int = 4,
    shrink_factor: float = 0.75,
) -> dict:
    """Fit the unigram tokenizer LM. Returns {"probs": {piece: p},
    "loglik": [per-EM-iteration corpus log-likelihood], "vocab_size",
    "max_piece_len"}. Deterministic end-to-end (seed tie-breaks +
    fixed pruning schedule); the corpus never leaves the cluster — the
    driver sees only vocab-sized aggregates."""
    words = ensure_parallelism(
        _word_counts(docs, text_col)
    ).transform(_ckpt_nostats)
    seed = seed_pieces(words, max_piece_len, seed_size)
    if not seed:
        raise ValueError("unigram_fit: empty corpus")
    char_set = {s for s, _ in seed if len(s) == 1}
    probs = _normalize({s: float(c) for s, c in seed})

    logliks: list[float] = []
    for _it in range(n_iters):
        logp = {s: math.log(p) for s, p in probs.items() if p > 0.0}

        def estep(batches, logp=logp):
            import pandas as pd

            e_acc: dict[str, float] = {}
            ll = 0.0
            for pdf in batches:
                for word, cnt in zip(pdf["word"], pdf["cnt"]):
                    ll += _forward_backward(
                        word, float(cnt), logp, max_piece_len, e_acc
                    )
            pieces = list(e_acc)
            yield pd.DataFrame(
                {
                    "piece": pieces + ["\x00loglik"],
                    "e": [e_acc[s] for s in pieces] + [ll],
                }
            )

        agg = (
            words.mapInPandas(estep, "piece string, e double")
            .groupBy("piece")
            .agg(F.sum("e").alias("e"))
            .collect()
        )
        e = {r.piece: float(r.e) for r in agg}
        logliks.append(e.pop("\x00loglik", 0.0))
        probs = _floor_chars(_normalize(e), char_set)
        if len(probs) > vocab_size:
            probs = _floor_chars(
                _prune(probs, e, vocab_size, shrink_factor), char_set
            )
    return {
        "probs": probs,
        "loglik": logliks,
        "vocab_size": vocab_size,
        "max_piece_len": max_piece_len,
    }


def unigram_fit_python(
    texts: list[str],
    vocab_size: int = 256,
    max_piece_len: int = 6,
    seed_size: int = 1024,
    n_iters: int = 4,
    shrink_factor: float = 0.75,
) -> dict:
    """Flat twin of :func:`unigram_fit`: identical seed rule (count *
    length score, same tie-breaks), identical EM recursion and pruning
    schedule; only float summation order differs."""
    wc: dict[str, int] = {}
    for t in texts:
        for w in t.split(" "):
            if 0 < len(w) <= _MAX_WORD_LEN:
                wc[w] = wc.get(w, 0) + 1
    sc: dict[str, int] = {}
    for w, c in wc.items():
        for j in range(len(w)):
            for i in range(j + 1, min(len(w), j + max_piece_len) + 1):
                sc[w[j:i]] = sc.get(w[j:i], 0) + c
    chars = [(s, c) for s, c in sc.items() if len(s) == 1]
    multi = sorted(
        ((s, c) for s, c in sc.items() if len(s) >= 2),
        key=lambda x: (-x[1] * len(x[0]), x[0]),
    )[:seed_size]
    seed = sorted(chars + multi)
    if not seed:
        raise ValueError("unigram_fit: empty corpus")
    char_set = {s for s, _ in seed if len(s) == 1}
    probs = _normalize({s: float(c) for s, c in seed})
    logliks: list[float] = []
    for _it in range(n_iters):
        logp = {s: math.log(p) for s, p in probs.items() if p > 0.0}
        e_acc: dict[str, float] = {}
        ll = 0.0
        for w in sorted(wc):
            ll += _forward_backward(
                w, float(wc[w]), logp, max_piece_len, e_acc
            )
        logliks.append(ll)
        probs = _floor_chars(_normalize(dict(e_acc)), char_set)
        if len(probs) > vocab_size:
            probs = _floor_chars(
                _prune(probs, e_acc, vocab_size, shrink_factor), char_set
            )
    return {
        "probs": probs,
        "loglik": logliks,
        "vocab_size": vocab_size,
        "max_piece_len": max_piece_len,
    }


def unigram_tokenize(
    docs: DataFrame,
    model: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Viterbi segmentation of each document under a fitted model:
    (id_col, n_words, n_tokens, n_unsegmentable) — the per-document
    token accounting a packing/budgeting stage consumes. One
    mapInPandas pass, model broadcast in the closure."""
    logp = {s: math.log(p) for s, p in model["probs"].items() if p > 0.0}
    mpl = model["max_piece_len"]

    def seg(batches):
        import pandas as pd

        for pdf in batches:
            n_words, n_tokens, n_bad = [], [], []
            for text in pdf[text_col]:
                ws = [
                    w
                    for w in str(text).split(" ")
                    if 0 < len(w) <= _MAX_WORD_LEN
                ]
                toks = 0
                bad = 0
                for w in ws:
                    pieces = _viterbi(w, logp, mpl)
                    if pieces is None:
                        bad += 1
                    else:
                        toks += len(pieces)
                n_words.append(len(ws))
                n_tokens.append(toks)
                n_bad.append(bad)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_words": pd.Series(n_words, dtype="int64"),
                    "n_tokens": pd.Series(n_tokens, dtype="int64"),
                    "n_unsegmentable": pd.Series(n_bad, dtype="int64"),
                }
            )

    return ensure_parallelism(docs.select(id_col, text_col)).mapInPandas(
        seg,
        f"{id_col} long, n_words long, n_tokens long,"
        " n_unsegmentable long",
    )
