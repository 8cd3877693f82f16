"""Fuzz the vectorized decoders against naive loop-based twins.

The engine's decode functions are numpy-vectorized; these twins re-state the
reference's semantics as plain Python loops (independently of the engine
code), and 200 random prob tensors per decoder must decode identically —
guarding against vectorization bugs the planted fixtures can't reach
(threshold boundaries, odd overlaps, multi-fire positions).
"""

import numpy as np
import pytest

from nlp_series_relation_extraction_spark.config import BIO_NUM_LABELS, E_NUM, R_NUM
from nlp_series_relation_extraction_spark.core.decode_bio import decode_bio_sentence
from nlp_series_relation_extraction_spark.core.decode_span import (
    decode_pair_cube,
    decode_po_for_subject,
    decode_subject_spans,
    decode_typed_spans,
)

SEEDS = range(200)


# --- naive twins (reference-semantics loops, no numpy tricks) ---------------

def naive_subject_decode(sub, n_tokens):
    start = [i for i in range(len(sub)) if sub[i][0] > 0.6]
    end = [i for i in range(len(sub)) if sub[i][1] > 0.5]
    out = []
    for i in start:
        if i == 0 or i > n_tokens - 2:
            continue
        js = [j for j in end if j >= i]
        if js:
            j = js[0]
            if j > n_tokens - 2:
                continue
            out.append((i, j))
    return out


def naive_typed_decode(start_m, end_m):
    n_tokens = len(start_m)
    starts = [
        (i, t)
        for i in range(len(start_m))
        for t in range(len(start_m[0]))
        if start_m[i][t] > 0.5
    ]
    ends = [
        (j, t)
        for j in range(len(end_m))
        for t in range(len(end_m[0]))
        if end_m[j][t] > 0.5
    ]
    spans, end_list = [], []
    for i, t in starts:
        if i == 0 or i > n_tokens - 2:  # [CLS]/[SEP] guard
            continue
        cand = [(j, te) for j, te in ends if j >= i]
        if cand and cand[0][1] == t and cand[0][0] <= n_tokens - 2:
            spans.append((i, cand[0][0]))
            end_list.append(cand[0][0])
    return spans, end_list


def naive_po_decode(po, n_tokens):
    out = []
    L, R = len(po), len(po[0])
    starts = [(i, p) for i in range(L) for p in range(R) if po[i][p][0] > 0.6]
    ends = [(j, p) for j in range(L) for p in range(R) if po[j][p][1] > 0.5]
    for i, p1 in starts:
        if i > n_tokens - 2 or i == 0:
            continue
        for j, p2 in ends:
            if i <= j <= n_tokens - 2 and p1 == p2:
                out.append((i, j, p1))
    return out


def naive_bio_decode(text, probs, offsets):
    seq_len = len(probs)
    labels = [
        [1 if probs[i][k] >= 0.5 else 0 for k in range(len(probs[0]))]
        for i in range(1, seq_len - 1)
    ]
    off = offsets[1 : seq_len - 1]
    fired = sorted({k for row in labels for k in range(len(row)) if row[k]})
    subject_ids = sorted(
        k for k in fired if 1 < k <= 56 and (k + 55) in fired
    )

    def find(id_):
        ents = []
        for i in range(len(labels)):
            if labels[i][id_]:
                j = 0
                while i + j + 1 < len(labels) and labels[i + j + 1][1]:
                    j += 1
                ents.append(text[off[i][0] : off[i + j][1]])
        return sorted(set(ents))

    # return just the (subject_ids, per-id mentions) core — the SPO assembly
    # on top is covered by the planted/demo tests
    return subject_ids, {k: (find(k), find(k + 55)) for k in subject_ids}


# --- fuzz loops ---------------------------------------------------------------

@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_subject_decode(seed):
    rng = np.random.default_rng(seed)
    L = int(rng.integers(2, 14))
    sub = rng.random((L, 2)).astype(np.float32)
    got = decode_subject_spans(sub, L)
    want = naive_subject_decode(sub.tolist(), L)
    assert got == want


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_typed_decode(seed):
    rng = np.random.default_rng(1000 + seed)
    L = int(rng.integers(2, 10))
    # sparse fires
    start = (rng.random((L, E_NUM + 1)) > 0.9).astype(np.float32)
    end = (rng.random((L, E_NUM + 1)) > 0.9).astype(np.float32)
    spans, end_list, _ = decode_typed_spans(start, end)
    w_spans, w_ends = naive_typed_decode(start.tolist(), end.tolist())
    assert spans == w_spans and end_list == w_ends


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_po_decode(seed):
    rng = np.random.default_rng(2000 + seed)
    L = int(rng.integers(2, 8))
    po = np.where(rng.random((L, R_NUM, 2)) > 0.97, 0.95, 0.1).astype(np.float32)
    got = decode_po_for_subject(po, L)
    want = naive_po_decode(po.tolist(), L)
    assert sorted(got) == sorted(want)


@pytest.mark.parametrize("seed", range(100))
def test_fuzz_bio_core(seed):
    rng = np.random.default_rng(3000 + seed)
    L = int(rng.integers(4, 12))  # includes CLS/SEP
    text = "".join(chr(0x4E00 + int(c)) for c in rng.integers(0, 50, L - 2))
    probs = np.where(
        rng.random((L, BIO_NUM_LABELS)) > 0.985, 0.9, 0.1
    ).astype(np.float32)
    offsets = [(0, 0)] + [(i, i + 1) for i in range(L - 2)] + [(0, 0)]
    res = decode_bio_sentence(text, probs, offsets)
    subject_ids, mentions = naive_bio_decode(text, probs.tolist(), offsets)
    # every naive subject id with non-empty subject+object mention sets must
    # produce at least one SPO (and none outside the fired ids)
    fired_preds = {s["predicate"] for s in res["spo_list"]}
    from nlp_series_relation_extraction_spark.config import ID2SPO

    for k in subject_ids:
        subs, objs = mentions[k]
        if subs and objs and k not in (9, 11, 27, 28, 29, 33, 47):
            assert ID2SPO["predicate"][k] in fired_preds
    for p in fired_preds:
        assert p in ID2SPO["predicate"]


@pytest.mark.parametrize("seed", range(100))
def test_fuzz_pair_cube(seed):
    rng = np.random.default_rng(4000 + seed)
    L = int(rng.integers(2, 8))
    cube = np.where(rng.random((L, L, R_NUM)) > 0.97, 0.9, 0.1).astype(np.float32)
    k = int(rng.integers(0, L))
    spans = sorted({(max(0, e - 1), e) for e in rng.integers(0, L, k)})
    end_list = [e for _, e in spans]
    got = decode_pair_cube(cube, end_list, spans)
    # naive: iterate all cells
    want: dict = {}
    for i in range(L):
        for j in range(L):
            for p in range(R_NUM):
                if cube[i][j][p] > 0.5 and i in end_list and j in end_list:
                    s = spans[end_list.index(i)]
                    o = spans[end_list.index(j)]
                    want.setdefault(s, []).append((o[0], o[1], p))
    assert got == want
