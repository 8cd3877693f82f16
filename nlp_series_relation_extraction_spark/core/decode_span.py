"""Span-pair decoding shared by the mpn / mhs / biaffine heads.

Replicates, in numpy, the reference's decode path:

* **subject pointer decode** (mpn): start prob > 0.6, end prob > 0.5, nearest
  following end (``end[end >= i][0]``), [CLS]/[SEP] positions excluded
  (``models/model_mpn.py:157-178``).
* **typed span decode** (mhs/biaffine): per-token per-entity-type start/end
  probs > 0.5; a span pairs a start with the nearest following end and fires
  only when the FIRST such end's type equals the start's type (``te[0]==t``,
  ``models/model_mhs.py:79-90``, ``models/model_mhs_biaffine.py:111-124``).
* **object decode per subject** (mpn): po probs [L, R, 2]; starts > 0.6,
  ends > 0.5, same predicate, start <= end <= len(tokens)-2, start not at
  [CLS] (``run_evaluation.py:23-53`` ``convert_spo_contour``).
* **pair-score decode** (mhs/biaffine): [L, L, R] cube > 0.5 where both
  indices are known span ENDS (``run_evaluation.py:55-83``).
* **span -> SPO assembly** ``convert2ressult`` (``run_evaluation.py:85-176``):
  map token spans to raw-text mentions via tok_to_orig maps (note the -1
  shift: span indices count [CLS]), strip '\\xa0', sort po by predicate id,
  drop affiliated-id rows, attach n-ary slots from the object-span's own
  spoes entry (id+1 adjacency, or {25,26,27} for 获奖=24), with a
  text-equality fallback (``check_object``) when the object span itself is
  not a subject key.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from ..config import ID2REL, REL_COMPLEX_AFFI_IDS, REL_COMPLEX_IDS, SPO_TAG

SUBJECT_START_THRESHOLD = 0.6
SUBJECT_END_THRESHOLD = 0.5
OBJECT_START_THRESHOLD = 0.6
OBJECT_END_THRESHOLD = 0.5
PAIR_SCORE_THRESHOLD = 0.5


def decode_subject_spans(sub_probs: np.ndarray, n_tokens: int) -> list[tuple[int, int]]:
    """mpn subject pointer decode. ``sub_probs``: [L, 2] sigmoid probs over
    [CLS]-framed positions. Returns (start, end) token-index pairs."""
    start = np.nonzero(sub_probs[:, 0] > SUBJECT_START_THRESHOLD)[0]
    end = np.nonzero(sub_probs[:, 1] > SUBJECT_END_THRESHOLD)[0]
    subjects: list[tuple[int, int]] = []
    for i in start:
        if i == 0 or i > n_tokens - 2:
            continue
        j = end[end >= i]
        if len(j) > 0:
            j0 = int(j[0])
            if j0 > n_tokens - 2:
                continue
            subjects.append((int(i), j0))
    return subjects


def decode_typed_spans(
    start_probs: np.ndarray,
    end_probs: np.ndarray,
    n_tokens: int | None = None,
) -> tuple[list[tuple[int, int]], list[int], dict[int, int]]:
    """mhs/biaffine typed span decode. ``start_probs``/``end_probs``:
    [L, E+1] sigmoid probs. Returns (spans, end_positions, end_pos->type).

    Deliberate robustness deviation from the reference: spans anchored at
    [CLS] (index 0) or reaching [SEP]/beyond (> n_tokens-2) are excluded,
    matching the mpn subject guards (model_mpn.py:169-174). The reference's
    mhs decode has no such guard and its span->text reconstruction then
    indexes tok_to_orig[-1] (silent wraparound) or past the end (crash) —
    reachable only when the encoder fires on special-token positions, which
    a trained model rarely does but a stand-in encoder will.
    """
    if n_tokens is None:
        n_tokens = start_probs.shape[0]
    start, start_tp = np.nonzero(start_probs > PAIR_SCORE_THRESHOLD)
    end, end_tp = np.nonzero(end_probs > PAIR_SCORE_THRESHOLD)
    spans: list[tuple[int, int]] = []
    end_list: list[int] = []
    end_type: dict[int, int] = {}
    for i, t in zip(start, start_tp):
        if i == 0 or i > n_tokens - 2:
            continue
        sel = end >= i
        j = end[sel]
        te = end_tp[sel]
        if len(j) > 0 and te[0] == t:
            j0 = int(j[0])
            if j0 > n_tokens - 2:
                continue
            spans.append((int(i), j0))
            end_list.append(j0)
            end_type[j0] = int(t)
    return spans, end_list, end_type


def decode_po_for_subject(
    po_probs: np.ndarray, n_tokens: int
) -> list[tuple[int, int, int]]:
    """mpn object decode for one (sentence, subject) row. ``po_probs``:
    [L, R, 2]. Returns (o_start, o_end, predicate) tuples; bounds mirror
    convert_spo_contour (start>0 and start<=end<=len-2)."""
    s_pos, s_pred = np.nonzero(po_probs[:, :, 0] > OBJECT_START_THRESHOLD)
    e_pos, e_pred = np.nonzero(po_probs[:, :, 1] > OBJECT_END_THRESHOLD)
    out: list[tuple[int, int, int]] = []
    for _start, predicate1 in zip(s_pos, s_pred):
        if _start > n_tokens - 2 or _start == 0:
            continue
        for _end, predicate2 in zip(e_pos, e_pred):
            if _start <= _end <= n_tokens - 2 and predicate1 == predicate2:
                out.append((int(_start), int(_end), int(predicate1)))
    return out


def decode_pair_cube(
    cube: np.ndarray,
    end_list: list[int],
    spans: list[tuple[int, int]],
    is_subcube: bool = False,
) -> dict[tuple[int, int], list[tuple[int, int, int]]]:
    """mhs/biaffine triple decode: score cube > 0.5 at positions
    (s_end, o_end, pred) where both ends are known span ends. Returns
    spoes[(s_start, s_end)] -> [(o_start, o_end, pred)].

    ``cube`` is either the full [L, L, R] tensor, or (``is_subcube=True``)
    the [E, E, R] restriction to sorted-unique span ends as produced by
    ``HashEncoder.pair_cube_at`` — the hash path computes only that
    restriction since nothing else is ever read."""
    spoes: dict[tuple[int, int], list[tuple[int, int, int]]] = {}
    if not end_list:
        return spoes
    # only span-end rows/cols participate: a handful of positions, vs the
    # full nonzero scan's tens of thousands of interpreted iterations per
    # sentence at L=200. ``ends`` is sorted-unique; the FIRST span carrying
    # each end wins, matching end_list.index() (reference convert_spo_contour2).
    ends = sorted(set(end_list))
    first_span = {e: spans[end_list.index(e)] for e in ends}
    sub = cube if is_subcube else cube[np.ix_(ends, ends)]
    for si, oi, predicate in zip(*np.nonzero(sub > PAIR_SCORE_THRESHOLD)):
        s = first_span[ends[int(si)]]
        o = first_span[ends[int(oi)]]
        spoes.setdefault(s, []).append((o[0], o[1], int(predicate)))
    return spoes


def subject_mention(
    context: str, span: tuple[int, int], tok_start: list[int], tok_end: list[int]
) -> str:
    """Raw-text mention for a [CLS]-framed token span (no \\xa0 strip — that
    happens in convert2ressult, matching the reference's asymmetry where the
    entity list keeps \\xa0 but SPO mentions strip it)."""
    return context[tok_start[span[0] - 1] : tok_end[span[1] - 1] + 1]


def convert_spoes_to_result(
    context: str,
    spoes: dict[tuple[int, int], list[tuple[int, int, int]]],
    tok_start: list[int],
    tok_end: list[int],
) -> list[dict]:
    """Assemble SPO dicts from span-level spoes (convert2ressult parity)."""

    def mention(o1: int, o2: int) -> str:
        return context[tok_start[o1 - 1] : tok_end[o2 - 1] + 1].replace("\xa0", "")

    po_predict: list[dict] = []
    for s, po in spoes.items():
        po = sorted(po, key=lambda x: x[2])
        sub_ent = mention(s[0], s[1])
        for o1, o2, p in po:
            if p in REL_COMPLEX_AFFI_IDS:
                continue
            obj_ent = mention(o1, o2)
            object_dict = {"@value": obj_ent}
            object_type_dict = {"@value": SPO_TAG["object_type"][p].split("_")[0]}
            predicate = (
                ID2REL[p].split("_")[0] if p in REL_COMPLEX_IDS else ID2REL[p]
            )

            if p in REL_COMPLEX_IDS:
                # the object span may itself be a subject key whose po list
                # carries the affiliated slots; fall back to text equality
                oo1, oo2 = o1, o2
                if (oo1, oo2) not in spoes:
                    oo1, oo2 = -1, -1
                    for o1_, o2_ in spoes.keys():
                        if mention(o1_, o2_) == obj_ent:
                            oo1, oo2 = o1_, o2_
                            break
                candidate: dict[int, tuple[int, int]] = {}
                if (oo1, oo2) in spoes:
                    if p == 24:
                        for o1_, o2_, p_ in spoes[(oo1, oo2)]:
                            if p_ in [25, 26, 27]:
                                candidate[p_] = (o1_, o2_)
                    else:
                        for o1_, o2_, p_ in spoes[(oo1, oo2)]:
                            if p + 1 == p_:
                                candidate[p_] = (o1_, o2_)
                for p_, (o1_, o2_) in candidate.items():
                    slot = ID2REL[p_].split("_")[1]
                    object_dict[slot] = mention(o1_, o2_)
                    object_type_dict[SPO_TAG["object_type"][p_].split("_")[1]] = (
                        SPO_TAG["object_type"][p_].split("_")[0]
                    )

            po_predict.append(
                {
                    "predicate": predicate,
                    "object": object_dict,
                    "object_type": object_type_dict,
                    "subject": sub_ent,
                    "subject_type": SPO_TAG["subject_type"][p],
                }
            )
    return po_predict


def decode_span_sentence(
    context: str,
    spoes: dict[tuple[int, int], list[tuple[int, int, int]]],
    tok_start: list[int],
    tok_end: list[int],
    subject_spans: list[tuple[int, int]],
) -> dict[str, Any]:
    """Full per-sentence assembly: entity mentions (one per decoded subject
    span, \\xa0 kept) + SPO list (convert2ressult semantics)."""
    entity_list = [
        subject_mention(context, s, tok_start, tok_end) for s in subject_spans
    ]
    spo_list = convert_spoes_to_result(context, spoes, tok_start, tok_end)
    return {"entity_list": entity_list, "spo_list": spo_list}
