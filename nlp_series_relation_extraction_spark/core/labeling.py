"""Gold-triple -> label planting with reference-parity search semantics.

These functions turn a sentence's gold ``spo_list`` into the per-token label
structures each head is trained on. In this engine they power the
``PlantedEncoder`` (fixtures/tests: labels become probabilities, so the decode
path can be verified end-to-end against gold) and the training-label stage.

Reference semantics replicated exactly:

* overlap-aware longest-first subsequence search: the longer of
  (subject, object) token sequences is located first; the shorter one must not
  start inside the first's span unless nothing else matches
  (``dataset/data_utils.py:114-161`` ``search_spo_index``; BIO variant at
  ``dataset/dataset_baseline.py:93-141``), with a plain first-match fallback
  (``search``, ``dataset/data_utils.py:163-171``).
* BIO: per-token multi-hot over 112 classes; subject tokens get the predicate
  id ``k`` (predicate2id numbering), object tokens ``k+55``, continuation
  tokens the ``I``=1 label, untouched tokens ``O``=0
  (``dataset/dataset_baseline.py:67-144``).
* mpn/mhs: span dict ``spoes[(s_start, s_end)] -> [(o_start, o_end, pred)]``
  over [CLS]-framed token indices; n-ary affiliated slots are re-rooted as
  their own subjects (``dataset/dataset_mpn.py:44-90``); mhs adds entity-type
  ids on both spans (``dataset/dataset_mhs.py:44-99``).
"""

from __future__ import annotations

from typing import Any

from ..config import (
    BAIDU_RELATION,
    ENTITY_TYPE_TO_ID,
    PREDICATE2ID,
    REL_COMPLEX_AFFI_IDS,
    BIO_NUM_LABELS,
)
from .tokenization import tokenize_framed, tokenize_with_orig_index


def search(pattern: list, sequence: list) -> int:
    """First index of sub-list ``pattern`` in ``sequence``; -1 if absent."""
    n = len(pattern)
    for i in range(len(sequence) - n + 1):
        if sequence[i : i + n] == pattern:
            return i
    return -1


def search_spo_index(
    tokens: list[str],
    subject_tokens: list[str],
    object_tokens: list[str],
) -> tuple[int, int]:
    """Overlap-aware longest-first search for both entity token runs.

    Returns (subject_start, object_start), -1 when not found. The longer
    entity is located first and its span becomes forbidden for the shorter
    one's start index.
    """
    if len(subject_tokens) > len(object_tokens):
        first, second = subject_tokens, object_tokens
    else:
        first, second = object_tokens, subject_tokens

    first_start = search(first, tokens)
    second_start = -1
    n = len(second)
    for i in range(len(tokens) - n + 1):
        if tokens[i : i + n] == second:
            if first_start == -1:
                second_start = i
                break
            if i < first_start or i >= first_start + len(first):
                second_start = i
                break

    if len(subject_tokens) > len(object_tokens):
        return first_start, second_start
    return second_start, first_start


def _iter_spo_slots(spo: dict[str, Any]):
    """Yield one (slot_name, object_text) per key of the object map — the
    reference iterates ``spo['object'].keys()`` so each n-ary slot becomes its
    own labeled pair."""
    for slot in spo["object"].keys():
        yield slot, spo["object"][slot]


def bio_token_labels(
    text: str, spo_list: list[dict], max_len: int | None = None
) -> dict[str, Any]:
    """Per-token 112-class multi-hot labels for the BIO head plus the entity
    list, over [CLS]-framed tokens (reference dataset_baseline.py:50-154).

    ``max_len`` mirrors the reference's collate-time truncation
    (dataset_baseline.py:180-186): labels are planted over the FULL token
    list, then tokens/offsets/labels are plain-sliced to max_len (the BIO
    path slices — no [SEP] preservation — unlike the mpn/mhs encode path).
    """
    from .tokenization import tokenize_for_bio

    tokens, offsets = tokenize_for_bio(text)
    seq_len = len(tokens)
    labels = [[0] * BIO_NUM_LABELS for _ in range(seq_len)]
    ent_list: list[str] = []

    def tokenize_entity(ent: str) -> list[str]:
        return tokenize_with_orig_index(ent).tokens

    def plant(run: list[str], label: int, forbidden: int | None, flen: int) -> int | None:
        """Label first non-forbidden occurrence of ``run``; return its start."""
        n = len(run)
        for index in range(seq_len - n + 1):
            if tokens[index : index + n] == run:
                if forbidden is not None and forbidden <= index < forbidden + flen:
                    continue
                labels[index][label] = 1
                for i in range(n - 1):
                    labels[index + i + 1][1] = 1
                return index
        return None

    for spo in spo_list:
        for slot, obj_text in _iter_spo_slots(spo):
            if spo["predicate"] in PREDICATE2ID:
                label_subject = PREDICATE2ID[spo["predicate"]]
                obj_value = spo["object"]["@value"]
            else:
                label_subject = PREDICATE2ID[spo["predicate"] + "_" + slot]
                obj_value = spo["object"][slot]
            label_object = label_subject + 55
            subject_tokens = tokenize_entity(spo["subject"])
            object_tokens = tokenize_entity(obj_value)
            ent_list.append(obj_value)
            ent_list.append(spo["subject"])
            if not subject_tokens or not object_tokens:
                continue
            # longest-first with overlap forbidding, as in the reference
            if len(subject_tokens) > len(object_tokens):
                fst = plant(subject_tokens, label_subject, None, 0)
                plant(
                    object_tokens,
                    label_object,
                    fst,
                    len(subject_tokens) if fst is not None else 0,
                )
            else:
                fst = plant(object_tokens, label_object, None, 0)
                plant(
                    subject_tokens,
                    label_subject,
                    fst,
                    len(object_tokens) if fst is not None else 0,
                )

    for i in range(seq_len):
        if not any(labels[i]):
            labels[i][0] = 1

    if max_len is not None and seq_len > max_len:
        tokens = tokens[:max_len]
        offsets = offsets[:max_len]
        labels = labels[:max_len]

    return {
        "tokens": tokens,
        "offset_mapping": offsets,
        "labels": labels,
        "entity_list": ent_list,
    }


def span_gold_spoes(
    text: str, spo_list: list[dict], with_types: bool = False
) -> dict[str, Any]:
    """Gold span dict for the mpn (untyped) / mhs (typed) heads.

    Returns tokens, orig-index maps, ``spoes`` mapping subject span tuples to
    lists of object tuples, and the subject entity list. Span indices are over
    the [CLS]-framed token list. ``with_types`` adds entity-type ids on both
    span tuples (mhs/biaffine shape).
    """
    tokens, tok_start, tok_end = tokenize_framed(text)
    spoes: dict[tuple, list[tuple]] = {}
    sub_ent_list: list[str] = []

    for spo in spo_list:
        for slot, _ in _iter_spo_slots(spo):
            obj_type_label = (
                ENTITY_TYPE_TO_ID.get(spo["object_type"][slot]) if with_types else None
            )
            if spo["predicate"] in BAIDU_RELATION:
                predicate_label = BAIDU_RELATION[spo["predicate"]]
                subject_text = spo["subject"]
                object_text = spo["object"]["@value"]
                subj_type_label = (
                    ENTITY_TYPE_TO_ID.get(spo["subject_type"]) if with_types else None
                )
            else:
                predicate_label = BAIDU_RELATION[spo["predicate"] + "_" + slot]
                object_text = spo["object"][slot]
                if predicate_label in REL_COMPLEX_AFFI_IDS:
                    # affiliated slot is re-rooted: its subject is the parent
                    # @value object (reference dataset_mpn.py:62-74)
                    subject_text = spo["object"]["@value"]
                    subj_type_label = (
                        ENTITY_TYPE_TO_ID.get(spo["object_type"]["@value"])
                        if with_types
                        else None
                    )
                else:
                    subject_text = spo["subject"]
                    subj_type_label = (
                        ENTITY_TYPE_TO_ID.get(spo["subject_type"])
                        if with_types
                        else None
                    )
            sub_ent_list.append(subject_text)

            subject_tokens = tokenize_with_orig_index(subject_text).tokens
            object_tokens = tokenize_with_orig_index(object_text).tokens
            if not subject_tokens or not object_tokens:
                continue
            subject_start, object_start = search_spo_index(
                tokens, subject_tokens, object_tokens
            )
            if subject_start == -1:
                subject_start = search(subject_tokens, tokens)
            if object_start == -1:
                object_start = search(object_tokens, tokens)
            if subject_start != -1 and object_start != -1:
                if with_types:
                    s = (
                        subject_start,
                        subject_start + len(subject_tokens) - 1,
                        subj_type_label,
                    )
                    o = (
                        object_start,
                        object_start + len(object_tokens) - 1,
                        obj_type_label,
                        predicate_label,
                    )
                else:
                    s = (subject_start, subject_start + len(subject_tokens) - 1)
                    o = (
                        object_start,
                        object_start + len(object_tokens) - 1,
                        predicate_label,
                    )
                spoes.setdefault(s, []).append(o)

    return {
        "tokens": tokens,
        "tok_to_orig_start": tok_start,
        "tok_to_orig_end": tok_end,
        "spoes": spoes,
        "sub_entity_list": sub_ent_list,
    }
