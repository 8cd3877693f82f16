"""BIO-head threshold decoding: per-token 112-class probs -> SPO triples.

Replicates the reference decode semantics exactly (``utils/utils.py:148-273``):

* slice logits/offsets to the valid token range between [CLS] and [SEP];
* binarize at 0.5;
* a predicate id ``k`` (2..56) fires only if its object twin ``k+55`` also
  fired somewhere in the sentence;
* entity spans grow from a start-tagged token over following ``I``-tagged
  tokens; mention text is sliced from the raw text via the char offset
  mapping; duplicate mentions are set-deduped (order then is Python-set
  iteration order — we sort for determinism at the *output* boundary only);
* subjects x objects cross product per predicate;
* complex (n-ary) predicate ids {8,10,26,32,46} pull affiliated slot objects
  from ids {9,11,27,28,29,33,47}: id+1 adjacency for {8,10,32,46}, the fixed
  set {27,28,29} for 获奖=26; the FIRST found affiliated mention is attached
  (``find_entity(...)[0]``).

Implementation is numpy-vectorized per sentence (no torch).
"""

from __future__ import annotations

from typing import Any

import numpy as np

from ..config import BIO_COMPLEX_AFFI_IDS, BIO_COMPLEX_IDS, ID2SPO


def find_entities(
    text_raw: str,
    label_id: int,
    label_matrix: np.ndarray,
    offsets: list[tuple[int, int]],
) -> list[str]:
    """All distinct mentions whose start token carries ``label_id``.

    ``label_matrix`` is the [L_valid, 112] binarized prediction matrix
    (CLS/SEP already sliced off); ``offsets`` the matching offset pairs.
    Span growth: from a start hit at i, extend while following tokens carry
    the I label (id 1); slice text_raw[offsets[i][0] : offsets[i+j][1]].
    """
    entity_list: list[str] = []
    n = label_matrix.shape[0]
    i_col = label_matrix[:, 1]
    for i in np.nonzero(label_matrix[:, label_id])[0]:
        j = 0
        while i + j + 1 < n and i_col[i + j + 1]:
            j += 1
        entity_list.append(text_raw[offsets[i][0] : offsets[i + j][1]])
    # set-dedup, sorted for deterministic downstream ordering
    return sorted(set(entity_list))


def decode_bio_sentence(
    text_raw: str,
    probs: np.ndarray,
    offsets: list[tuple[int, int]],
) -> dict[str, Any]:
    """Decode one sentence. ``probs``: [L, 112] over [CLS]-framed tokens;
    ``offsets``: matching offset_mapping pairs. Returns entity mentions and
    SPO dicts shaped like the input data files."""
    seq_len = probs.shape[0]
    # keep logits between [CLS] and [SEP] (reference utils.py:182-185)
    labels = (probs[1 : seq_len - 1] >= 0.5).astype(np.int8)
    off = offsets[1 : seq_len - 1]

    fired = np.nonzero(labels.any(axis=0))[0]
    fired_set = set(int(x) for x in fired)
    subject_id_list = sorted(
        k for k in fired_set if 1 < k <= 56 and (k + 55) in fired_set
    )

    entity_list: list[str] = []
    spo_list: list[dict] = []
    for id_ in subject_id_list:
        if id_ in BIO_COMPLEX_AFFI_IDS:
            continue  # attached below from their parent id
        subjects = find_entities(text_raw, id_, labels, off)
        objects = find_entities(text_raw, id_ + 55, labels, off)
        if id_ not in BIO_COMPLEX_IDS:
            for subject_ in subjects:
                for object_ in objects:
                    spo_list.append(
                        {
                            "predicate": ID2SPO["predicate"][id_],
                            "object": {"@value": object_},
                            "object_type": {"@value": ID2SPO["object_type"][id_]},
                            "subject": subject_,
                            "subject_type": ID2SPO["subject_type"][id_],
                        }
                    )
        else:
            # affiliated-slot lookups are invariant over the subject x object
            # double loop below — hoist them (find_entities is deterministic)
            affi_slots: list[tuple[str, str, str]] = []  # (slot, mention, type)
            if id_ in [8, 10, 32, 46] and (id_ + 1) in subject_id_list:
                id_affi = id_ + 1
                affi = find_entities(text_raw, id_affi + 55, labels, off)
                if affi:
                    affi_slots.append(
                        (
                            ID2SPO["object_type"][id_affi].split("_")[1],
                            affi[0],
                            ID2SPO["object_type"][id_affi].split("_")[0],
                        )
                    )
            elif id_ == 26:
                for id_affi in [27, 28, 29]:
                    if id_affi in subject_id_list:
                        affi = find_entities(text_raw, id_affi + 55, labels, off)
                        if affi:
                            affi_slots.append(
                                (
                                    ID2SPO["object_type"][id_affi].split("_")[1],
                                    affi[0],
                                    ID2SPO["object_type"][id_affi].split("_")[0],
                                )
                            )
            for subject_ in subjects:
                for object_ in objects:
                    object_dict = {"@value": object_}
                    object_type_dict = {
                        "@value": ID2SPO["object_type"][id_].split("_")[0]
                    }
                    for slot, mention, slot_type in affi_slots:
                        object_dict[slot] = mention
                        object_type_dict[slot] = slot_type
                    spo_list.append(
                        {
                            "predicate": ID2SPO["predicate"][id_],
                            "object": object_dict,
                            "object_type": object_type_dict,
                            "subject": subject_,
                            "subject_type": ID2SPO["subject_type"][id_],
                        }
                    )
        entity_list.extend(subjects)
        entity_list.extend(objects)

    return {"entity_list": entity_list, "spo_list": spo_list}
