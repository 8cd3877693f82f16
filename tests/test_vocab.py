"""Vocabulary parity vs the reference's config data + id arithmetic."""

import json
import os

import pytest

from nlp_series_relation_extraction_spark.config import (
    BAIDU_RELATION,
    BIO_COMPLEX_AFFI_IDS,
    BIO_COMPLEX_IDS,
    ENTITY_TYPE_TO_ID,
    ID2SPO,
    PREDICATE2ID,
    REL_COMPLEX_AFFI_IDS,
    REL_COMPLEX_IDS,
    SPO_TAG,
    BIO_NUM_LABELS,
    E_NUM,
    R_NUM,
)

REF = "/root/reference"


def test_sizes():
    assert R_NUM == 55
    assert len(PREDICATE2ID) == 57
    assert BIO_NUM_LABELS == 112
    assert E_NUM == 26
    assert len(ID2SPO["predicate"]) == 57


def test_id_arithmetic():
    # BIO numbering = BAIDU numbering + 2 (O=0, I=1 prefix)
    for label, rid in BAIDU_RELATION.items():
        assert PREDICATE2ID[label] == rid + 2
    # complex/affiliated sets are the same ids in both numberings
    assert [i - 2 for i in BIO_COMPLEX_IDS] == REL_COMPLEX_IDS
    assert [i - 2 for i in BIO_COMPLEX_AFFI_IDS] == REL_COMPLEX_AFFI_IDS


def test_nary_slot_structure():
    # every complex id's affiliated ids carry a slot suffix in object_type
    for p in REL_COMPLEX_AFFI_IDS:
        assert "_" in SPO_TAG["object_type"][p]
    # 获奖 (24) has three affiliated slots 25..27; others are id+1 adjacency
    assert SPO_TAG["predicate"][24] == "获奖"
    for p in (25, 26, 27):
        assert SPO_TAG["predicate"][p] == "获奖"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not present")
def test_parity_with_reference_configs():
    with open(f"{REF}/config/官方baseline/predicate2id.json") as f:
        assert PREDICATE2ID == json.load(f)
    with open(f"{REF}/config/官方baseline/id2spo.json") as f:
        assert ID2SPO == json.load(f)
    ns: dict = {}
    exec(open(f"{REF}/config/mpn/spo_config.py").read(), ns)
    assert BAIDU_RELATION == ns["BAIDU_RELATION"]
    assert SPO_TAG == ns["SPO_TAG"]


def test_entity_type_build_matches_reference_recipe():
    # rebuild exactly as run_mhs.py:125-135 does and compare
    s_type = [
        x.split("_")[0]
        for x in SPO_TAG["subject_type"] + SPO_TAG["object_type"]
    ]
    s_type = sorted(set(s_type))
    assert ENTITY_TYPE_TO_ID == {t: i + 1 for i, t in enumerate(s_type)}
