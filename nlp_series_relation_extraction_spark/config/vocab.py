"""Label vocabularies for the DuIE-2.0 relation schema.

The reference repo carries THREE parallel numberings of the same 55-relation
schema (data parity is required, so the label strings/ids below replicate the
reference's config *data* — not its code):

* ``BAIDU_RELATION`` — 55 relation labels -> ids 0..54, n-ary predicates
  expanded as ``pred_@value`` / ``pred_inWork`` / ... (reference:
  ``config/mpn/spo_config.py:9-65``). Used by the mpn/mhs/biaffine heads.
* ``PREDICATE2ID`` — 57 token-label ids for the BIO head: ``O``=0, ``I``=1,
  then the same 55 labels at ids 2..56 (reference:
  ``config/官方baseline/predicate2id.json``). A subject label ``k`` has its
  object twin at ``k+55`` -> 112 per-token classes.
* ``SPO_TAG`` / ``ID2SPO`` — parallel predicate / subject_type / object_type
  arrays (reference: ``config/mpn/spo_config.py:68-240`` and
  ``config/官方baseline/id2spo.json``; the latter is SPO_TAG with two
  ``empty`` rows prepended).

Everything is derived from the single 55-row table ``_RELATIONS`` so the
numberings cannot drift apart.
"""

from __future__ import annotations

# (expanded_label, bare_predicate, subject_type, object_type) in
# BAIDU_RELATION id order (id = row index). object_type keeps the slot suffix
# for n-ary slots (e.g. "Date_@value", "地点_inArea") exactly as the
# reference's id2spo/SPO_TAG do.
_RELATIONS: list[tuple[str, str, str, str]] = [
    ("注册资本", "注册资本", "企业", "Number"),
    ("作者", "作者", "图书作品", "人物"),
    ("所属专辑", "所属专辑", "歌曲", "音乐专辑"),
    ("歌手", "歌手", "歌曲", "人物"),
    ("邮政编码", "邮政编码", "行政区", "Text"),
    ("主演", "主演", "影视作品", "人物"),
    ("上映时间_@value", "上映时间", "影视作品", "Date_@value"),
    ("上映时间_inArea", "上映时间", "影视作品", "地点_inArea"),
    ("饰演_@value", "饰演", "娱乐人物", "人物_@value"),
    ("饰演_inWork", "饰演", "娱乐人物", "影视作品_inWork"),
    ("国籍", "国籍", "人物", "国家"),
    ("成立日期", "成立日期", "机构", "Date"),
    ("毕业院校", "毕业院校", "人物", "学校"),
    ("作曲", "作曲", "歌曲", "人物"),
    ("作词", "作词", "歌曲", "人物"),
    ("编剧", "编剧", "影视作品", "人物"),
    ("导演", "导演", "影视作品", "人物"),
    ("面积", "面积", "行政区", "Number"),
    ("占地面积", "占地面积", "机构", "Number"),
    ("总部地点", "总部地点", "企业", "地点"),
    ("制片人", "制片人", "影视作品", "人物"),
    ("嘉宾", "嘉宾", "电视综艺", "人物"),
    ("简称", "简称", "机构", "Text"),
    ("主持人", "主持人", "电视综艺", "人物"),
    ("获奖_@value", "获奖", "娱乐人物", "奖项_@value"),
    ("获奖_inWork", "获奖", "娱乐人物", "作品_inWork"),
    ("获奖_onDate", "获奖", "娱乐人物", "Date_onDate"),
    ("获奖_period", "获奖", "娱乐人物", "Number_period"),
    ("海拔", "海拔", "地点", "Number"),
    ("出品公司", "出品公司", "影视作品", "企业"),
    ("配音_@value", "配音", "娱乐人物", "人物_@value"),
    ("配音_inWork", "配音", "娱乐人物", "影视作品_inWork"),
    ("所在城市", "所在城市", "景点", "城市"),
    ("号", "号", "历史人物", "Text"),
    ("主角", "主角", "文学作品", "人物"),
    ("创始人", "创始人", "企业", "人物"),
    ("父亲", "父亲", "人物", "人物"),
    ("祖籍", "祖籍", "人物", "地点"),
    ("母亲", "母亲", "人物", "人物"),
    ("朝代", "朝代", "历史人物", "Text"),
    ("董事长", "董事长", "企业", "人物"),
    ("人口数量", "人口数量", "行政区", "Number"),
    ("妻子", "妻子", "人物", "人物"),
    ("丈夫", "丈夫", "人物", "人物"),
    ("票房_@value", "票房", "影视作品", "Number_@value"),
    ("票房_inArea", "票房", "影视作品", "地点_inArea"),
    ("专业代码", "专业代码", "学科专业", "Text"),
    ("气候", "气候", "行政区", "气候"),
    ("修业年限", "修业年限", "学科专业", "Number"),
    ("改编自", "改编自", "影视作品", "作品"),
    ("官方语言", "官方语言", "国家", "语言"),
    ("首都", "首都", "国家", "城市"),
    ("主题曲", "主题曲", "影视作品", "歌曲"),
    ("校长", "校长", "学校", "人物"),
    ("代言人", "代言人", "企业/品牌", "人物"),
]

# --- BAIDU_RELATION numbering (mpn/mhs/biaffine heads), ids 0..54 ----------
BAIDU_RELATION: dict[str, int] = {row[0]: i for i, row in enumerate(_RELATIONS)}
ID2REL: dict[int, str] = {i: label for label, i in BAIDU_RELATION.items()}
R_NUM: int = len(BAIDU_RELATION)  # 55

SPO_TAG: dict[str, list[str]] = {
    "predicate": [row[1] for row in _RELATIONS],
    "subject_type": [row[2] for row in _RELATIONS],
    "object_type": [row[3] for row in _RELATIONS],
}

# Complex (n-ary parent) relation ids and their affiliated-slot ids in the
# BAIDU_RELATION numbering (reference: run_evaluation.py:92-93).
REL_COMPLEX_IDS: list[int] = [6, 8, 24, 30, 44]
REL_COMPLEX_AFFI_IDS: list[int] = [7, 9, 25, 26, 27, 31, 45]

# --- predicate2id numbering (BIO head): O=0, I=1, labels at 2..56 ----------
PREDICATE2ID: dict[str, int] = {"O": 0, "I": 1}
for _label, _i in BAIDU_RELATION.items():
    PREDICATE2ID[_label] = _i + 2

# id2spo: index k in [0,56]; 0/1 are the O/I placeholders ("empty").
ID2SPO: dict[str, list[str]] = {
    "predicate": ["empty", "empty"] + SPO_TAG["predicate"],
    "subject_type": ["empty", "empty"] + SPO_TAG["subject_type"],
    "object_type": ["empty", "empty"] + SPO_TAG["object_type"],
}

BIO_NUM_LABELS: int = 2 * (len(PREDICATE2ID) - 2) + 2  # 112

# Same sets in the predicate2id numbering (reference: utils/utils.py:192-193).
BIO_COMPLEX_IDS: list[int] = [8, 10, 26, 32, 46]
BIO_COMPLEX_AFFI_IDS: list[int] = [9, 11, 27, 28, 29, 33, 47]

# --- entity-type vocabulary (mhs/biaffine heads) ----------------------------
# Built exactly as the reference does (run_mhs.py:125-135): take every
# subject_type and object_type string, strip the slot suffix, dedup, sort,
# assign ids starting at 1 (0 is the "no entity" embedding row).
_types = [t.split("_")[0] for t in SPO_TAG["subject_type"] + SPO_TAG["object_type"]]
_types = sorted(set(_types))
ENTITY_TYPE_TO_ID: dict[str, int] = {t: i + 1 for i, t in enumerate(_types)}
E_NUM: int = len(ENTITY_TYPE_TO_ID)  # 26


def vocab_dimension_rows() -> dict[str, list[tuple]]:
    """Vocabularies as rows for tiny broadcast dimension tables."""
    return {
        "baidu_relation": [(label, i) for label, i in BAIDU_RELATION.items()],
        "predicate2id": [(label, i) for label, i in PREDICATE2ID.items()],
        "spo_tag": [
            (i, row[1], row[2], row[3]) for i, row in enumerate(_RELATIONS)
        ],
        "id2spo": [
            (i, p, s, o)
            for i, (p, s, o) in enumerate(
                zip(
                    ID2SPO["predicate"],
                    ID2SPO["subject_type"],
                    ID2SPO["object_type"],
                )
            )
        ],
        "entity_type": [(t, i) for t, i in ENTITY_TYPE_TO_ID.items()],
    }
