"""Deterministic synthetic transcripts generator (FIXTURES.md §1-2).

Generates the BASELINE.json input_hint table
``transcripts(conv_id, turn_idx, role, text, tool, ts)`` plus per-turn gold
``spo_list`` (JSON column), with text patterns modeled on the reference demo
data (``data/duie_demon.json``): simple triples, n-ary slot predicates
(获奖 with inWork/onDate, 上映时间 with inArea), symmetric 丈夫/妻子
pairs, overlapping
subject==object mentions, mixed-script/digit runs, ``®``/``◆``/``\\xa0``
noise, empty-gold tool turns, hot-skew entities, and a tail of
100+-turn conversations.

Generation is a pure function of (seed, global_turn_index), so it can run
driver-side (pandas, for the oracle) or fully distributed
(``spark.range(n) -> mapInPandas``) with identical output — no collected
state, no driver bottleneck, works at any scale.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd

# --- deterministic entity pools ---------------------------------------------
_SURNAMES = "李王张刘陈杨赵黄周吴徐孙胡朱高林何郭马罗"
_GIVEN = "伟芳娜敏静丽强磊军洋勇艳杰娟涛明超秀兰霞平"
_WORK_CHARS = "星河山海花月雪风云龙凤春秋城传奇缘梦影歌"
_PLACE_CHARS = "北南东西安宁昌庆阳州京津沪杭苏广深成渝"
_AWARD_NAMES = ["金像奖", "金马奖", "金鸡奖", "百花奖", "飞天奖"]
_COUNTRIES = ["中国", "摩尔多瓦", "法国", "日本", "新加坡", "意大利"]
_CAPITALS = ["北京", "基希讷乌", "巴黎", "东京", "新加坡市", "罗马"]
# hot entity for skew-handling tests: appears in ~4% of turns
# (1 of 12 templates at 50% probability)
_HOT_PERSON = "周星驰"
_ASCII_NAMES = ["fresh果果", "Angelababy", "TFBOYS", "S.H.E"]

_TOOLS = ["search", "kb_lookup", "translate", None]

LONG_CONV_SPAN = 13  # first 13 of every 64 base convs merge into one long conv
BASE_CONV_LEN = 8


def _rng(seed: int, idx: int) -> np.random.Generator:
    # mod 2**64 BEFORE the uint64 cast: beyond idx ~ 6.9e9 the raw product
    # exceeds the uint64 range and np.uint64() raises OverflowError
    return np.random.default_rng(
        np.uint64((seed * 1_000_003 + idx * 2_654_435_761) % (2**64))
    )


def _person(rng) -> str:
    return (
        _SURNAMES[rng.integers(len(_SURNAMES))]
        + _GIVEN[rng.integers(len(_GIVEN))]
        + _GIVEN[rng.integers(len(_GIVEN))]
    )


def _work(rng) -> str:
    k = int(rng.integers(2, 5))
    return "".join(_WORK_CHARS[rng.integers(len(_WORK_CHARS))] for _ in range(k))


def _place(rng) -> str:
    return "".join(_PLACE_CHARS[rng.integers(len(_PLACE_CHARS))] for _ in range(2))


def _date(rng) -> str:
    return f"{rng.integers(1980, 2021)}年{rng.integers(1, 13)}月{rng.integers(1, 29)}日"


def _spo(pred, subj, s_type, obj_map, ot_map) -> dict:
    return {
        "predicate": pred,
        "subject": subj,
        "subject_type": s_type,
        "object": obj_map,
        "object_type": ot_map,
    }


def _gen_turn(seed: int, idx: int) -> tuple[str, list[dict]]:
    """(text, gold spo_list) for one global turn index."""
    rng = _rng(seed, idx)
    kind = int(rng.integers(0, 12))

    if kind == 0:  # 作者: book by person
        w, p = _work(rng), _person(rng)
        text = f"《{w}》是{p}写的网络小说，连载于起点中文网"
        gold = [_spo("作者", w, "图书作品", {"@value": p}, {"@value": "人物"})]
    elif kind == 1:  # 改编自 + 作者 (two triples, shared mention)
        w1, w2, p = _work(rng), _work(rng), _person(rng)
        if w1 == w2:
            w2 = w2 + "传"
        text = f"电视剧《{w1}》改编自{p}所著的同名小说《{w2}》"
        gold = [
            _spo("改编自", w1, "影视作品", {"@value": w2}, {"@value": "作品"}),
            _spo("作者", w2, "图书作品", {"@value": p}, {"@value": "人物"}),
        ]
    elif kind == 2:  # 首都
        i = int(rng.integers(len(_COUNTRIES)))
        text = f"{_COUNTRIES[i]}是位于欧亚大陆的国家，首都{_CAPITALS[i]}"
        gold = [
            _spo("首都", _COUNTRIES[i], "国家", {"@value": _CAPITALS[i]}, {"@value": "城市"})
        ]
    elif kind == 3:  # symmetric 丈夫/妻子
        p1, p2 = _person(rng), _person(rng)
        if p1 == p2:
            p2 = p2 + "生"
        text = f"{p1}的丈夫是{p2}，两人于{_date(rng)}结婚"
        gold = [
            _spo("丈夫", p1, "人物", {"@value": p2}, {"@value": "人物"}),
            _spo("妻子", p2, "人物", {"@value": p1}, {"@value": "人物"}),
        ]
    elif kind == 4:  # n-ary 获奖 (@value + inWork + onDate)
        p, w = _person(rng), _work(rng)
        award, d = _AWARD_NAMES[rng.integers(len(_AWARD_NAMES))], _date(rng)
        text = f"{p}凭借《{w}》于{d}获得{award}"
        gold = [
            _spo(
                "获奖",
                p,
                "娱乐人物",
                {"@value": award, "inWork": w, "onDate": d},
                {"@value": "奖项", "inWork": "作品", "onDate": "Date"},
            )
        ]
    elif kind == 5:  # n-ary 上映时间 (@value + inArea)
        w, d, r = _work(rng), _date(rng), _place(rng)
        text = f"电影《{w}》于{d}在{r}地区上映"
        gold = [
            _spo(
                "上映时间",
                w,
                "影视作品",
                {"@value": d, "inArea": r},
                {"@value": "Date", "inArea": "地点"},
            )
        ]
    elif kind == 6:  # 主演 with the hot-skew entity 50% of the time
        w = _work(rng)
        p = _HOT_PERSON if rng.random() < 0.5 else _person(rng)
        text = f"电影《{w}》由{p}主演，票房口碑双丰收"
        gold = [_spo("主演", w, "影视作品", {"@value": p}, {"@value": "人物"})]
    elif kind == 7:  # 国籍 with ascii-run name
        p = _ASCII_NAMES[rng.integers(len(_ASCII_NAMES))]
        c = _COUNTRIES[rng.integers(len(_COUNTRIES))]
        text = f"{p}是{c}籍艺人，国籍为{c}"
        gold = [_spo("国籍", p, "人物", {"@value": c}, {"@value": "国家"})]
    elif kind == 8:  # 歌手 + 作曲 two triples
        w, p1, p2 = _work(rng), _person(rng), _person(rng)
        text = f"歌曲《{w}》由{p1}演唱，{p2}作曲"
        gold = [
            _spo("歌手", w, "歌曲", {"@value": p1}, {"@value": "人物"}),
            _spo("作曲", w, "歌曲", {"@value": p2}, {"@value": "人物"}),
        ]
    elif kind == 9:  # overlapping subject == object (demo line 1 pattern)
        w, p = _work(rng), _person(rng)
        text = f"电视剧《{w}》改编自{p}同名小说《{w}》"
        gold = [
            _spo("改编自", w, "影视作品", {"@value": w}, {"@value": "作品"}),
            _spo("作者", w, "图书作品", {"@value": p}, {"@value": "人物"}),
        ]
    elif kind == 10:  # noise turn with ®◆\xa0 + digit/letter runs, no gold
        n1, n2 = int(rng.integers(10, 99)), int(rng.integers(100, 999))
        text = f"检测结果®：TGA{n1}%～{n2}◆项指标\xa0正常，详见报告HTTP200"
        gold = []
    else:  # tool/log turn, ascii only, no gold
        code = int(rng.integers(1000, 9999))
        text = f"tool output: status=ok latency_ms={code} rows=42"
        gold = []
    return text, gold


def conv_key(idx: int) -> tuple[str, int]:
    """Map a global turn index to (conv_id, turn_idx).

    Base layout: 8-turn conversations. Within every 64-conversation group,
    the first LONG_CONV_SPAN base convs merge into a single long conversation
    (104 turns) so per-conv-id skew and 100+-turn ordering are exercised.
    Pure arithmetic — invertible, no scan.
    """
    conv_num = idx // BASE_CONV_LEN
    within = idx % BASE_CONV_LEN
    group, pos = divmod(conv_num, 64)
    if pos < LONG_CONV_SPAN:
        return f"conv_{group * 64:08d}L", pos * BASE_CONV_LEN + within
    return f"conv_{conv_num:08d}", within


def gen_rows(seed: int, indices: np.ndarray) -> pd.DataFrame:
    """Generate transcript rows (with gold_json) for given global indices."""
    rows = []
    base_ts = pd.Timestamp("2024-01-01")
    for idx in indices:
        idx = int(idx)
        text, gold = _gen_turn(seed, idx)
        cid, tix = conv_key(idx)
        role = ("user", "assistant", "tool")[idx % 3]
        tool = _TOOLS[idx % len(_TOOLS)] if role == "tool" else None
        rows.append(
            {
                "conv_id": cid,
                "turn_idx": tix,
                "role": role,
                "text": text,
                "tool": tool,
                "ts": base_ts + pd.Timedelta(seconds=idx * 7),
                "gold_json": json.dumps(gold, ensure_ascii=False),
            }
        )
    return pd.DataFrame(
        rows,
        columns=["conv_id", "turn_idx", "role", "text", "tool", "ts", "gold_json"],
    )


def synth_pandas(n_turns: int, seed: int = 42) -> pd.DataFrame:
    """Driver-side generation (oracle / tiny fixtures)."""
    return gen_rows(seed, np.arange(n_turns))


TRANSCRIPTS_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp, gold_json string"
)


def synth_transcripts(spark, n_turns: int, seed: int = 42, partitions: int | None = None):
    """Distributed generation: spark.range -> mapInPandas, no driver data."""
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 1)

    def gen(batches):
        for pdf in batches:
            yield gen_rows(seed, pdf["id"].to_numpy())

    return (
        spark.range(0, n_turns, numPartitions=partitions)
        .mapInPandas(gen, schema=TRANSCRIPTS_SCHEMA)
    )


def gold_triples(spark, transcripts_df):
    """Explode the gold_json column into a gold triple table
    (conv_id, turn_idx, predicate, subject, subject_type,
    object map<string,string>, object_type map<string,string>)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    spo_type = T.ArrayType(
        T.StructType(
            [
                T.StructField("predicate", T.StringType()),
                T.StructField("subject", T.StringType()),
                T.StructField("subject_type", T.StringType()),
                T.StructField("object", T.MapType(T.StringType(), T.StringType())),
                T.StructField(
                    "object_type", T.MapType(T.StringType(), T.StringType())
                ),
            ]
        )
    )
    return (
        transcripts_df.select(
            "conv_id",
            "turn_idx",
            F.explode(F.from_json("gold_json", spo_type)).alias("spo"),
        )
        .select("conv_id", "turn_idx", "spo.*")
    )


# R-MAT cutoffs on the 28-bit uniform (7 md5 hex chars): the Graph500
# (a, b, c, d) = (0.45, 0.15, 0.15, 0.25)-shaped quadrant split as
# EXACT integers so Spark and any relational twin derive identical bits.
_RMAT_A_CUT = 120_795_955  # floor(0.45 * 2^28)
_RMAT_AB_CUT = 161_061_273  # floor(0.60 * 2^28)
_RMAT_ABC_CUT = 201_326_592  # floor(0.75 * 2^28)


def rmat_edges(spark, n_edges: int, scale: int):
    """Deterministic R-MAT graph generator (Chakrabarti, Zhan &
    Faloutsos 2004), the Graph500 kernel shape: 2^scale vertices,
    power-law degree skew from recursive quadrant descent. Edge i's
    level-l quadrant comes from a 28-bit uniform
    ``conv(substring(md5(i || ':' || l), 1, 7), 16, 10)`` — pure JVM
    expressions over ``spark.range`` (no Python in the path, no state),
    so generation is embarrassingly parallel at any scale and BIT-EXACT
    reproducible across engines: a relational twin derives the same
    md5, the same integer cutoffs, the same bits. This is the
    benchmark-graph source for operator rehearsals at sizes where
    shipping a fixture is impossible (10^12 edges is a number, not a
    file).

    Quadrant bits per level: src bit = u >= AB_CUT (lower half c|d),
    dst bit = u in [A_CUT, AB_CUT) or u >= ABC_CUT (right half b|d).
    Returns (edge_id, src, dst)."""
    from pyspark.sql import functions as F

    df = spark.range(n_edges).withColumnRenamed("id", "edge_id")
    src_terms = []
    dst_terms = []
    for lvl in range(scale):
        u = (
            f"cast(conv(substring(md5(concat(cast(edge_id as string),"
            f" ':', '{lvl}')), 1, 7), 16, 10) as bigint)"
        )
        shift = 1 << (scale - 1 - lvl)
        src_terms.append(
            f"(CASE WHEN {u} >= {_RMAT_AB_CUT} THEN {shift} ELSE 0 END)"
        )
        dst_terms.append(
            f"(CASE WHEN ({u} >= {_RMAT_A_CUT} AND {u} < {_RMAT_AB_CUT})"
            f" OR {u} >= {_RMAT_ABC_CUT} THEN {shift} ELSE 0 END)"
        )
    return df.select(
        "edge_id",
        F.expr(" + ".join(src_terms)).cast("long").alias("src"),
        F.expr(" + ".join(dst_terms)).cast("long").alias("dst"),
    )


def rmat_edges_python(n_edges: int, scale: int) -> list:
    """Flat twin of rmat_edges: identical md5 bit derivation in pure
    python. Returns [(edge_id, src, dst)]."""
    import hashlib

    out = []
    for i in range(n_edges):
        src = dst = 0
        for lvl in range(scale):
            h = hashlib.md5(f"{i}:{lvl}".encode()).hexdigest()
            u = int(h[:7], 16)
            shift = 1 << (scale - 1 - lvl)
            if u >= _RMAT_AB_CUT:
                src += shift
            if (_RMAT_A_CUT <= u < _RMAT_AB_CUT) or u >= _RMAT_ABC_CUT:
                dst += shift
        out.append((i, src, dst))
    return out
