"""The driver-facing bench line must fit the grading driver's tail
capture. Round 4's BENCH artifact recorded ``parsed: null`` because the
single JSON line (~7.5k chars at 228 queries) overflowed the ~2000-byte
tail the driver keeps — the fix prints the full record first and a
compact contract line LAST."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _fake_out(n_queries: int) -> dict:
    return {
        "metric": "kg_pipeline_headline_total",
        "value": 1234.567,
        "unit": "sec",
        "queries": {
            f"some_rather_long_query_name_{i:03d}": round(i / 7.0, 3)
            for i in range(n_queries)
        },
        "sf": 0.1,
        "turns_per_sec_mpn": 28218.7,
        "turns_per_sec_bio": 25789.9,
        "turns_per_sec_mhs": 15302.2,
        "turns_per_sec_biaffine": 10321.4,
        "turns_per_sec_mpn_10x": 67922.9,
        "scale_10x_throughput_ratio": 2.407,
        "linking_10x_ratio": 3.11,
        "ann_ivfpq_10x_ratio": 1.5,
        "ann_ivfpq_10x_recall_at_5": 0.93,
        "streaming_batch_p95_sec": 0.822,
        "sink_growth_p95_ratio": 1.1,
        "some_other_extra_not_whitelisted": 42,
    }


def test_compact_line_fits_tail_capture_at_large_registry():
    line = bench._compact_line(_fake_out(400))
    assert len(line) <= 1800
    d = json.loads(line)
    # driver contract keys all present
    assert {"metric", "value", "unit", "queries", "sf"} <= set(d)
    assert d["n_queries"] == 400
    assert d["queries_shown"] == len(d["queries"]) > 0


def test_compact_line_keeps_slowest_queries():
    out = _fake_out(300)
    d = json.loads(bench._compact_line(out))
    shown = d["queries_shown"]
    slowest = sorted(out["queries"], key=out["queries"].get, reverse=True)[
        :shown
    ]
    assert set(d["queries"]) == set(slowest)
    # and the truncation is explicit + the full record is pointed at
    assert d["full"] == "BENCH/headline_last.json"
    assert d["queries_sec_sum"] == round(sum(out["queries"].values()), 3)


def test_compact_line_small_registry_shows_everything():
    out = _fake_out(20)
    d = json.loads(bench._compact_line(out))
    assert d["queries_shown"] == d["n_queries"] == 20
    assert d["queries"] == out["queries"]


def test_committed_headline_record_compacts_under_budget():
    """The actual committed record (the real 228-query result) must
    produce a parseable under-budget line, not just synthetic shapes."""
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH",
        "headline_last.json",
    )
    if not os.path.exists(path):
        return
    with open(path, encoding="utf-8") as f:
        out = json.load(f)
    line = bench._compact_line(out)
    assert len(line) <= 1800
    json.loads(line)
