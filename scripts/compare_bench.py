"""Compare two BENCH headline json records query by query.

  python scripts/compare_bench.py <old.json> <new.json> [--min-delta 0.5]
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--min-delta", type=float, default=0.5)
    args = ap.parse_args()
    with open(args.old) as f:
        old = json.load(f)
    with open(args.new) as f:
        new = json.load(f)
    qo, qn = old["queries"], new["queries"]
    common = sorted(set(qo) & set(qn), key=lambda k: qo[k] - qn[k])
    so = sum(qo[k] for k in common)
    sn = sum(qn[k] for k in common)
    print(
        f"total value: {old.get('value')} -> {new.get('value')}  "
        f"(common {len(common)} queries: {so:.1f}s -> {sn:.1f}s, "
        f"ratio {sn / so:.3f})"
    )
    print("\nbiggest improvements:")
    for k in common[:25]:
        d = qo[k] - qn[k]
        if d < args.min_delta:
            break
        print(f"  {qo[k]:8.3f} -> {qn[k]:8.3f}  (-{d:6.3f})  {k}")
    print("\nbiggest regressions:")
    for k in reversed(common[-25:]):
        d = qn[k] - qo[k]
        if d < args.min_delta:
            break
        print(f"  {qo[k]:8.3f} -> {qn[k]:8.3f}  (+{d:6.3f})  {k}")
    for extra in (
        "turns_per_sec_mpn", "turns_per_sec_bio", "turns_per_sec_mhs",
        "turns_per_sec_biaffine", "scale_10x_throughput_ratio",
        "linking_10x_ratio", "ann_ivfpq_10x_recall_at_5",
        "streaming_batch_p95_sec", "sink_growth_p95_ratio",
    ):
        if extra in old or extra in new:
            print(f"extra {extra}: {old.get(extra)} -> {new.get(extra)}")


if __name__ == "__main__":
    main()
