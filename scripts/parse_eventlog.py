"""Summarize a Spark event log: per-job wall time (with description) and
the gaps between jobs (driver-side planning / python time).

  python scripts/parse_eventlog.py <eventlog-file> [--min-gap 0.05]
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--min-gap", type=float, default=0.05)
    ap.add_argument("--per-stage", action="store_true")
    args = ap.parse_args()

    jobs = {}  # id -> dict
    stages = {}  # id -> dict
    with open(args.path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            et = ev.get("Event")
            if et == "SparkListenerJobStart":
                jid = ev["Job ID"]
                jobs[jid] = {
                    "start": ev["Submission Time"] / 1000.0,
                    "desc": (ev.get("Properties") or {}).get(
                        "spark.job.description", ""
                    ),
                    "nstages": len(ev.get("Stage Infos", [])),
                }
            elif et == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["end"] = ev["Completion Time"] / 1000.0
            elif et == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stages[si["Stage ID"]] = {
                    "name": si["Stage Name"].split("\n")[0][:90],
                    "tasks": si["Number of Tasks"],
                    "dur": (
                        si.get("Completion Time", 0)
                        - si.get("Submission Time", 0)
                    )
                    / 1000.0,
                }

    order = sorted(jobs.items(), key=lambda kv: kv[1]["start"])
    prev_end = None
    total_job = 0.0
    total_gap = 0.0
    by_desc: dict[str, list[float]] = {}
    for jid, j in order:
        if "end" not in j:
            continue
        dur = j["end"] - j["start"]
        total_job += dur
        gap = 0.0
        if prev_end is not None:
            gap = max(0.0, j["start"] - prev_end)
            total_gap += gap
        prev_end = max(prev_end or 0, j["end"])
        desc = j["desc"] or "(none)"
        by_desc.setdefault(desc, [0.0, 0.0, 0])
        agg = by_desc[desc]
        agg[0] += dur
        agg[1] += gap
        agg[2] += 1
        marker = " <<< GAP %.2fs" % gap if gap >= args.min_gap else ""
        print(
            f"job {jid:4d} {dur:7.3f}s  stages={j['nstages']}"
            f"  {desc[:70]}{marker}"
        )
    print(f"\nTOTAL job time {total_job:.2f}s, inter-job gap {total_gap:.2f}s")
    print("\nPer-description totals (job_s, gap_s, n_jobs):")
    for desc, (d, g, n) in sorted(by_desc.items(), key=lambda kv: -kv[1][0]):
        print(f"  {d:7.2f}  {g:7.2f}  {n:4d}  {desc[:70]}")
    if args.per_stage:
        print("\nSlowest stages:")
        for sid, s in sorted(
            stages.items(), key=lambda kv: -kv[1]["dur"]
        )[:40]:
            print(
                f"stage {sid:4d} {s['dur']:7.3f}s tasks={s['tasks']:4d}"
                f"  {s['name']}"
            )


if __name__ == "__main__":
    main()
