"""Extra benchmarks / profiling harness (guide §1: measure first).

NOT part of the driver contract — bench.py stays frozen. This file exists
so optimization work can isolate one query at a time:

  python bench_extra.py run <query> [--repeat N] [--noop] [--explain OUT]
  python bench_extra.py list

* ``run`` times one registered query (same session config as bench.py),
  with Spark event logging enabled so scripts/parse_eventlog.py can
  attribute wall time to jobs vs driver-side gaps.
* ``--noop`` writes to the noop sink instead of collect() (guide §1.4)
  so the sink cost is excluded.
* ``--explain OUT`` dumps .explain("formatted") to the given path.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nlp_series_relation_extraction_spark.plans import queries as Q
from nlp_series_relation_extraction_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
EVENTLOG_DIR = os.environ.get("NRE_EVENTLOG_DIR", "/tmp/nre_eventlog")


def _session(eventlog: bool):
    extra = {}
    if eventlog:
        os.makedirs(EVENTLOG_DIR, exist_ok=True)
        extra = {
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVENTLOG_DIR,
        }
    spark = get_spark(
        app_name="nre-bench-extra",
        master=f"local[{CPUS}]",
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    runp = sub.add_parser("run")
    runp.add_argument("query", nargs="+")
    runp.add_argument("--repeat", type=int, default=2)
    runp.add_argument("--noop", action="store_true")
    runp.add_argument("--explain", default=None)
    runp.add_argument("--no-eventlog", action="store_true")
    sub.add_parser("list")
    args = ap.parse_args()

    if args.cmd == "list":
        for name in sorted(Q.queries()):
            print(name)
        return

    spark = _session(eventlog=not args.no_eventlog)
    qs = Q.queries()
    out: dict[str, list[float]] = {}
    for name in args.query:
        fn = qs[name]
        if args.explain:
            df = fn(spark, SF_DIR)
            with open(
                args.explain if len(args.query) == 1
                else f"{args.explain}.{name}", "w"
            ) as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        times = []
        for i in range(args.repeat):
            spark.sparkContext.setJobDescription(f"{name}#{i}")
            t0 = time.time()
            df = fn(spark, SF_DIR)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            times.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = times
        print(json.dumps({"query": name, "times": times, "min": min(times)}))
    app_id = spark.sparkContext.applicationId
    spark.stop()
    print(json.dumps({"eventlog": os.path.join(EVENTLOG_DIR, app_id)}))


if __name__ == "__main__":
    main()
