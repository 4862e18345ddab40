#!/usr/bin/env python
"""Round-6 measurement helpers (bench.py is frozen — guide §1).

Subcommands:
  plans <outdir> [suffix]   capture .explain(formatted) for every headline query
  time <names...|all>       best-of-3 per-query wall clock (count sink, same
                            methodology as bench.run_headline) at $SPARK_GRAFT_SF_DIR
  noop <names...>           same but with a noop write sink (guide §1.4)

Environment: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import EXTRA_HEADLINE, HEADLINE, make_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _fn(name):
    from libswish3_spark.operators.queries import QUERIES

    return QUERIES[name][0] if name in QUERIES else EXTRA_HEADLINE[name]


def capture_plans(outdir: str, suffix: str) -> None:
    os.makedirs(outdir, exist_ok=True)
    spark = make_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        for name in HEADLINE:
            if name in EXTRA_HEADLINE:
                continue  # ingest build: writes inside the call, no single plan
            try:
                plan = _fn(name)(spark, SF_DIR)._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                )
            except Exception as e:  # pragma: no cover
                plan = f"explain failed: {e}"
            with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(plan)
            print(name, "ok")
    finally:
        spark.stop()


def time_queries(names, sink: str) -> None:
    spark = make_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    timings = {}
    try:
        for name in names:
            fn = _fn(name)
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            best = None
            for i in range(3):
                t0 = time.perf_counter()
                df = fn(spark, SF_DIR)
                if sink == "noop":
                    df.write.format("noop").mode("overwrite").save()
                else:
                    df.count()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
                if i >= 1 and best <= 3.0:
                    break
            timings[name] = round(best, 3)
            print(f"{name}: {timings[name]}", file=sys.stderr)
    finally:
        spark.stop()
    print(json.dumps({"sf_dir": SF_DIR, "sink": sink, "queries": timings,
                      "total": round(sum(timings.values()), 3)}))


def main():
    cmd = sys.argv[1]
    if cmd == "plans":
        capture_plans(sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else "before")
    elif cmd in ("time", "noop"):
        names = sys.argv[2:]
        if names == ["all"] or not names:
            names = list(HEADLINE)
        time_queries(names, "noop" if cmd == "noop" else "count")
    else:
        raise SystemExit(f"unknown subcommand {cmd}")


if __name__ == "__main__":
    main()
