"""Round-6 measurement harness (guide §1): per-query noop-sink timings at an
arbitrary SF with /proc/stat busy+steal CPU sampling around each query, plus
``.explain("formatted")`` capture into plans/r06/.

bench.py is FROZEN for driver measurement; this file exists so optimization
evidence (isolated timings, interference accounting, plan snapshots) can be
recorded without touching it.

Usage:
  python bench_extra.py [--sf DIR] [--trials N] [--plans SUFFIX] [q1 q2 ...]

  --plans before|after   write plans/r06/<query>_<suffix>.txt for each query
  no query names         run all queries
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

from bench import build_spark  # same session config as the frozen bench


def _cpu_jiffies() -> tuple[int, int]:
    """(busy, steal) jiffies from /proc/stat line 1."""
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    # user nice system idle iowait irq softirq steal guest guest_nice
    idle = vals[3] + vals[4]
    steal = vals[7] if len(vals) > 7 else 0
    busy = sum(vals) - idle - steal
    return busy, steal


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--plans", default=None, help="suffix for plans/r06/<q>_<suffix>.txt")
    ap.add_argument("--no-warmup", action="store_true")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E

    qs = E.queries()
    names = args.queries or list(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    plan_dir = os.path.join(HERE, "plans", "r06")
    os.makedirs(plan_dir, exist_ok=True)

    if not args.no_warmup:
        for n in names:
            qs[n](spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()

    out: dict[str, dict] = {}
    for n in names:
        if args.plans:
            df = qs[n](spark, args.sf)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            with open(os.path.join(plan_dir, f"{n}_{args.plans}.txt"), "w") as f:
                f.write(plan)
            spark.catalog.clearCache()
        best = float("inf")
        samples = []
        busy0 = steal0 = 0
        for _ in range(args.trials):
            b0, s0 = _cpu_jiffies()
            t0 = time.time()
            spark.sparkContext.setJobDescription(f"r06 bench: {n}")
            qs[n](spark, args.sf).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            b1, s1 = _cpu_jiffies()
            samples.append(round(dt, 3))
            if dt < best:
                best, busy0, steal0 = dt, b1 - b0, s1 - s0
            spark.catalog.clearCache()
        out[n] = {
            "sec": round(best, 3),
            "samples": samples,
            "busy_cpu_sec": round(busy0 / 100.0, 1),
            "steal_cpu_sec": round(steal0 / 100.0, 1),
        }
        print(json.dumps({n: out[n]}), flush=True)
    spark.stop()
    print(json.dumps({"sf": args.sf, "total_best_sec": round(sum(v["sec"] for v in out.values()), 3), "queries": out}))


if __name__ == "__main__":
    main()
