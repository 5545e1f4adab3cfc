"""Capture .explain('formatted') for every declared query of a given tree
into /root/repo/plans/r06/<query>_<suffix>.txt (plan-only, no execution)."""
import argparse
import os
import sys

ap = argparse.ArgumentParser()
ap.add_argument("--tree", required=True)
ap.add_argument("--suffix", required=True)
ap.add_argument("--sf", default="/root/testdata/sf1.0")
ap.add_argument("--skip-existing", action="store_true")
args = ap.parse_args()

sys.path.insert(0, args.tree)
from bench import build_spark
import __spark_entry__ as E

spark = build_spark(32)
spark.sparkContext.setLogLevel("ERROR")
out_dir = "/root/repo/plans/r06"
os.makedirs(out_dir, exist_ok=True)
for name, fn in E.queries().items():
    path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
    if args.skip_existing and os.path.exists(path):
        continue
    try:
        df = fn(spark, args.sf)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        with open(path, "w") as f:
            f.write(plan)
        print(name, "ok", flush=True)
    except Exception as ex:
        print(name, "ERR", str(ex)[:200], flush=True)
    spark.catalog.clearCache()
spark.stop()
