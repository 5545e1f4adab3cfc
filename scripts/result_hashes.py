"""Round-6 equivalence harness: canonical result hashes for every declared
query, used to prove optimized plans return EXACTLY the rows the round-start
tree returned (sorted stringified rows → md5), independent of the DuckDB
oracle dialect.

Usage:
  python scripts/result_hashes.py --tree /path/to/tree --sf /root/testdata/sf0.01 [q ...]

Prints one JSON object {query: {"rows": n, "hash": h}, ...}.
"""
from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tree", required=True)
    ap.add_argument("--sf", required=True)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    sys.path.insert(0, args.tree)
    from bench import build_spark
    import __spark_entry__ as E

    spark = build_spark(args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    names = args.queries or list(qs)
    out = {}
    for n in names:
        rows = qs[n](spark, args.sf).collect()
        canon = sorted(tuple(str(x) for x in r) for r in rows)
        h = hashlib.md5(repr(canon).encode()).hexdigest()
        out[n] = {"rows": len(rows), "hash": h}
        print(json.dumps({n: out[n]}), file=sys.stderr, flush=True)
        spark.catalog.clearCache()
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
