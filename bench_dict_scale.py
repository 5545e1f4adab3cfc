"""Dictionary-detector scaling curve (round-5 verdict ask #2 'done'
criterion): rendered-regex alternation vs the trie scanner
(functions/dictscan.py) at growing dictionary sizes, measured in Spark
over a fixed synthetic corpus. Writes BENCH_DICT_SCALE.json.

Usage: python bench_dict_scale.py [n_docs]
"""
from __future__ import annotations

import json
import random
import string
import sys
import time

sys.path.insert(0, ".")

from bench import build_spark  # same session config as the frozen bench
from pyspark.sql import functions as F

from dlp_dataflow_deidentification_spark.functions import dictscan
from dlp_dataflow_deidentification_spark.functions.infotypes import dictionary


def mk_words(n: int, seed: int = 5) -> list:
    rnd = random.Random(seed)
    out: set = set()
    while len(out) < n:
        w = "".join(rnd.choice(string.ascii_lowercase) for _ in range(rnd.randint(3, 10)))
        if rnd.random() < 0.2:
            w += " " + "".join(rnd.choice(string.ascii_lowercase) for _ in range(3))
        out.add(w)
    return sorted(out)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    spark = build_spark(32)
    spark.sparkContext.setLogLevel("ERROR")
    big = mk_words(10_000)
    rnd = random.Random(9)
    rows = []
    for i in range(n_docs):
        toks = [
            rnd.choice(big) if rnd.random() < 0.3 else
            "".join(rnd.choice(string.ascii_lowercase) for _ in range(6))
            for _ in range(40)
        ]
        rows.append((i, " ".join(toks)))
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(32).persist()
    df.count()

    out = {"n_docs": n_docs, "sizes": []}
    for n in (100, 1_000, 10_000):
        words = big[:n]
        pat = dictionary("BIG", words).pattern
        t = {}
        for label, col in (
            ("regex_sec", F.regexp_extract_all(F.col("text"), F.lit(pat), F.lit(0))),
            ("scanner_sec", dictscan.scan_matches(F.col("text"), words)),
        ):
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                df.select("doc_id", col.alias("m")).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.time() - t0)
            t[label] = round(best, 3)
        # exact-equality spot check at every size (full equality is pinned
        # by tests/test_dictscan.py)
        neq = (
            df.select(
                F.regexp_extract_all(F.col("text"), F.lit(pat), F.lit(0)).alias("a"),
                dictscan.scan_matches(F.col("text"), words).alias("b"),
            )
            .filter(F.col("a") != F.col("b"))
            .count()
        )
        out["sizes"].append({"n_words": n, **t, "rows_differing": neq})
        print(json.dumps(out["sizes"][-1]), flush=True)
    spark.stop()
    with open("BENCH_DICT_SCALE.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
