"""Two-cluster-size scaling evidence (north_rule: N vs 4N executors ≥0.8).

No real cluster exists in this sandbox, so the same spark-submit job runs at
two parallelism levels — local[8] (N) and local[32] (4N) — over the identical
pre-materialized input, and we report throughput at both plus scaling
efficiency = (thr_4N / thr_N) / 4. Results land in BENCH_SCALING.json and are
summarized in BASELINE.md.
"""
from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
TURNS = int(os.environ.get("SPARK_GRAFT_SCALING_TURNS", "4000000"))
LEVELS = (8, 32)


def materialize_input(in_dir: str) -> None:
    sys.path.insert(0, HERE)
    from bench import build_spark
    from dlp_dataflow_deidentification_spark.sources.transcripts import synthesize_transcripts

    spark = build_spark(32)
    spark.sparkContext.setLogLevel("ERROR")
    synthesize_transcripts(spark, TURNS, n_conversations=100000).repartition(128).write.mode(
        "overwrite"
    ).parquet(in_dir)
    spark.stop()


def run_level(cpus: int, in_dir: str, zip_path: str, workroot: str) -> dict:
    work = os.path.join(workroot, f"local{cpus}")
    env = dict(os.environ, MAX_FILES_PER_TRIGGER="64")
    cmd = [
        "spark-submit",
        "--master",
        f"local[{cpus}]",
        "--conf",
        f"spark.sql.shuffle.partitions={cpus}",
        # small parquet inputs: without this the scan packs all files into
        # ~4 partitions (128MB default) and extra cores idle — at real scale
        # row-group/file sizes make this a non-issue, here it models them
        "--conf",
        "spark.sql.files.maxPartitionBytes=8m",
        "--conf",
        "spark.sql.files.openCostInBytes=1m",
        "--conf",
        "spark.driver.memory=32g",
        "--conf",
        "spark.ui.enabled=false",
        "--py-files",
        zip_path,
        os.path.join(HERE, "scripts/streaming_job.py"),
        in_dir,
        work,
        HERE,
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("SCALING_RESULT "):
            return json.loads(line[len("SCALING_RESULT "):])
    raise RuntimeError(f"no result from local[{cpus}]:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    workroot = tempfile.mkdtemp(prefix="dlp_scaling_")
    try:
        in_dir = os.path.join(workroot, "in")
        materialize_input(in_dir)
        zip_path = os.path.join(workroot, "dds.zip")
        subprocess.run(
            ["zip", "-qr", zip_path, "dlp_dataflow_deidentification_spark"],
            cwd=HERE,
            check=True,
        )
        results = {c: run_level(c, in_dir, zip_path, workroot) for c in LEVELS}
        lo, hi = results[LEVELS[0]], results[LEVELS[1]]
        eff = (hi["turns_per_sec"] / lo["turns_per_sec"]) / (LEVELS[1] / LEVELS[0])
        report = {
            "turns": TURNS,
            "levels": {f"local[{c}]": r for c, r in results.items()},
            "speedup": round(hi["turns_per_sec"] / lo["turns_per_sec"], 3),
            "scaling_efficiency": round(eff, 3),
        }
        with open(os.path.join(HERE, "BENCH_SCALING.json"), "w") as f:
            json.dump(report, f, indent=2)
        print(json.dumps(report))
    finally:
        shutil.rmtree(workroot, ignore_errors=True)


if __name__ == "__main__":
    main()
