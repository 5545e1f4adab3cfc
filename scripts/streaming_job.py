"""Standalone streaming DEID job for spark-submit (scaling evidence runner).

Usage (see scaling_bench.py):
  spark-submit --master local[N] --py-files dds.zip scripts/streaming_job.py \
      <input_dir> <work_dir> [repo_dir]

Reads a transcript parquet stream, de-identifies it through the exactly-once
sink, prints one JSON line with throughput + p50 micro-batch latency.
"""
import json
import os
import sys
import time


def _jvm_cpu_seconds() -> float:
    """Total CPU seconds consumed by child JVMs (read from /proc): in local
    mode the driver JVM IS the executor, so this is the engine's CPU time.
    Evidence for the scaling report: utilization = Δcpu / (wall · cores)."""
    hz = os.sysconf("SC_CLK_TCK")
    me = os.getpid()

    def stat(pid):
        with open(f"/proc/{pid}/stat") as f:
            parts = f.read().rsplit(") ", 1)[1].split()
        # fields after comm: state ppid ... utime=idx11 stime=idx12 (0-based)
        return int(parts[1]), (int(parts[11]) + int(parts[12])) / hz

    # under spark-submit the JVM is our parent; under plain python it is a child
    try:
        with open(f"/proc/{me}/stat") as f:
            ppid = int(f.read().rsplit(") ", 1)[1].split()[1])
        with open(f"/proc/{ppid}/comm") as f:
            if "java" in f.read():
                return stat(ppid)[1]
    except OSError:
        pass
    total = 0.0
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            p, cpu = stat(pid)
            if p == me:
                total += cpu
        except (OSError, IndexError, ValueError):
            continue
    return total


def main() -> None:
    input_dir, work_dir = sys.argv[1], sys.argv[2]
    repo = sys.argv[3] if len(sys.argv) > 3 else os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    from pyspark.sql import SparkSession

    import dlp_dataflow_deidentification_spark as dds
    from dlp_dataflow_deidentification_spark.streaming import jobs, metrics

    spark = SparkSession.builder.config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    template = dds.DeidTemplate.from_file(os.path.join(repo, "configs/deid_transcripts.json"))

    if os.environ.get("SCALING_MODE") == "batch":
        # same pipeline without the streaming machinery: read → deid → write
        import shutil

        from dlp_dataflow_deidentification_spark.operators.deidentify import deidentify

        df = deidentify(spark.read.parquet(input_dir), template)
        df.limit(50000).write.format("noop").mode("overwrite").save()  # JIT warmup
        out = os.path.join(work_dir, "batch_out")
        t0 = time.time()
        df.write.mode("overwrite").parquet(out)
        wall = time.time() - t0
        n = spark.read.parquet(out).count()
        shutil.rmtree(out, ignore_errors=True)
        print(
            "SCALING_RESULT "
            + json.dumps(
                {
                    "master": spark.sparkContext.master,
                    "rows": n,
                    "wall_sec": round(wall, 2),
                    "turns_per_sec": round(n / wall, 1),
                    "p50_batch_ms": round(wall * 1000, 1),
                }
            )
        )
        spark.stop()
        return

    mft = int(os.environ.get("MAX_FILES_PER_TRIGGER", "2"))
    if os.environ.get("SCALING_WARMUP", "1") == "1":
        # full warmup pass in the same JVM (throwaway sink/checkpoint): JIT
        # compilation and codegen are one-time costs, not engine throughput
        warm = jobs.StreamingDeidJob(
            spark,
            template,
            input_dir,
            os.path.join(work_dir, "warm_out"),
            os.path.join(work_dir, "warm_ckpt"),
            max_files_per_trigger=mft,
        )
        warm.run_to_completion(timeout_sec=3600)

    cap = metrics.ProgressCapture()
    spark.streams.addListener(cap)
    cpu0 = _jvm_cpu_seconds()
    t0 = time.time()
    job = jobs.StreamingDeidJob(
        spark,
        template,
        input_dir,
        os.path.join(work_dir, "out"),
        os.path.join(work_dir, "ckpt"),
        max_files_per_trigger=mft,
    )
    job.run_to_completion(timeout_sec=3600)
    wall = time.time() - t0
    cpu_sec = round(_jvm_cpu_seconds() - cpu0, 2)
    n_out = sum(e["metrics"]["n_rows"] for e in job.sink().lineage())
    for _ in range(60):
        if cap.total_rows() >= n_out:
            break
        time.sleep(0.25)
    print(
        "SCALING_RESULT "
        + json.dumps(
            {
                "master": spark.sparkContext.master,
                "rows": n_out,
                "wall_sec": round(wall, 2),
                "turns_per_sec": round(n_out / wall, 1),
                "p50_batch_ms": round(cap.p50_batch_ms(), 1),
                "jvm_cpu_sec": cpu_sec,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
