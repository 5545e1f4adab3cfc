"""RocksDB state store (the north-star's store) drives the engine's stateful
streaming: windowed aggregates produce batch-identical results, state is
checkpoint-resumable ACROSS runs, and the provider verifiably ran (RocksDB
artifacts in the checkpoint + rocksdb custom metrics)."""
import glob
import os

import pytest
from pyspark.sql import functions as F

from dlp_dataflow_deidentification_spark.streaming import jobs, windows
from dlp_dataflow_deidentification_spark.streaming.sink import IdempotentBatchSink

DETS = ["EMAIL_ADDRESS", "PHONE_NUMBER"]
SCHEMA = "conv_id string, turn_idx int, role string, text string, tool string, ts string"


@pytest.fixture()
def rocksdb(spark):
    key = "spark.sql.streaming.stateStore.providerClass"
    try:
        old = spark.conf.get(key)
    except Exception:
        old = None
    jobs.use_rocksdb_state_store(spark)
    yield
    if old is None:
        spark.conf.unset(key)
    else:
        spark.conf.set(key, old)


def _rows(spark, hours, tag):
    data = [
        (
            f"conv-{tag}-{h}",
            i,
            "agent",
            f"email u{h}{i}@example.com" + (" call 415-555-0101" if i % 2 == 0 else ""),
            "N/A",
            f"2026-01-01 {h:02d}:{i:02d}:00",
        )
        for h in hours
        for i in range(10)
    ]
    return spark.createDataFrame(data, SCHEMA).withColumn("ts", F.col("ts").cast("timestamp"))


def _flush(spark):
    return spark.createDataFrame(
        [("__flush__", 0, "agent", "x", "N/A", "2027-01-01 00:00:00")], SCHEMA
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_windowed_agg_rocksdb_resumes_across_runs(spark, tmp_path, rocksdb):
    """Two sequential availableNow runs over one checkpoint: run 2 restores
    run 1's open-window state from RocksDB and the union of emitted windows
    equals the batch aggregate — checkpoint-resumable state, exactly once."""
    in_dir, ck, out = str(tmp_path / "in"), str(tmp_path / "ck"), str(tmp_path / "out")
    sink = IdempotentBatchSink(out, event_time_col="window_start")

    def run_once():
        stream = jobs.read_transcript_stream(spark, in_dir)
        agg = windows.windowed_infotype_hits(stream, DETS, window="1 hour", watermark="1 minute")
        q = (
            agg.writeStream.foreachBatch(lambda df, bid: sink(df, bid))
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return q

    _rows(spark, (0, 1), "a").write.mode("append").parquet(in_dir)
    q1 = run_once()
    # phase 2: later event times + far-future flush closes every window
    _rows(spark, (2, 3), "b").write.mode("append").parquet(in_dir)
    _flush(spark).write.mode("append").parquet(in_dir)
    run_once()

    got = {
        (str(r.window_start), r.info_type_name): r.n_hits
        for r in sink.read_committed(spark).collect()
    }
    both = _rows(spark, (0, 1), "a").unionByName(_rows(spark, (2, 3), "b")).unionByName(
        _flush(spark)
    )
    want = {
        (str(r.window_start), r.info_type_name): r.n_hits
        for r in windows.windowed_infotype_hits(
            both, DETS, window="1 hour", watermark="1 minute"
        ).collect()
    }
    assert got == want and len(want) >= 8  # 4 hours x 2 detectors

    # the RocksDB provider verifiably ran: changelog/snapshot artifacts live
    # under the checkpoint's state dir and the query reported rocksdb metrics
    arts = glob.glob(os.path.join(ck, "state", "**", "*.changelog"), recursive=True) + glob.glob(
        os.path.join(ck, "state", "**", "*.zip"), recursive=True
    )
    assert arts, "no RocksDB state artifacts under the checkpoint"
    prog = q1.lastProgress
    assert prog and any(
        "rocksdb" in k for op in prog["stateOperators"] for k in op.get("customMetrics", {})
    )


def test_stateful_batcher_rocksdb_equals_default_provider(spark, tmp_path, rocksdb):
    """applyInPandasWithState (BagState+timer analogue) over RocksDB emits
    the same batch multiset as the default provider run in test_stateful."""
    from dlp_dataflow_deidentification_spark.streaming import stateful

    in_dir = str(tmp_path / "bin")
    rows = [
        ("a", i, "agent", "x" * 100, "N/A", f"2026-01-01 00:00:{i:02d}") for i in range(6)
    ] + [("__flush__", 0, "agent", "f", "N/A", "2027-01-01 00:00:00")]
    spark.createDataFrame(rows, SCHEMA).withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).write.parquet(in_dir)
    stream = jobs.read_transcript_stream(spark, in_dir)
    out = stateful.batched_requests(stream, max_batch_bytes=250, watermark="1 second")
    q = (
        out.writeStream.format("memory")
        .queryName("rocks_batches")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "bck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = sorted(
        r.n_rows for r in spark.table("rocks_batches").filter("key = 'a'").collect()
    )
    assert got == [2, 2, 2]
