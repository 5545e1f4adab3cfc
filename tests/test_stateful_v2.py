"""transformWithStateInPandas (RocksDB state store) — whole-conversation
assembly must match a batch oracle; gated on provider availability."""
import pytest
from pyspark.sql import functions as F


def test_transform_with_state_conversation_stats(spark, tmp_path):
    from dlp_dataflow_deidentification_spark.sources.transcripts import (
        synthesize_transcripts,
    )
    from dlp_dataflow_deidentification_spark.streaming import jobs, stateful_v2

    tdf = synthesize_transcripts(spark, 1500, n_conversations=30)
    d = str(tmp_path / "in")
    tdf.coalesce(2).write.mode("append").parquet(d)
    flush = spark.createDataFrame(
        [("__flush__", 0, "agent", "x", "N/A", "2027-01-01 00:00:00")],
        "conv_id string, turn_idx int, role string, text string, tool string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    flush.write.mode("append").parquet(d)

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", stateful_v2.ROCKSDB_PROVIDER
    )
    try:
        stream = jobs.read_transcript_stream(spark, d)
        # gap larger than any in-conversation spacing → one record per conv
        out = stateful_v2.conversation_stats_tws(stream, gap_ms=3_600_000, watermark="1 minute")
        q = (
            out.writeStream.format("memory")
            .queryName("tws_stats")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        got = {
            r.conv_id: (r.n_turns, r.first_ms, r.last_ms)
            for r in spark.table("tws_stats").filter("conv_id <> '__flush__'").collect()
        }
    except Exception as e:  # pragma: no cover - environment-dependent
        if "transformWithState" in str(e) or "RocksDB" in str(e):
            pytest.skip(f"transformWithStateInPandas unavailable: {e}")
        raise
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    us = (F.unix_micros(F.col("ts")) / 1000).cast("long")
    want = {
        r.conv_id: (r.n, r.lo, r.hi)
        for r in tdf.groupBy("conv_id")
        .agg(F.count("*").alias("n"), F.min(us).alias("lo"), F.max(us).alias("hi"))
        .collect()
    }
    assert got == want and len(want) >= 20
