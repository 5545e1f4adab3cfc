"""Custom stateful operator tests — mirrors the reference's
BatchRequestForDLPTest (beam/BatchRequestForDLPTest.java:59-121): explicit
event timestamps, watermark advanced to infinity via a flush sentinel, exact
multiset of emitted batch sizes per key."""
import os

import pytest
from pyspark.sql import functions as F

from dlp_dataflow_deidentification_spark.streaming import jobs, stateful


def _write_stream_input(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    d = str(tmp_path / "in")
    df.coalesce(1).write.mode("append").parquet(d)
    return d


def _run_stream(spark, df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name)


def test_batched_requests_multiset_of_batch_sizes(spark, tmp_path):
    # key a: 6 rows of 100B with 150B budget → batches [1,1,1,1,1,1]? no —
    # greedy packing: rows of 100B, budget 250B → [2,2,2]; key b: 3 rows of
    # 100B + one 240B row → [2,1,1]; remainder flushed by event-time timeout
    # (flush sentinel row advances the watermark past every timer).
    mk = lambda k, i, size, t: (k, i, "agent", "x" * size, "N/A", t)
    rows = (
        [mk("a", i, 100, f"2026-01-01 00:00:{i:02d}") for i in range(6)]
        + [mk("b", i, 100, f"2026-01-01 00:00:{i:02d}") for i in range(3)]
        + [mk("b", 3, 240, "2026-01-01 00:00:03")]
        + [mk("__flush__", 0, 1, "2026-01-02 00:00:00")]
    )
    d = _write_stream_input(spark, tmp_path, rows)
    stream = jobs.read_transcript_stream(spark, d)
    out = stateful.batched_requests(
        stream, max_batch_bytes=250, flush_gap_ms=10_000, watermark="1 second"
    )
    got = _run_stream(spark, out, "batches_t1")
    sizes = {}
    for r in got.filter("key <> '__flush__'").collect():
        sizes.setdefault(r.key, []).append(r.n_rows)
    assert sorted(sizes["a"]) == [2, 2, 2]
    assert sorted(sizes["b"]) == [1, 1, 2]
    # byte budget respected
    assert got.filter("n_bytes > 250").count() == 0


def test_batched_requests_oversize_row_gets_own_batch(spark, tmp_path):
    rows = [
        ("k", 0, "agent", "y" * 900, "N/A", "2026-01-01 00:00:00"),
        ("k", 1, "agent", "z" * 10, "N/A", "2026-01-01 00:00:01"),
        ("__flush__", 0, "agent", "f", "N/A", "2026-01-02 00:00:00"),
    ]
    d = _write_stream_input(spark, tmp_path, rows)
    out = stateful.batched_requests(
        jobs.read_transcript_stream(spark, d),
        max_batch_bytes=500,
        watermark="1 second",
    )
    got = {r.batch_seq: (r.n_rows, r.n_bytes) for r in _run_stream(spark, out, "batches_t2").filter("key = 'k'").collect()}
    # oversize row emitted alone (cap enforced between rows, like the
    # reference's hard 524000B cap per request), remainder in next batch
    assert got == {0: (1, 900), 1: (1, 10)}


def test_conversation_assembler_stream_equals_batch_sessions(spark, tmp_path):
    from dlp_dataflow_deidentification_spark.sources.transcripts import synthesize_transcripts

    tdf = synthesize_transcripts(spark, 2000, n_conversations=40)
    d = str(tmp_path / "conv_in")
    tdf.coalesce(2).write.mode("append").parquet(d)
    flush = spark.createDataFrame(
        [("__flush__", 0, "agent", "x", "N/A", "2027-01-01 00:00:00")],
        "conv_id string, turn_idx int, role string, text string, tool string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    flush.write.mode("append").parquet(d)

    stream = jobs.read_transcript_stream(spark, d)
    out = stateful.conversation_assembler(stream, gap_ms=300_000, watermark="1 minute")
    got = {
        (r.conv_id, r.first_ms): r.n_turns
        for r in _run_stream(spark, out, "conv_asm").filter("conv_id <> '__flush__'").collect()
    }
    # batch oracle: gap sessions (same rule: new session when diff >= gap)
    from pyspark.sql import Window as W

    w = W.partitionBy("conv_id").orderBy("ts", "turn_idx")
    us = (F.unix_micros(F.col("ts")) / 1000).cast("long")
    gap = us - F.lag(us).over(w)
    sess = (
        tdf.withColumn(
            "new_s", F.when(gap.isNull() | (gap < 300_000), F.lit(0)).otherwise(F.lit(1))
        )
        .withColumn("sid", F.sum("new_s").over(w.rowsBetween(W.unboundedPreceding, 0)))
        .groupBy("conv_id", "sid")
        .agg(F.count("*").alias("n"), F.min(us).alias("first_ms"))
    )
    want = {(r.conv_id, r.first_ms): r.n for r in sess.collect()}
    assert got == want and len(want) >= 30

    # batch degradation (applyInPandas, full flush incl. trailing session)
    # produces the SAME session set as the streaming state machine
    batch_got = {
        (r.conv_id, r.first_ms): r.n_turns
        for r in stateful.conversation_assembler(tdf, gap_ms=300_000).collect()
    }
    assert batch_got == want


def test_batched_requests_budget_counts_utf8_bytes(spark, tmp_path):
    # "é" is 1 codepoint / 2 UTF-8 bytes; "😀" is 1 codepoint (as Python
    # sees it) / 4 bytes. The reference budgets Table.Row.getSerializedSize()
    # — serialized UTF-8 bytes (beam/BatchRequestForDLP.java:62-66) — so a
    # codepoint count would pack 2x-4x over budget on non-ASCII payloads.
    rows = [
        ("k", 0, "agent", "é" * 100, "N/A", "2026-01-01 00:00:00"),  # 200 B
        ("k", 1, "agent", "é" * 100, "N/A", "2026-01-01 00:00:01"),  # 200 B
        ("k", 2, "agent", "😀" * 30, "N/A", "2026-01-01 00:00:02"),  # 120 B
        ("__flush__", 0, "agent", "f", "N/A", "2026-01-02 00:00:00"),
    ]
    d = _write_stream_input(spark, tmp_path, rows)
    out = stateful.batched_requests(
        jobs.read_transcript_stream(spark, d),
        max_batch_bytes=450,
        watermark="1 second",
    )
    got = {
        r.batch_seq: (r.n_rows, r.n_bytes)
        for r in _run_stream(spark, out, "batches_utf8").filter("key = 'k'").collect()
    }
    # byte-sized: 200+200=400 fits, +120 would overshoot 450 → [2 rows/400 B,
    # 1 row/120 B]. A codepoint count (100+100+30=230) would emit ONE batch.
    assert got == {0: (2, 400), 1: (1, 120)}


def test_conversation_assembler_pre_epoch_timestamps(spark):
    # negative-ms event times: last_ms must track the session's own max,
    # not be pinned to the 0 initializer (which would also corrupt gap
    # splits against later turns)
    rows = [
        ("c", 0, "agent", "hello", "N/A", "1969-12-31 22:00:00"),
        ("c", 1, "agent", "world", "N/A", "1969-12-31 22:01:00"),
        # > 5 min gap → second session, still pre-epoch
        ("c", 2, "agent", "again", "N/A", "1969-12-31 22:30:00"),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = sorted(
        (r.first_ms, r.last_ms, r.n_turns)
        for r in stateful.conversation_assembler(df, gap_ms=300_000).collect()
    )
    h22 = -7200_000  # 1969-12-31 22:00:00 UTC in ms
    assert out == [
        (h22, h22 + 60_000, 2),
        (h22 + 1800_000, h22 + 1800_000, 1),
    ]


def test_deid_sessions_single_query_stream(spark, tmp_path):
    """Round-4 composition: deid → conversation assembler chained in ONE
    streaming query (stateless tokenization projection under the stateful
    session machine). Asserts (a) exactly one stateful operator ran, (b)
    the output equals the batch composition deidentify→assembler, (c) the
    PII counts are non-trivial (the deid stage really minted surrogates
    before the stateful stage consumed them)."""
    import os

    import dlp_dataflow_deidentification_spark as dds
    from dlp_dataflow_deidentification_spark.sources.transcripts import (
        synthesize_transcripts,
    )

    tdf = synthesize_transcripts(spark, 2000, n_conversations=40)
    d = str(tmp_path / "deid_sess_in")
    tdf.coalesce(2).write.mode("append").parquet(d)
    flush = spark.createDataFrame(
        [("__flush__", 0, "agent", "x", "N/A", "2027-01-01 00:00:00")],
        "conv_id string, turn_idx int, role string, text string, tool string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    flush.write.mode("append").parquet(d)

    template = dds.DeidTemplate.from_file(
        os.path.join(os.path.dirname(__file__), "..", "configs/deid_transcripts.json"),
        crypto_key="0123456789abcdef",
    )
    out = jobs.deid_sessions_stream(
        spark, template, d, gap_ms=300_000, watermark="1 minute"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("deid_sess")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r.conv_id, r.first_ms): (r.n_turns, r.n_pii_turns)
        for r in spark.table("deid_sess").filter("conv_id <> '__flush__'").collect()
    }
    # exactly ONE stateful operator in the query (the session machine); the
    # deid stage fused in as a stateless projection
    ops = [s["operatorName"] for s in (q.lastProgress or {}).get("stateOperators", [])]
    assert ops == ["applyInPandasWithState"], ops

    want = {
        (r.conv_id, r.first_ms): (r.n_turns, r.n_pii_turns)
        for r in stateful.conversation_assembler(
            dds.deidentify(tdf, template), gap_ms=300_000
        ).collect()
    }
    assert got == want and len(want) >= 30
    assert sum(v[1] for v in want.values()) > 0  # surrogates actually minted


def test_stateful_ops_survive_multi_batch_catchup(spark, tmp_path):
    """Catch-up processing regression (found by the bench's chained
    deid->sessions leg): with maxFilesPerTrigger over files whose event
    times are NOT time-ordered, the watermark races ahead of many
    conversations' event times between micro-batches, and the stateful
    operators used to register a timeout EARLIER than the current
    watermark — Spark kills the query with INVALID_TIMEOUT_TIMESTAMP.
    Timeouts are now clamped to just past the current watermark (past-due
    state flushes at the next tick)."""
    from dlp_dataflow_deidentification_spark.sources.transcripts import (
        synthesize_transcripts,
    )

    tdf = synthesize_transcripts(spark, 5000, n_conversations=120)
    d = str(tmp_path / "catchup_in")
    # 8 files, each containing a random slice of the FULL event-time range
    tdf.repartition(8).write.mode("append").parquet(d)
    import time as _time

    _time.sleep(1.1)  # flush sentinel gets the newest mtime -> last batch
    flush = spark.createDataFrame(
        [("__flush__", 0, "agent", "x", "N/A", "2027-01-01 00:00:00")],
        "conv_id string, turn_idx int, role string, text string, tool string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    flush.coalesce(1).write.mode("append").parquet(d)

    stream = jobs.read_transcript_stream(spark, d, max_files_per_trigger=2)
    out = stateful.conversation_assembler(stream, gap_ms=1_800_000, watermark="1 minute")
    got = _run_stream(spark, out, "catchup_conv").filter("conv_id <> '__flush__'")
    # completes (no INVALID_TIMEOUT_TIMESTAMP) and flushes sessions for the
    # bulk of the conversations once the sentinel advances the watermark
    assert got.select("conv_id").distinct().count() >= 100

    stream2 = jobs.read_transcript_stream(spark, d, max_files_per_trigger=2)
    out2 = stateful.batched_requests(
        stream2, max_batch_bytes=2_000, flush_gap_ms=60_000, watermark="1 minute"
    )
    got2 = _run_stream(spark, out2, "catchup_batches").filter("key <> '__flush__'")
    assert got2.select("key").distinct().count() >= 100


def test_bucketed_assembler_equals_per_key_stream_and_batch(spark, tmp_path):
    """Super-key (bucketed) mode is output-identical to per-key mode: same
    session records from the streaming state machine (n_buckets forces many
    conversations per bucket) and from the batch degradation."""
    from dlp_dataflow_deidentification_spark.sources.transcripts import (
        synthesize_transcripts,
    )

    tdf = synthesize_transcripts(spark, 3000, n_conversations=60)
    d = str(tmp_path / "bkt_in")
    tdf.coalesce(2).write.mode("append").parquet(d)
    flush = spark.createDataFrame(
        [("__flush__", 0, "agent", "x", "N/A", "2027-01-01 00:00:00")],
        "conv_id string, turn_idx int, role string, text string, tool string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    flush.write.mode("append").parquet(d)

    def run(n_buckets, name):
        stream = jobs.read_transcript_stream(spark, d)
        out = stateful.conversation_assembler(
            stream, gap_ms=300_000, watermark="1 minute", n_buckets=n_buckets
        )
        return {
            (r.conv_id, r.first_ms): (r.n_turns, r.n_pii_turns, r.last_ms)
            for r in _run_stream(spark, out, name)
            .filter("conv_id <> '__flush__'")
            .collect()
        }

    per_key = run(None, "bkt_per_key")
    bucketed = run(7, "bkt_super")  # ~9 conversations per bucket
    assert bucketed == per_key and len(per_key) >= 50

    batch_per_key = {
        (r.conv_id, r.first_ms): (r.n_turns, r.n_pii_turns, r.last_ms)
        for r in stateful.conversation_assembler(tdf, gap_ms=300_000).collect()
    }
    batch_bucketed = {
        (r.conv_id, r.first_ms): (r.n_turns, r.n_pii_turns, r.last_ms)
        for r in stateful.conversation_assembler(
            tdf, gap_ms=300_000, n_buckets=7
        ).collect()
    }
    assert batch_bucketed == batch_per_key


def test_bucketed_assembler_pre_epoch_and_late_rows(spark):
    """Bucketed batch fold: pre-epoch (negative-ms) timestamps split/seed
    correctly, and a late row EARLIER than a carried session's start merges
    with min(first_ms) — the same edge cases the per-key fold pins."""
    rows = [
        ("c", 0, "agent", "hello [EMAIL]", "N/A", "1969-12-31 22:00:00"),
        ("c", 1, "agent", "world", "N/A", "1969-12-31 22:01:00"),
        ("c", 2, "agent", "again", "N/A", "1969-12-31 22:30:00"),
        ("d", 0, "agent", "solo", "N/A", "1970-01-01 05:00:00"),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = sorted(
        (r.conv_id, r.first_ms, r.last_ms, r.n_turns, r.n_pii_turns)
        for r in stateful.conversation_assembler(
            df, gap_ms=300_000, n_buckets=2
        ).collect()
    )
    h22 = -7200_000
    assert got == [
        ("c", h22, h22 + 60_000, 2, 1),
        ("c", h22 + 1800_000, h22 + 1800_000, 1, 0),
        ("d", 18_000_000, 18_000_000, 1, 0),
    ]


def test_bucketed_assembler_multi_batch_catchup(spark, tmp_path):
    """Bucketed mode survives watermark catch-up over time-unordered files
    (same INVALID_TIMEOUT_TIMESTAMP regression scenario as the per-key test)
    and flushes the same conversations."""
    from dlp_dataflow_deidentification_spark.sources.transcripts import (
        synthesize_transcripts,
    )

    tdf = synthesize_transcripts(spark, 5000, n_conversations=120)
    d = str(tmp_path / "bkt_catchup_in")
    tdf.repartition(8).write.mode("append").parquet(d)
    import time as _time

    _time.sleep(1.1)
    flush = spark.createDataFrame(
        [("__flush__", 0, "agent", "x", "N/A", "2027-01-01 00:00:00")],
        "conv_id string, turn_idx int, role string, text string, tool string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    flush.coalesce(1).write.mode("append").parquet(d)

    stream = jobs.read_transcript_stream(spark, d, max_files_per_trigger=2)
    out = stateful.conversation_assembler(
        stream, gap_ms=1_800_000, watermark="1 minute", n_buckets=16
    )
    got = _run_stream(spark, out, "bkt_catchup").filter("conv_id <> '__flush__'")
    assert got.select("conv_id").distinct().count() >= 100


def test_deid_sessions_bucketed_single_query_stream(spark, tmp_path):
    """The bench's production path — deid → BUCKETED session assembly in ONE
    streaming query — equals the per-key batch composition, with exactly one
    stateful operator in the plan."""
    import dlp_dataflow_deidentification_spark as dds
    from dlp_dataflow_deidentification_spark.sources.transcripts import (
        synthesize_transcripts,
    )

    tdf = synthesize_transcripts(spark, 2000, n_conversations=40)
    d = str(tmp_path / "deid_sess_bkt_in")
    tdf.coalesce(2).write.mode("append").parquet(d)
    flush = spark.createDataFrame(
        [("__flush__", 0, "agent", "x", "N/A", "2027-01-01 00:00:00")],
        "conv_id string, turn_idx int, role string, text string, tool string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    flush.write.mode("append").parquet(d)

    template = dds.DeidTemplate.from_file(
        os.path.join(os.path.dirname(__file__), "..", "configs/deid_transcripts.json"),
        crypto_key="0123456789abcdef",
    )
    out = jobs.deid_sessions_stream(
        spark, template, d, gap_ms=300_000, watermark="1 minute", n_buckets=5
    )
    q = (
        out.writeStream.format("memory")
        .queryName("deid_sess_bkt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r.conv_id, r.first_ms): (r.n_turns, r.n_pii_turns)
        for r in spark.table("deid_sess_bkt").filter("conv_id <> '__flush__'").collect()
    }
    ops = [s["operatorName"] for s in (q.lastProgress or {}).get("stateOperators", [])]
    assert ops == ["applyInPandasWithState"], ops

    want = {
        (r.conv_id, r.first_ms): (r.n_turns, r.n_pii_turns)
        for r in stateful.conversation_assembler(
            dds.deidentify(tdf, template), gap_ms=300_000
        ).collect()
    }
    assert got == want and len(want) >= 30
    assert sum(v[1] for v in want.values()) > 0


def test_bucketed_batched_requests_equals_per_key(spark, tmp_path):
    """Super-key batched_requests is output-identical to per-key mode —
    same multiset of (key, n_rows, n_bytes) batches from the streaming
    state machine and from the batch degradation (pack_greedy still runs
    per key inside the bucket)."""
    from dlp_dataflow_deidentification_spark.sources.transcripts import (
        synthesize_transcripts,
    )

    tdf = synthesize_transcripts(spark, 3000, n_conversations=60)
    d = str(tmp_path / "bktbr_in")
    tdf.coalesce(2).write.mode("append").parquet(d)
    flush = spark.createDataFrame(
        [("__flush__", 0, "agent", "x", "N/A", "2027-01-01 00:00:00")],
        "conv_id string, turn_idx int, role string, text string, tool string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    flush.write.mode("append").parquet(d)

    def run(n_buckets, name):
        stream = jobs.read_transcript_stream(spark, d)
        out = stateful.batched_requests(
            stream,
            max_batch_bytes=2_000,
            flush_gap_ms=60_000,
            watermark="1 minute",
            order_col="turn_idx",
            n_buckets=n_buckets,
        )
        sizes = {}
        for r in (
            _run_stream(spark, out, name).filter("key <> '__flush__'").collect()
        ):
            sizes.setdefault(r.key, []).append((r.n_rows, r.n_bytes))
        return {k: sorted(v) for k, v in sizes.items()}

    per_key = run(None, "bktbr_per_key")
    bucketed = run(7, "bktbr_super")
    assert bucketed == per_key and len(per_key) >= 50

    def run_batch(n_buckets):
        out = stateful.batched_requests(
            tdf,
            max_batch_bytes=2_000,
            order_col="turn_idx",
            n_buckets=n_buckets,
        )
        sizes = {}
        for r in out.collect():
            sizes.setdefault(r.key, []).append((r.n_rows, r.n_bytes))
        return {k: sorted(v) for k, v in sizes.items()}

    assert run_batch(7) == run_batch(None)


def test_bucketed_batched_requests_multi_batch_catchup(spark, tmp_path):
    """Bucketed batched_requests survives watermark catch-up over
    time-unordered files and flushes remainders for every key."""
    from dlp_dataflow_deidentification_spark.sources.transcripts import (
        synthesize_transcripts,
    )

    tdf = synthesize_transcripts(spark, 5000, n_conversations=120)
    d = str(tmp_path / "bktbr_catchup_in")
    tdf.repartition(8).write.mode("append").parquet(d)
    import time as _time

    _time.sleep(1.1)
    flush = spark.createDataFrame(
        [("__flush__", 0, "agent", "x", "N/A", "2027-01-01 00:00:00")],
        "conv_id string, turn_idx int, role string, text string, tool string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    flush.coalesce(1).write.mode("append").parquet(d)

    stream = jobs.read_transcript_stream(spark, d, max_files_per_trigger=2)
    out = stateful.batched_requests(
        stream,
        max_batch_bytes=2_000,
        flush_gap_ms=60_000,
        watermark="1 minute",
        n_buckets=16,
    )
    got = _run_stream(spark, out, "bktbr_catchup").filter("key <> '__flush__'")
    assert got.select("key").distinct().count() >= 100


def test_bucketed_modes_keep_null_key_rows(spark, tmp_path):
    """Per-key mode (Spark groupBy) keeps a null-key group; the bucketed
    folds must emit IDENTICAL output for null keys instead of silently
    dropping them (pandas groupby dropna default) or splitting them per-row
    (NaN != NaN in the conv-boundary mask). Exercises batch + streaming,
    assembler + packer; streaming uses maxFilesPerTrigger=1 so the null
    conversation is carried across micro-batch state (JSON sentinel
    encode/decode) and flushed by the timeout branch."""
    rows = [
        (None, 0, "agent", "hello [EMAIL]", "N/A", "2026-01-01 10:00:00"),
        (None, 1, "agent", "world", "N/A", "2026-01-01 10:01:00"),
        (None, 2, "agent", "later session", "N/A", "2026-01-01 11:00:00"),
        ("c", 0, "agent", "x", "N/A", "2026-01-01 10:00:30"),
        ("c", 1, "agent", "y [PHONE]", "N/A", "2026-01-01 10:02:30"),
    ]
    schema = (
        "conv_id string, turn_idx int, role string, text string, tool string, ts string"
    )
    df = spark.createDataFrame(rows, schema).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )

    def sess_set(out_df):
        return sorted(
            (
                (r.conv_id, r.first_ms, r.last_ms, r.n_turns, r.n_pii_turns)
                for r in out_df.collect()
            ),
            key=lambda t: (t[0] is not None, t[0] or "", t[1]),
        )

    per_key = sess_set(stateful.conversation_assembler(df, gap_ms=300_000))
    bucketed = sess_set(
        stateful.conversation_assembler(df, gap_ms=300_000, n_buckets=2)
    )
    assert bucketed == per_key
    # the null conversation assembles as ONE key with two gap-split sessions
    assert sum(1 for s in per_key if s[0] is None) == 2

    def batch_multiset(n_buckets):
        out = stateful.batched_requests(
            df, max_batch_bytes=8, order_col="turn_idx", n_buckets=n_buckets
        )
        sizes = {}
        for r in out.collect():
            sizes.setdefault(r.key, []).append((r.n_rows, r.n_bytes))
        return {k: sorted(v) for k, v in sizes.items()}

    pk, bk = batch_multiset(None), batch_multiset(2)
    assert bk == pk and None in pk

    # streaming: null rows in the FIRST file, flush sentinel in the second →
    # the null session rides the carried JSON state and exits via timeout
    d = str(tmp_path / "nullkey_in")
    df.coalesce(1).write.mode("append").parquet(d)
    import time as _time

    _time.sleep(1.1)
    flush = spark.createDataFrame(
        [("__flush__", 0, "agent", "x", "N/A", "2027-01-01 00:00:00")], schema
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    flush.coalesce(1).write.mode("append").parquet(d)

    def run(n_buckets, name):
        stream = jobs.read_transcript_stream(spark, d, max_files_per_trigger=1)
        out = stateful.conversation_assembler(
            stream, gap_ms=300_000, watermark="1 minute", n_buckets=n_buckets
        )
        return sess_set(
            _run_stream(spark, out, name).filter(
                "conv_id is null or conv_id <> '__flush__'"
            )
        )

    s_pk = run(None, "nullkey_per_key")
    s_bk = run(3, "nullkey_super")
    assert s_bk == s_pk
    assert sum(1 for s in s_pk if s[0] is None) == 2
