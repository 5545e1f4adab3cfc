"""Custom stateful operators over the RocksDB/HDFS state store.

``batched_requests`` is the direct re-expression of the reference's
BagState + event-time-timer batcher
(beam/BatchRequestForDLP.java:44-106: buffer rows per sharded key, fire at
the window end, greedily pack ≤ batchSizeBytes bags; V1 equivalent
DLPTextToBigQueryStreaming.java:604-668; unit-test contract
BatchRequestForDLPTest.java:59-121 asserts the multiset of emitted batch
sizes per key). In Spark the operator is ``applyInPandasWithState``:

* state = (buffered byte size, buffered row count, next batch sequence)
* new rows append to the buffer; every time the byte budget fills, a batch
  row (key, batch_seq, n_rows, n_bytes) is emitted — greedy packing
* an event-time timeout (watermark-driven — the Beam timer analogue)
  flushes the remainder

``conversation_assembler`` applies the same machinery to the transcript
payload: per-conv_id turn accumulation emitted when the conversation goes
idle past the gap (the stateful upgrade of session_window when per-session
custom logic is needed).
"""
from __future__ import annotations

from typing import Any, Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

BATCH_OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("batch_seq", IntegerType()),
        StructField("n_rows", IntegerType()),
        StructField("n_bytes", LongType()),
    ]
)

_BATCH_STATE_SCHEMA = StructType(
    [
        StructField("buf_bytes", LongType()),
        StructField("buf_rows", IntegerType()),
        StructField("next_seq", IntegerType()),
        StructField("max_event_ms", LongType()),
    ]
)


def pack_greedy(
    sizes, buf_bytes: int, buf_rows: int, next_seq: int, max_batch_bytes: int
):
    """Vectorized greedy byte-packing (cumsum + one searchsorted per emitted
    batch). Semantics identical to the scalar rule the reference's
    BatchRequestForDLP implements per bag: flush when adding the next row
    would exceed the budget and the buffer is non-empty; a single oversized
    row forms its own batch. Returns (emitted [(seq, n_rows, n_bytes)...],
    (buf_bytes, buf_rows, next_seq))."""
    out: list[tuple] = []
    sizes = np.asarray(sizes, dtype=np.int64)
    if not len(sizes):
        return out, (buf_bytes, buf_rows, next_seq)
    cs = np.cumsum(sizes)
    start, n_in = 0, len(sizes)
    while start < n_in:
        base = int(cs[start - 1]) if start else 0
        budget = max_batch_bytes - buf_bytes if buf_rows else max_batch_bytes
        j = int(np.searchsorted(cs, base + budget, side="right")) - 1
        if j < start:
            if buf_rows:  # next row overflows the carry → flush it
                out.append((next_seq, buf_rows, buf_bytes))
                next_seq += 1
                buf_bytes, buf_rows = 0, 0
                continue
            j = start  # oversized single row: its own buffer
        buf_bytes += int(cs[j]) - base
        buf_rows += j - start + 1
        start = j + 1
        if start < n_in:  # row j+1 overflowed → emit now
            out.append((next_seq, buf_rows, buf_bytes))
            next_seq += 1
            buf_bytes, buf_rows = 0, 0
    return out, (buf_bytes, buf_rows, next_seq)


def _payload_sizes(
    pdf: pd.DataFrame, payload_col: str, order_col: "str | None"
) -> "np.ndarray":
    """Per-row payload size in packing order — the ONE sizing rule shared by
    the per-key and bucketed packers. fillna BEFORE astype(str): astype
    would turn None into the literal 4-char string "None", charging null
    payloads 4 bytes. Size = UTF-8 BYTES, not codepoints: the reference
    budgets Table.Row.getSerializedSize()
    (beam/BatchRequestForDLP.java:62-66), which is proto-serialized UTF-8 —
    a codepoint count would under-charge non-ASCII payloads up to 4x and
    overshoot max_batch_bytes."""
    if order_col is not None:
        pdf = pdf.sort_values(order_col, kind="mergesort")
    return (
        pdf[payload_col]
        .fillna("")
        .astype(str)
        .str.encode("utf-8")
        .str.len()
        .astype("int64")
        .to_numpy()
    )


def batched_requests(
    df: DataFrame,
    key_col: str = "conv_id",
    payload_col: str = "text",
    ts_col: str = "ts",
    max_batch_bytes: int = 500_000,
    flush_gap_ms: int = 10_000,
    watermark: str = "10 seconds",
    order_col: "str | None" = None,
    n_buckets: "int | None" = None,
) -> DataFrame:
    """Greedy byte-budget batching per key with event-time flush.

    Streaming input: ``applyInPandasWithState`` (state store + watermark
    timeout flushes the remainder). Batch input: ``applyInPandasWithState``
    is streaming-only in Spark, so the operator degrades to a stateless
    ``applyInPandas`` over the same ``pack_greedy`` core — one invocation
    per key, remainder flushed as the final batch; this is the
    oracle-testable form. ``order_col``: pack rows in this deterministic
    order instead of arrival/partition order (required for the batch oracle;
    in streaming it orders only within each delivered chunk — arrival order
    across micro-batches is the semantic, as in the reference's BagState).
    Output: key, batch_seq, n_rows, n_bytes.

    ``n_buckets``: super-key mode — ONE state row (JSON map of per-key
    buffers) and ONE pandas dispatch per ``pmod(xxhash64(key), n_buckets)``
    bucket, ``pack_greedy`` still applied per key inside it (ordering
    nuance: with ``order_col``, per-key mode sorts each delivered Arrow
    chunk; bucketed mode sorts the key's rows across the WHOLE delivered
    micro-batch — a strict superset, and identical whenever a key's rows
    fit one chunk or arrive ordered). Same amortization as
    ``conversation_assembler(n_buckets=...)`` — this IS the
    reference's ShardRows→BatchRequestForDLP shape (shard precisely so
    per-key dispatch amortizes, beam/ShardRows.java:66-81); at millions of
    live keys per-key Arrow dispatch dominates the stateless work. Output
    identical to per-key mode (pinned by tests).
    """
    if n_buckets is not None:
        return _bucketed_batched_requests(
            df,
            key_col,
            payload_col,
            ts_col,
            max_batch_bytes,
            flush_gap_ms,
            watermark,
            order_col,
            n_buckets,
        )

    def _sizes(pdf: pd.DataFrame) -> "np.ndarray":
        return _payload_sizes(pdf, payload_col, order_col)

    wdf = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))

    if not wdf.isStreaming:
        def bfn(pdf: pd.DataFrame) -> pd.DataFrame:
            key = pdf[key_col].iloc[0]
            emitted, (buf_bytes, buf_rows, next_seq) = pack_greedy(
                _sizes(pdf), 0, 0, 0, max_batch_bytes
            )
            out = [(key, seq, n, b) for seq, n, b in emitted]
            if buf_rows:  # full flush: the remainder is the final batch
                out.append((key, next_seq, buf_rows, buf_bytes))
            return pd.DataFrame(out, columns=["key", "batch_seq", "n_rows", "n_bytes"])

        return wdf.groupBy(F.col(key_col)).applyInPandas(bfn, BATCH_OUTPUT_SCHEMA)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            buf_bytes, buf_rows, next_seq, max_ms = state.get
        else:
            buf_bytes, buf_rows, next_seq, max_ms = 0, 0, 0, 0

        out: list[tuple] = []
        if state.hasTimedOut:
            if buf_rows:
                out.append((key[0], next_seq, buf_rows, buf_bytes))
            state.remove()
        else:
            for pdf in pdfs:
                sizes = _sizes(pdf)
                if ts_col in pdf.columns and len(pdf):
                    ms = (pdf[ts_col].astype("int64") // 1_000_000).max()
                    max_ms = max(max_ms, int(ms))
                if not len(sizes):
                    continue
                emitted, (buf_bytes, buf_rows, next_seq) = pack_greedy(
                    sizes, buf_bytes, buf_rows, next_seq, max_batch_bytes
                )
                out.extend((key[0], seq, n, b) for seq, n, b in emitted)
            state.update((buf_bytes, buf_rows, next_seq, max_ms))
            # Beam: event-time timer at window max; here: watermark-driven
            # timeout at last-event-time + flush gap. Clamped to just past
            # the CURRENT watermark: during multi-batch catch-up the
            # watermark can already be beyond an old key's event times, and
            # Spark rejects a timeout earlier than the watermark
            # (INVALID_TIMEOUT_TIMESTAMP) — a past-due buffer should simply
            # flush at the next tick.
            state.setTimeoutTimestamp(
                max(max_ms + flush_gap_ms, state.getCurrentWatermarkMs() + 1)
            )
        if out:
            yield pd.DataFrame(out, columns=["key", "batch_seq", "n_rows", "n_bytes"])

    wdf = wdf.withWatermark(ts_col, watermark)
    return wdf.groupBy(F.col(key_col)).applyInPandasWithState(
        fn,
        BATCH_OUTPUT_SCHEMA,
        _BATCH_STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


CONV_OUTPUT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("n_turns", IntegerType()),
        StructField("n_pii_turns", IntegerType()),
        StructField("first_ms", LongType()),
        StructField("last_ms", LongType()),
    ]
)

# bucketed (super-key) mode: ONE state row per bucket holding the packed
# per-conversation open sessions (JSON {conv_id: [n, npii, first, last]})
_SUPER_STATE_SCHEMA = StructType([StructField("packed", StringType())])

_PII_RE = r"\[[A-Z_]+\]"
_SESS_COLS = ["conv_id", "n_turns", "n_pii_turns", "first_ms", "last_ms"]

# Bucketed modes fold in pandas, where groupby drops null keys and the
# packed-state JSON map cannot hold a null key — but per-key mode (Spark
# groupBy) KEEPS a null-key group, and the bucketed modes promise identical
# output. Null keys are therefore encoded as this reserved sentinel inside
# the fold/state and decoded back to null at every emit point. Control
# chars cannot appear in any realistically sourced key (file names, table
# keys, conversation ids); NUL itself is avoided — numpy's fixed-width
# unicode storage strips trailing NUL bytes, so a bare "\\x00" silently
# becomes "" through pandas fillna/groupby.
_NULL_KEY = "\x01__null_key__\x01"


def _decode_null_key(df: pd.DataFrame, col: str) -> pd.DataFrame:
    mask = df[col] == _NULL_KEY
    if mask.any():
        df = df.copy()
        df.loc[mask, col] = None
    return df


def _fold_bucket(pdf: pd.DataFrame, carried: dict, gap_ms: int):
    """Vectorized gap-session fold over ALL conversations in one bucket.

    Semantically identical to ``conversation_assembler``'s per-key scalar
    fold (same split rule ``ts - running_max_last >= gap_ms``, same
    min/max first/last merge against carried state), but one pandas pass
    per BUCKET instead of one Python dispatch per conversation — the
    ShardRows-style batching that amortizes per-key overhead
    (beam/ShardRows.java:66-81).

    Two cumsum passes:
      1. rows sorted by (conv, ts): session breaks where the gap to the
         previous row (== running max, rows ascending) >= gap_ms → chunk
         sessions aggregated in one groupby;
      2. chunk sessions ∪ carried open sessions sorted by (conv, first):
         re-merge with the same rule against a per-conv running-max
         ``last`` (cummax) — a carried session can overlap/bridge chunk
         sessions arbitrarily, which running-max handles exactly like the
         scalar fold does.

    Returns ``(sessions, is_open)``: per-conv time-ordered session records
    (columns ``_SESS_COLS``) and a bool mask marking each conversation's
    trailing (still-open) session.
    """
    ms = (pdf["ts"].astype("int64") // 1_000_000).to_numpy()
    pii = (
        pdf["text"].str.contains(_PII_RE, regex=True, na=False).to_numpy().astype("int64")
    )
    conv_in = pdf["conv_id"]
    if conv_in.isna().any():
        # null-key group: encoded as the sentinel for the whole fold (and in
        # the carried state map); decoded back to null by the callers
        conv_in = conv_in.fillna(_NULL_KEY)
    rf = pd.DataFrame({"conv": conv_in.to_numpy(), "ms": ms, "pii": pii})
    rf = rf.sort_values(["conv", "ms"], kind="mergesort", ignore_index=True)
    new_conv = rf["conv"].ne(rf["conv"].shift())
    brk = new_conv | (rf["ms"] - rf["ms"].shift() >= gap_ms)
    rf["sid"] = brk.cumsum()
    sess = rf.groupby("sid", sort=False).agg(
        conv=("conv", "first"),
        n=("pii", "size"),
        npii=("pii", "sum"),
        first=("ms", "min"),
        last=("ms", "max"),
    )
    # the carried open session SEEDS the fold (rank 0, BEFORE every chunk
    # session regardless of its own timestamps): the scalar per-key rule
    # splits only on a FORWARD gap (ms - running_last >= gap), so a late
    # chunk session entirely EARLIER than the carried one still merges into
    # it — sorting carried into timestamp position would wrongly close it
    # (found by test_fold_bucket_equals_scalar_fold_property)
    sess["_rank"] = 1
    if carried:
        cf = pd.DataFrame(
            [(c, v[0], v[1], v[2], v[3], 0) for c, v in carried.items()],
            columns=["conv", "n", "npii", "first", "last", "_rank"],
        )
        sess = pd.concat([sess, cf], ignore_index=True)
    sess = sess.sort_values(
        ["conv", "_rank", "first"], kind="mergesort", ignore_index=True
    )
    new_conv2 = sess["conv"].ne(sess["conv"].shift())
    # running max of `last` within the conv: a carried session can span
    # several chunk sessions; shift() crossing a conv boundary is masked
    # off by new_conv2
    cm = sess.groupby("conv", sort=False)["last"].cummax()
    brk2 = new_conv2 | (sess["first"] - cm.shift() >= gap_ms)
    sess["sid2"] = brk2.cumsum()
    merged = (
        sess.groupby("sid2", sort=False)
        .agg(
            conv=("conv", "first"),
            n=("n", "sum"),
            npii=("npii", "sum"),
            first=("first", "min"),
            last=("last", "max"),
        )
        .reset_index(drop=True)
    )
    merged.columns = pd.Index(_SESS_COLS)
    is_open = merged["conv_id"].ne(merged["conv_id"].shift(-1)).to_numpy()
    return merged, is_open

_CONV_STATE_SCHEMA = StructType(
    [
        StructField("n_turns", IntegerType()),
        StructField("n_pii_turns", IntegerType()),
        StructField("first_ms", LongType()),
        StructField("last_ms", LongType()),
    ]
)


def conversation_assembler(
    df: DataFrame,
    gap_ms: int = 1_800_000,
    watermark: str = "30 minutes",
    n_buckets: "int | None" = None,
) -> DataFrame:
    """Per-conv_id stateful assembly: accumulate turn stats in state, emit one
    conversation record when the conversation idles past ``gap_ms`` (event-time
    timeout) — the custom-logic upgrade of ``session_window``. Batch input
    degrades to a stateless ``applyInPandas`` (applyInPandasWithState is
    streaming-only): all turns per key in one invocation, every gap-closed
    session emitted including the final one.

    ``n_buckets``: bucketed (super-key) mode — group by
    ``pmod(xxhash64(conv_id), n_buckets)`` instead of per conv_id, with ONE
    state row per bucket carrying every open conversation in it and ONE
    vectorized pandas fold per bucket (``_fold_bucket``). This is the
    ShardRows batching analogue (beam/ShardRows.java:66-81 — shard precisely
    to amortize per-key dispatch): at millions of small conversations the
    per-group Arrow/pandas dispatch dominates, and bucketing turns ~|keys|
    dispatches per micro-batch into ~n_buckets. Output is identical to
    per-key mode (pinned by tests). Sizing: open conversations per bucket ≈
    live_keys / n_buckets; keep the packed state row well under the state
    store's value-size comfort zone (a few MB) — e.g. 1e8 live conversations
    → n_buckets ≈ 1e5–1e6 spread over executors."""
    if n_buckets is not None:
        return _bucketed_assembler(df, gap_ms, watermark, n_buckets)

    cols = ["conv_id", "n_turns", "n_pii_turns", "first_ms", "last_ms"]

    def _sessions(
        pdf: pd.DataFrame,
        key,
        n: int = 0,
        npii: int = 0,
        first_ms: int = 0,
        last_ms: int = 0,
    ):
        """ONE gap-split loop shared by the batch and streaming paths:
        fold ts-sorted turns into the carried (n, npii, first_ms, last_ms)
        open-session state, emitting a record at every gap. Returns
        (closed_records, open_session_state). ``n == 1`` (not a falsy
        first_ms) marks a session's first turn, so epoch-0 timestamps are
        handled correctly."""
        pdf = pdf.sort_values("ts", kind="mergesort")
        ms = (pdf["ts"].astype("int64") // 1_000_000).to_numpy()
        pii = pdf["text"].str.contains(r"\[[A-Z_]+\]", regex=True, na=False).to_numpy()
        out = []
        for i in range(len(pdf)):
            if n and ms[i] - last_ms >= gap_ms:
                out.append((key, n, npii, first_ms, last_ms))
                n, npii = 0, 0
            n += 1
            npii += int(pii[i])
            # min() (not just the n==1 row): a late within-watermark row in a
            # LATER micro-batch can precede the carried session's start
            first_ms = int(ms[i]) if n == 1 else min(first_ms, int(ms[i]))
            # same n==1 seeding as first_ms: a bare max() against the 0
            # initializer would pin pre-1970 (negative-ms) sessions to 0
            last_ms = int(ms[i]) if n == 1 else max(last_ms, int(ms[i]))
        return out, (n, npii, first_ms, last_ms)

    if not df.isStreaming:
        def bfn(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.copy()
            pdf["ts"] = pd.to_datetime(pdf["ts"])
            out, (n, npii, first_ms, last_ms) = _sessions(pdf, pdf["conv_id"].iloc[0])
            if n:  # full flush: the trailing open session is the last record
                out.append((pdf["conv_id"].iloc[0], n, npii, first_ms, last_ms))
            return pd.DataFrame(out, columns=cols)

        return (
            df.withColumn("ts", F.col("ts").cast("timestamp"))
            .groupBy(F.col("conv_id"))
            .applyInPandas(bfn, CONV_OUTPUT_SCHEMA)
        )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, npii, first_ms, last_ms = state.get
        else:
            n, npii, first_ms, last_ms = 0, 0, 0, 0
        if state.hasTimedOut:
            if n:
                yield pd.DataFrame([(key[0], n, npii, first_ms, last_ms)], columns=cols)
            state.remove()
            return

        batch = pd.concat(list(pdfs), ignore_index=True)
        # same loop as the batch path (_sessions), seeded with carried state
        out, (n, npii, first_ms, last_ms) = _sessions(
            batch, key[0], n, npii, first_ms, last_ms
        )
        state.update((n, npii, first_ms, last_ms))
        # clamp to just past the current watermark (see batched_requests):
        # an already-idle conversation times out at the next tick instead of
        # crashing the query with INVALID_TIMEOUT_TIMESTAMP
        state.setTimeoutTimestamp(
            max(last_ms + gap_ms, state.getCurrentWatermarkMs() + 1)
        )
        if out:
            yield pd.DataFrame(out, columns=cols)

    wdf = df.withColumn("ts", F.col("ts").cast("timestamp"))
    if wdf.isStreaming:
        wdf = wdf.withWatermark("ts", watermark)
    return wdf.groupBy(F.col("conv_id")).applyInPandasWithState(
        fn,
        CONV_OUTPUT_SCHEMA,
        _CONV_STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def _bucketed_assembler(
    df: DataFrame, gap_ms: int, watermark: str, n_buckets: int
) -> DataFrame:
    """Super-key implementation of ``conversation_assembler`` (see its
    docstring): one state row + one vectorized fold per bucket. Per-conv
    open sessions ride in the bucket's state as a JSON map
    ``{conv_id: [n, npii, first_ms, last_ms]}``; the bucket's event-time
    timeout is armed at the EARLIEST open conversation's deadline
    (min(last_ms) + gap_ms, watermark-clamped like the per-key path), and a
    firing flushes exactly the conversations whose deadline the watermark
    passed, re-arming for the rest."""
    import json

    wdf = df.withColumn("ts", F.col("ts").cast("timestamp")).withColumn(
        "__bucket", F.pmod(F.xxhash64(F.col("conv_id")), F.lit(n_buckets))
    )

    if not wdf.isStreaming:

        def bfn(pdf: pd.DataFrame) -> pd.DataFrame:
            # full flush: open sessions are final records too
            sessions, _ = _fold_bucket(pdf, {}, gap_ms)
            return _decode_null_key(sessions, "conv_id")

        return wdf.groupBy("__bucket").applyInPandas(bfn, CONV_OUTPUT_SCHEMA)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        carried: dict = json.loads(state.get[0]) if state.exists else {}

        if state.hasTimedOut:
            wm = state.getCurrentWatermarkMs()
            due = [
                (None if c == _NULL_KEY else c, v[0], v[1], v[2], v[3])
                for c, v in carried.items()
                if v[3] + gap_ms <= wm
            ]
            keep = {c: v for c, v in carried.items() if v[3] + gap_ms > wm}
            if keep:
                state.update((json.dumps(keep),))
                state.setTimeoutTimestamp(
                    max(min(v[3] + gap_ms for v in keep.values()), wm + 1)
                )
            else:
                state.remove()
            if due:
                yield pd.DataFrame(due, columns=_SESS_COLS)
            return

        batch = pd.concat(list(pdfs), ignore_index=True)
        sessions, is_open = _fold_bucket(batch, carried, gap_ms)
        closed = _decode_null_key(sessions[~is_open], "conv_id")
        carried = {
            r.conv_id: [int(r.n_turns), int(r.n_pii_turns), int(r.first_ms), int(r.last_ms)]
            for r in sessions[is_open].itertuples()
        }
        state.update((json.dumps(carried),))
        # same watermark clamp as the per-key path: a past-due bucket
        # flushes at the next tick instead of crashing the query
        state.setTimeoutTimestamp(
            max(
                min(v[3] + gap_ms for v in carried.values()),
                state.getCurrentWatermarkMs() + 1,
            )
        )
        if len(closed):
            yield closed

    wdf = wdf.withWatermark("ts", watermark)
    return wdf.groupBy("__bucket").applyInPandasWithState(
        fn,
        CONV_OUTPUT_SCHEMA,
        _SUPER_STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def _bucketed_batched_requests(
    df: DataFrame,
    key_col: str,
    payload_col: str,
    ts_col: str,
    max_batch_bytes: int,
    flush_gap_ms: int,
    watermark: str,
    order_col: "str | None",
    n_buckets: int,
) -> DataFrame:
    """Super-key implementation of ``batched_requests`` (see its docstring):
    per-key carry buffers ride in ONE bucket state row as a JSON map
    ``{key: [buf_bytes, buf_rows, next_seq, max_event_ms]}``; the bucket's
    event-time timeout fires at the EARLIEST key deadline (min(max_ms) +
    flush_gap, watermark-clamped) and flushes exactly the due keys'
    remainders, re-arming for the rest. ``pack_greedy`` (the numpy core)
    still runs per key — bucketing amortizes only the per-group
    Arrow/pandas dispatch, which is what dominates at many small keys."""
    import json

    def _sizes(pdf: pd.DataFrame) -> "np.ndarray":
        return _payload_sizes(pdf, payload_col, order_col)

    def _fold(pdf: pd.DataFrame, carried: dict):
        """Per-key pack_greedy over one bucket's delivered rows, seeded with
        the carried buffers. Returns (emitted rows, new carried).
        ``dropna=False`` + sentinel: per-key mode keeps a null-key group
        (Spark groupBy), so the bucketed fold must too — pandas groupby
        would silently drop those rows, and the carried JSON map needs a
        string key (_NULL_KEY), decoded back to null on emit."""
        out: list[tuple] = []
        ms_all = (
            (pdf[ts_col].astype("int64") // 1_000_000)
            if ts_col in pdf.columns and len(pdf)
            else None
        )
        for key, kdf in pdf.groupby(key_col, sort=False, dropna=False):
            k_enc = _NULL_KEY if pd.isna(key) else key
            k_out = None if pd.isna(key) else key
            st = carried.get(k_enc, [0, 0, 0, 0])
            buf_bytes, buf_rows, next_seq, max_ms = st
            if ms_all is not None:
                max_ms = max(max_ms, int(ms_all.loc[kdf.index].max()))
            emitted, (buf_bytes, buf_rows, next_seq) = pack_greedy(
                _sizes(kdf), buf_bytes, buf_rows, next_seq, max_batch_bytes
            )
            out.extend((k_out, seq, n, b) for seq, n, b in emitted)
            carried[k_enc] = [int(buf_bytes), int(buf_rows), int(next_seq), int(max_ms)]
        return out, carried

    wdf = df.withColumn(ts_col, F.col(ts_col).cast("timestamp")).withColumn(
        "__bucket", F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets))
    )
    out_cols = ["key", "batch_seq", "n_rows", "n_bytes"]

    if not wdf.isStreaming:

        def bfn(pdf: pd.DataFrame) -> pd.DataFrame:
            out, carried = _fold(pdf, {})
            for key, (bb, br, seq, _ms) in carried.items():
                if br:  # full flush: each remainder is its key's final batch
                    out.append((None if key == _NULL_KEY else key, seq, br, bb))
            return pd.DataFrame(out, columns=out_cols)

        return wdf.groupBy("__bucket").applyInPandas(bfn, BATCH_OUTPUT_SCHEMA)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        carried: dict = json.loads(state.get[0]) if state.exists else {}

        if state.hasTimedOut:
            wm = state.getCurrentWatermarkMs()
            due, keep = [], {}
            for k, (bb, br, seq, max_ms) in carried.items():
                if max_ms + flush_gap_ms <= wm:
                    if br:
                        due.append((None if k == _NULL_KEY else k, seq, br, bb))
                else:
                    keep[k] = [bb, br, seq, max_ms]
            if keep:
                state.update((json.dumps(keep),))
                state.setTimeoutTimestamp(
                    max(
                        min(v[3] + flush_gap_ms for v in keep.values()), wm + 1
                    )
                )
            else:
                state.remove()
            if due:
                yield pd.DataFrame(due, columns=out_cols)
            return

        batch = pd.concat(list(pdfs), ignore_index=True)
        out, carried = _fold(batch, carried)
        state.update((json.dumps(carried),))
        state.setTimeoutTimestamp(
            max(
                min(v[3] + flush_gap_ms for v in carried.values()),
                state.getCurrentWatermarkMs() + 1,
            )
        )
        if out:
            yield pd.DataFrame(out, columns=out_cols)

    wdf = wdf.withWatermark(ts_col, watermark)
    return wdf.groupBy("__bucket").applyInPandasWithState(
        fn,
        BATCH_OUTPUT_SCHEMA,
        _SUPER_STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
