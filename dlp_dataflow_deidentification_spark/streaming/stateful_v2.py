"""transformWithStateInPandas (Spark 4 StatefulProcessor API, RocksDB state
store) — the second-generation form of the custom stateful operators in
``stateful.py``. Same reference analogue (BagState + event-time timer,
beam/BatchRequestForDLP.java:44-106) expressed with typed value state and
explicit timers over the RocksDB provider (the north-star's state store).

ENVIRONMENT NOTE: Spark's transformWithState Python driver-worker needs the
``protobuf`` wheel (pyspark/sql/streaming/proto), which this sandbox lacks —
so the pipeline here is implemented and its test self-skips with the crash
signature; ``stateful.py`` (applyInPandasWithState) is the exercised path.
On a normally-provisioned cluster this module runs as-is.
"""
from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)
from pyspark.sql.types import StructType

CONV_STATS_SCHEMA = "conv_id string, n_turns long, n_pii_turns long, first_ms long, last_ms long"
_STATE_SCHEMA = "n long, npii long, first_ms long, last_ms long"

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


class ConversationStatsProcessor(StatefulProcessor):
    """Per-conv_id accumulation in a typed ValueState; an event-time timer at
    last_ms + gap emits the assembled conversation record and clears state."""

    def __init__(self, gap_ms: int = 1_800_000):
        self.gap_ms = gap_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.state = handle.getValueState("conv_agg", _STATE_SCHEMA)

    def handleInputRows(
        self, key, rows, timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        n, npii, first_ms, last_ms = (
            tuple(self.state.get()) if self.state.exists() else (0, 0, 0, 0)
        )
        for pdf in rows:
            ms = pdf["ts"].astype("int64") // 1_000_000
            n += len(pdf)
            npii += int(
                pdf["text"].str.contains(r"\[[A-Z_]+\]", regex=True, na=False).sum()
            )
            lo = int(ms.min())
            first_ms = lo if first_ms == 0 else min(first_ms, lo)
            last_ms = max(last_ms, int(ms.max()))
        self.state.update((n, npii, first_ms, last_ms))
        # delete any timer registered for an earlier last_ms: a stale timer
        # would fire at old_last+gap and prematurely split a still-active
        # conversation (Beam's single-timer-per-key semantics rearm on set;
        # transformWithState timers accumulate unless deleted)
        for t in self.handle.listTimers():
            self.handle.deleteTimer(t)
        self.handle.registerTimer(last_ms + self.gap_ms)
        return iter(())

    def handleExpiredTimer(
        self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        if not self.state.exists():
            return iter(())
        n, npii, first_ms, last_ms = tuple(self.state.get())
        # belt-and-braces stale check: only the timer armed for the CURRENT
        # last_ms may close the conversation
        if expiredTimerInfo.getExpiryTimeInMs() < last_ms + self.gap_ms:
            return iter(())
        self.state.clear()
        yield pd.DataFrame(
            [(key[0], n, npii, first_ms, last_ms)],
            columns=["conv_id", "n_turns", "n_pii_turns", "first_ms", "last_ms"],
        )

    def close(self) -> None:
        pass


def conversation_stats_tws(
    df: DataFrame,
    gap_ms: int = 1_800_000,
    watermark: str = "30 minutes",
) -> DataFrame:
    """transformWithStateInPandas pipeline (requires the RocksDB state store
    provider — set ``spark.sql.streaming.stateStore.providerClass`` to
    ``ROCKSDB_PROVIDER`` before starting the query)."""
    wdf = df.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark("ts", watermark)
    return wdf.groupBy("conv_id").transformWithStateInPandas(
        statefulProcessor=ConversationStatsProcessor(gap_ms),
        outputStructType=CONV_STATS_SCHEMA,
        outputMode="append",
        timeMode="eventTime",
    )
