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

# canonical constant lives with the streaming jobs; re-exported for callers
from .jobs import ROCKSDB_STATE_PROVIDER as ROCKSDB_PROVIDER  # noqa: E402


class ConversationStatsProcessor(StatefulProcessor):
    """Per-conv_id session assembly in a typed ValueState: rows are
    gap-split ON ARRIVAL (same loop as stateful.py's _sessions — a session
    that closed mid-batch is emitted immediately, not merged into the next
    one), and an event-time timer at last_ms + gap emits the trailing open
    session once the conversation idles."""

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
        pdfs = [pdf for pdf in rows if len(pdf)]
        out: list[tuple] = []
        if pdfs:
            batch = pd.concat(pdfs, ignore_index=True).sort_values(
                "ts", kind="mergesort"
            )
            ms = (batch["ts"].astype("int64") // 1_000_000).to_numpy()
            pii = batch["text"].str.contains(
                r"\[[A-Z_]+\]", regex=True, na=False
            ).to_numpy()
            for i in range(len(batch)):
                if n and int(ms[i]) - last_ms >= self.gap_ms:
                    # gap inside the arrived rows → close and EMIT the
                    # session now (accumulating across the gap would merge
                    # two sessions whenever rows arrive before the timer)
                    out.append((key[0], n, npii, first_ms, last_ms))
                    n, npii = 0, 0
                n += 1
                npii += int(pii[i])
                first_ms = int(ms[i]) if n == 1 else min(first_ms, int(ms[i]))
                # n==1 seeding (matching first_ms): max() against the 0
                # initializer would pin pre-1970 negative-ms sessions to 0
                last_ms = int(ms[i]) if n == 1 else max(last_ms, int(ms[i]))
        self.state.update((n, npii, first_ms, last_ms))
        # delete any timer registered for an earlier last_ms: a stale timer
        # would fire at old_last+gap and prematurely split a still-active
        # conversation (Beam's single-timer-per-key semantics rearm on set;
        # transformWithState timers accumulate unless deleted)
        for t in self.handle.listTimers():
            self.handle.deleteTimer(t)
        # clamp to just past the current watermark (same catch-up rule as
        # the applyInPandasWithState twin, streaming/stateful.py): during
        # multi-batch catch-up the watermark can already be beyond this
        # key's event times, and a past-due session should flush at the
        # next tick rather than register a pre-watermark timer
        wm = timerValues.getCurrentWatermarkInMs()
        self.handle.registerTimer(max(last_ms + self.gap_ms, wm + 1))
        if out:
            return iter(
                [
                    pd.DataFrame(
                        out,
                        columns=[
                            "conv_id",
                            "n_turns",
                            "n_pii_turns",
                            "first_ms",
                            "last_ms",
                        ],
                    )
                ]
            )
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
