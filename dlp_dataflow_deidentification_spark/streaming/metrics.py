"""Streaming metrics capture.

The reference publishes Beam Counters/Distributions
(numberOfRowsRead/numberOfRowsDeidentified etc.,
beam/BatchRequestForDLP.java:37-40, DLPTextToBigQueryStreaming.java:683-686)
scraped post-hoc by fetchJobMetrics.py. Spark-first equivalent: a
StreamingQueryListener aggregating per-micro-batch progress (rows/sec,
durations, state-store metrics) — plus the sink's lineage ledger for
per-batch row counts.
"""
from __future__ import annotations

import json
import statistics
from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class BatchStats:
    batch_id: int
    num_input_rows: int
    batch_duration_ms: float
    processed_rows_per_second: float
    observed: dict | None = None  # named observe() metrics (rows_read, ...)


class ProgressCapture(StreamingQueryListener):
    """Collects per-batch progress for throughput / p50-latency reporting."""

    def __init__(self) -> None:
        self.batches: list[BatchStats] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = json.loads(event.progress.json)
        self.batches.append(
            BatchStats(
                batch_id=p.get("batchId", -1),
                num_input_rows=p.get("numInputRows", 0),
                batch_duration_ms=p.get("batchDuration", 0),
                processed_rows_per_second=p.get("processedRowsPerSecond", 0.0),
                observed=p.get("observedMetrics") or None,
            )
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    # -- summaries -----------------------------------------------------------
    def total_rows(self) -> int:
        return sum(b.num_input_rows for b in self.batches)

    def p50_batch_ms(self) -> float:
        ds = [b.batch_duration_ms for b in self.batches if b.num_input_rows > 0]
        return statistics.median(ds) if ds else 0.0

    def throughput_rows_per_sec(self) -> float:
        total_ms = sum(b.batch_duration_ms for b in self.batches if b.num_input_rows > 0)
        return self.total_rows() / (total_ms / 1000.0) if total_ms else 0.0
