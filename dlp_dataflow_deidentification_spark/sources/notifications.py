"""Event-bus file discovery (S3): read files named by a notification stream.

The reference subscribes to storage notifications and reads each named file
as it is announced (common/ReadNewFilesPubSubTransform.java:62-75: PubSub
message → FileIO.readMatches on the (bucket, object) in the message
attributes). The Spark-first analogue: the notification topic is itself a
streaming source (a JSONL directory here; a Kafka topic in production — same
DataFrame either way), and file contents are fetched per notification row by
an Arrow-batched reader — so files arriving out-of-band (late re-uploads,
cross-bucket drops) are processed without rescanning any directory listing.

For the common case (files land under one prefix) prefer the native file
source (`jobs.read_transcript_stream` — catalog-diff discovery, S1/S2); this
operator covers the reference's event-driven path where the set of paths is
only knowable from the bus.
"""
from __future__ import annotations

import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .files import sanitize_key

NOTIF_SCHEMA = "path string, event_time timestamp"


def read_notifications_stream(spark: SparkSession, notif_dir: str) -> DataFrame:
    """The notification topic as a stream: JSONL rows {path, event_time}.
    Swap for ``readStream.format("kafka")`` + from_json in production —
    everything downstream is source-agnostic."""
    return spark.readStream.schema(NOTIF_SCHEMA).json(notif_dir)


def fetch_lines(notifications: DataFrame, encoding: str = "utf-8") -> DataFrame:
    """notification rows → (source_key, line_no, line) text records.

    mapInPandas fetch: one Python call per Arrow batch of notifications,
    file I/O inside (the per-file work the reference does in
    FileIO.readMatches). Missing/unreadable files (absent path, bad
    encoding, null path) become rows in the error side-channel (``error``
    column non-null) instead of failing the batch — the reference's
    dead-letter behavior. Line splitting matches Spark's text source
    (\\n / \\r\\n only — NOT str.splitlines(), which also splits on
    \\u2028/\\x0b/... and would diverge from the files.py leg on the same
    bytes). Each file is read whole into the Python worker — the notified
    objects are expected to be event-sized; route multi-GB files through
    the native ``files.read_files`` leg instead."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"path": [], "source_key": [], "line_no": [], "line": [], "error": []}
            for path in pdf["path"]:
                key = sanitize_key(os.path.basename(str(path)))
                try:
                    if path is None:
                        raise ValueError("null path in notification")
                    with open(path, encoding=encoding) as f:
                        content = f.read().replace("\r\n", "\n")
                        if content.endswith("\n"):
                            content = content[:-1]
                        lines = content.split("\n") if content else []
                        for i, line in enumerate(lines):
                            out["path"].append(path)
                            out["source_key"].append(key)
                            out["line_no"].append(i)
                            out["line"].append(line)
                            out["error"].append(None)
                except (OSError, ValueError, TypeError) as e:
                    # ValueError covers UnicodeDecodeError (bad encoding);
                    # TypeError covers non-string path values — all are the
                    # same dead-letter contract as a missing file
                    out["path"].append(path)
                    out["source_key"].append(key)
                    out["line_no"].append(-1)
                    out["line"].append(None)
                    out["error"].append(str(e))
            yield pd.DataFrame(out)

    return notifications.mapInPandas(
        run, "path string, source_key string, line_no int, line string, error string"
    )


def notified_text_stream(spark: SparkSession, notif_dir: str) -> DataFrame:
    """End-to-end S3 path: notification stream → per-file line records
    (successes only; filter ``error is not null`` for the dead-letter leg)."""
    return fetch_lines(read_notifications_stream(spark, notif_dir))
