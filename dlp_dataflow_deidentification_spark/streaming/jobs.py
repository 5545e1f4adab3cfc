"""End-to-end streaming pipelines (the engine's DLPTextToBigQueryStreamingV2).

Spark lifecycle per SURVEY.md §3.1: ``readStream`` (file/Iceberg source with
``maxFilesPerTrigger`` — the FilePollingTransform analogue,
common/FilePollingTransform.java:54-64) → narrow deid projection (the whole
DLP stage fuses into one WholeStageCodegen span; the reference's
shard→bag-state→batch→RPC machinery, beam/ShardRows.java +
beam/BatchRequestForDLP.java, is subsumed by micro-batch execution) →
``foreachBatch`` idempotent exactly-once sink with lineage
(streaming/sink.py) → checkpoint for resume.
"""
from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..operators.deidentify import deidentify
from ..operators.skew import salted_repartition
from ..plans.config import DeidTemplate
from .sink import IdempotentBatchSink

TRANSCRIPT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("role", StringType()),
        StructField("text", StringType()),
        StructField("tool", StringType()),
        StructField("ts", TimestampType()),
    ]
)


def read_transcript_stream(
    spark: SparkSession,
    input_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Unbounded transcript source over a parquet directory: new files are
    discovered per micro-batch (ReadExistingFiles ∪ ReadNewFiles semantics,
    common/ReadExistingFilesTransform.java:57-69 +
    common/ReadNewFilesPubSubTransform.java:62-75 — the file source's catalog
    diff subsumes both). On a cluster this is
    ``spark.readStream.format("iceberg")`` on the transcripts table."""
    reader = spark.readStream.schema(TRANSCRIPT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_dir)


@dataclass
class StreamingDeidJob:
    """Streaming pipeline: source → INSPECT/DEID/REID → exactly-once sink.

    ``mode`` mirrors the reference's DLPMethod switch
    (DLPTextToBigQueryStreamingV2.java:94-108): "deid" (default), "inspect"
    (findings stream), or "reid" (detokenize ``reid_columns``)."""

    spark: SparkSession
    template: DeidTemplate
    input_dir: str
    output_dir: str
    checkpoint_dir: str
    num_shards: int = 0  # >0: salted repartition for hot conv_ids before the sink
    max_files_per_trigger: int | None = None
    mode: str = "deid"
    text_columns: tuple = ("text",)
    reid_columns: tuple = ("text",)
    # no default key on purpose: reid mode raises without an explicit key
    # (a shared hardcoded key would make every deployment's tokens public)
    crypto_key: "str | None" = None
    partition_output_by: str | None = None  # dynamic destinations (per-key)

    def sink(self) -> IdempotentBatchSink:
        return IdempotentBatchSink(self.output_dir, partition_col=self.partition_output_by)

    def transformed(self, df: DataFrame) -> DataFrame:
        # numberOfRowsRead counter analogue (reference:
        # DLPTextToBigQueryStreaming.java:683-686) — per-batch observed metric
        df = df.observe("reader", F.count(F.lit(1)).alias("rows_read"))
        if self.mode == "deid":
            out = deidentify(df, self.template)
        elif self.mode == "inspect":
            from ..operators.inspect import inspect

            out = inspect(
                df,
                self.template.detectors,
                list(self.text_columns),
                id_columns=["conv_id", "turn_idx", "ts"],
            )
        elif self.mode == "reid":
            from ..operators.deidentify import reidentify

            if not self.crypto_key:
                raise ValueError("mode='reid' requires an explicit crypto_key")
            out = reidentify(df, list(self.reid_columns), self.crypto_key)
        else:
            raise ValueError(f"unknown mode {self.mode!r}")
        if self.num_shards:
            out = salted_repartition(out, "conv_id", self.num_shards, "turn_idx")
        return out

    def start(self, trigger: dict | None = None):
        """Start the stream; default trigger availableNow (drain all pending
        input then stop — used by tests/bench; pass
        ``{"processingTime": "3 seconds"}`` for the reference's V2 cadence)."""
        stream = self.transformed(
            read_transcript_stream(self.spark, self.input_dir, self.max_files_per_trigger)
        )
        writer = (
            stream.writeStream.foreachBatch(self.sink())
            .option("checkpointLocation", self.checkpoint_dir)
            .outputMode("append")
        )
        trigger = trigger or {"availableNow": True}
        return writer.trigger(**trigger).start()

    def run_to_completion(self, timeout_sec: int = 600) -> None:
        q = self.start()
        q.awaitTermination(timeout_sec)
        if q.isActive:
            q.stop()
