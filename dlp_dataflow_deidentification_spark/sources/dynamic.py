"""Per-file dynamic schema discovery for mixed-schema file streams.

The reference's flagship streaming trick: every incoming CSV's header is
extracted and merged into a side-input map
(common/ExtractColumnNamesTransform.java:75-117), duplicate table keys are
resolved keep-one (common/ResolveDuplicatesCombineFn.java:21-43), and each
file's rows are routed to their OWN table with their OWN columns
(BigQueryDynamicWriteTransform) — one pipeline ingests arbitrarily many
differently-shaped files.

Spark's file stream source requires a single user-supplied schema, so a
naive port would need N pipelines for N shapes. Instead the stream leg is
used purely for exactly-once FILE DISCOVERY (the source catalog in the
checkpoint tracks which files each micro-batch saw — the
ReadNewFiles ∪ ReadExistingFiles semantics), and ``foreachBatch`` re-reads
just that batch's files with the native CSV reader, each table key under its
own schema:

* table key   = sanitized filename stem (SanitizeFileNameDoFn, files.py);
* key schema  = header of the FIRST file seen for the key (keep-one merge),
  persisted as ``<output>/<key>/_schema.json`` so the resolution survives
  restarts — the durable analogue of the reference's side-input map;
* later files of the same key parse under that schema (extra/reordered
  columns degrade per PERMISSIVE mode, exactly the keep-one contract);
* each key's rows commit through its own IdempotentBatchSink under the SAME
  batch id, so replays stay exactly-once per destination.

Input contract (standard Spark file-source semantics): files must be placed
ATOMICALLY (write elsewhere + rename into the directory). A zero-byte
placeholder later filled in-place is marked consumed by the source catalog
at discovery and its later content is never re-read — as with every Spark
file stream.

Scale shape: the per-batch driver work is one ``collect()`` of distinct file
NAMES (bounded by maxFilesPerTrigger, never row data); row data flows
executor-side through the native CSV scan → parquet write.
"""
from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from ..streaming.sink import IdempotentBatchSink
from .files import sanitize_key


@dataclass
class DynamicSchemaCsvStream:
    """One streaming pipeline over a directory of mixed-schema CSVs, routing
    each table key to its own correctly-shaped output (per-key parquet)."""

    spark: SparkSession
    input_dir: str
    output_dir: str
    checkpoint_dir: str
    delimiter: str = ","
    max_files_per_trigger: "int | None" = None
    # keep-one schema map (key -> list[str]); disk ledger is authoritative
    _schemas: dict = field(default_factory=dict)

    # -- keep-one schema resolution ----------------------------------------
    def _schema_path(self, key: str) -> str:
        return os.path.join(self.output_dir, key, "_schema.json")

    def columns_for(self, key: str, first_path: str) -> list[str]:
        """Columns for a table key: first the in-memory map, then the durable
        per-key ledger, else the header of ``first_path`` (which becomes the
        key's schema forever — ResolveDuplicatesCombineFn keep-one)."""
        if key in self._schemas:
            return self._schemas[key]
        p = self._schema_path(key)
        if os.path.exists(p):
            with open(p) as f:
                cols = json.load(f)["columns"]
        else:
            cols = (
                self.spark.read.option("header", "true")
                .option("sep", self.delimiter)
                .option("inferSchema", "false")
                .csv(first_path)
                .columns
            )
            os.makedirs(os.path.dirname(p), exist_ok=True)
            tmp = p + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"columns": cols, "source": os.path.basename(first_path)}, f)
            os.rename(tmp, p)
        self._schemas[key] = cols
        return cols

    # -- per-batch routing ---------------------------------------------------
    def _process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        # tiny driver-side list of file NAMES (≤ maxFilesPerTrigger), not rows
        files = sorted(r.f for r in batch_df.select("f").distinct().collect())
        by_key: dict[str, list[str]] = {}
        for p in files:
            by_key.setdefault(sanitize_key(p), []).append(p)
        for key, paths in sorted(by_key.items()):
            cols = self.columns_for(key, paths[0])
            schema = StructType([StructField(c, StringType()) for c in cols])
            df = (
                self.spark.read.option("header", "true")
                .option("sep", self.delimiter)
                .option("inferSchema", "false")
                .schema(schema)
                .csv(paths)
                .withColumn("source_key", F.lit(key))
            )
            IdempotentBatchSink(os.path.join(self.output_dir, key))(df, batch_id)

    def start(self, trigger: dict | None = None):
        """Discovery stream: readStream.text gives exactly-once new-file
        tracking via the source catalog; only file names reach the driver."""
        reader = self.spark.readStream.option("recursiveFileLookup", "true")
        if self.max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", self.max_files_per_trigger)
        names = reader.text(self.input_dir).select(
            F.input_file_name().alias("f")
        )
        writer = (
            names.writeStream.foreachBatch(self._process_batch)
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

    def read_table(self, key: str) -> DataFrame:
        """Committed rows of one table key (sans the sink's batch_id
        partition column)."""
        return (
            IdempotentBatchSink(os.path.join(self.output_dir, key))
            .read_committed(self.spark)
            .drop("batch_id")
        )
