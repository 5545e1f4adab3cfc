"""Commit-interface tests: the atomic ledger behind the exactly-once sink
(streaming/commitlog.py) and the executor-side per-partition lineage the
sink records through it (no driver file I/O beyond the single ledger JSON)."""
import json
import os

import pytest

from dlp_dataflow_deidentification_spark.streaming.commitlog import (
    CommitLog,
    IcebergCommitLog,
    LocalFSCommitLog,
    LocalFSSchemaLedger,
)
from dlp_dataflow_deidentification_spark.streaming.sink import IdempotentBatchSink


def test_localfs_commitlog_roundtrip(tmp_path):
    log = LocalFSCommitLog(str(tmp_path / "ledger"))
    assert isinstance(log, CommitLog)
    assert not log.is_committed(0)
    assert log.committed_ids() == []
    log.commit(0, {"batch_id": 0, "metrics": {"n_rows": 3}})
    log.commit(2, {"batch_id": 2, "metrics": {"n_rows": 5}})
    assert log.is_committed(0) and log.is_committed(2) and not log.is_committed(1)
    assert log.committed_ids() == [0, 2]
    assert log.entry(2)["metrics"]["n_rows"] == 5
    # no stray temp files after the atomic rename
    assert not [f for f in os.listdir(tmp_path / "ledger") if f.endswith(".tmp")]


def test_schema_ledger_keep_one(tmp_path):
    led = LocalFSSchemaLedger(str(tmp_path))
    assert led.get("t") is None
    assert led.put_if_absent("t", ["a", "b"], "one.csv") == ["a", "b"]
    # second writer loses: keep-one (ResolveDuplicatesCombineFn contract)
    assert led.put_if_absent("t", ["x"], "two.csv") == ["a", "b"]
    assert led.get("t") == ["a", "b"]
    with open(tmp_path / "t" / "_schema.json") as f:
        assert json.load(f)["source"] == "one.csv"


def test_iceberg_commitlog_is_jar_gated(spark):
    # the sandbox has no Iceberg runtime: constructing the cluster impl must
    # fail loudly with provisioning instructions, not half-work
    with pytest.raises(RuntimeError, match="iceberg"):
        IcebergCommitLog(spark, "cat.db.t")


def test_sink_lineage_is_executor_side_and_reconciles(spark, tmp_path):
    """Per-partition lineage comes from the observe() pass (write-stage
    spark_partition_id buckets): entries must reconcile with n_rows, cover
    multiple partitions for a multi-partition batch, and involve no output
    re-listing (asserted by pointing the data dir at a path the driver
    could not re-list after a rename)."""
    sink = IdempotentBatchSink(str(tmp_path / "out"))
    df = spark.range(0, 1000, 1, 7).selectExpr(
        "cast(id as string) as conv_id",
        "cast(id as int) as turn_idx",
        "current_timestamp() as ts",
    )
    sink(df, 0)
    [entry] = sink.lineage()
    parts = entry["partitions"]
    assert parts and sum(p["rows"] for p in parts) == entry["metrics"]["n_rows"] == 1000
    assert len(parts) == 7  # one bucket per write-stage partition
    assert all(isinstance(p["partition"], int) for p in parts)
    # replay is a no-op (exactly-once) and does not duplicate lineage
    sink(df, 0)
    assert len(sink.lineage()) == 1


def test_sink_lineage_no_driver_listing_of_output(spark, tmp_path, monkeypatch):
    """The lineage pass must not walk the written files on the driver:
    os.walk / pyarrow footer reads under the data dir are forbidden."""
    import pyarrow.parquet as pq

    calls = []
    real_walk = os.walk
    monkeypatch.setattr(
        os, "walk", lambda *a, **k: calls.append(("walk", a)) or real_walk(*a, **k)
    )
    real_md = pq.read_metadata
    monkeypatch.setattr(
        pq,
        "read_metadata",
        lambda *a, **k: calls.append(("footer", a)) or real_md(*a, **k),
    )
    sink = IdempotentBatchSink(str(tmp_path / "out2"))
    df = spark.range(0, 100, 1, 4).selectExpr("cast(id as string) as conv_id")
    sink(df, 0)
    assert calls == []
