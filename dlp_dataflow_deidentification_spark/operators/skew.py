"""Hot-key (conv_id) skew handling.

The reference salts keys with a random shard before stateful batching
(beam/ShardRows.java:66-81, reader-level salt txt/TxtReaderSplitDoFn.java:61,
defaults keyRange=100 / numShardsPerDLPRequestBatching=100 in
DLPTextToBigQueryStreamingV2PipelineOptions.java:60-63,125-131). Spark
equivalent: an explicit deterministic salt column so one hot conversation
spreads over N shuffle partitions; AQE skew-join handles joins, but stateful
ops and repartitions need the manual salt.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def with_salt(df: DataFrame, key: str, num_shards: int = 32, *cols: str) -> DataFrame:
    """Deterministic salt derived from stable row attributes (not rand(): keeps
    retries/replays idempotent, unlike the reference's Random.nextInt)."""
    basis = [F.col(key)] + [F.col(c) for c in cols]
    return df.withColumn(SALT_COL, F.pmod(F.xxhash64(*basis), F.lit(num_shards)).cast("int"))


def salted_repartition(
    df: DataFrame,
    key: str,
    num_shards: int = 32,
    *salt_cols: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Repartition by (key, salt) so a hot key spans up to num_shards
    partitions. Drop the salt afterwards (UnshardRows analogue,
    beam/UnshardRows.java:26-31). The partition count is pinned explicitly —
    an unpinned repartition would let AQE coalesce the salt away on small
    inputs, defeating the spread."""
    n = num_partitions or num_shards
    return (
        with_salt(df, key, num_shards, *salt_cols)
        .repartition(n, F.col(key), F.col(SALT_COL))
        .drop(SALT_COL)
    )
