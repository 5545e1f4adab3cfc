"""Watermarked stream-stream join: agent turns ⋈ tool-call turns.

The reference's nearest analogue is flattening two tagged transcript streams
back together (DLPTextToBigQueryStreamingV2.java:226-233); the north_rule
upgrades this to a true stateful stream-stream inner join on conv_id with an
event-time range bound. State for unmatched rows is bounded by the watermarks
plus the join range (Spark derives the state eviction condition from
``tool_ts BETWEEN agent_ts AND agent_ts + max_lag``).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _agent_tool_sides(
    transcripts: DataFrame, watermark: str
) -> tuple[DataFrame, DataFrame]:
    base = transcripts.withColumn("ts", F.col("ts").cast("timestamp"))
    agents = (
        base.filter(F.col("role") == "agent")
        .select(
            "conv_id",
            F.col("turn_idx").alias("agent_turn_idx"),
            F.col("ts").alias("agent_ts"),
        )
        .withWatermark("agent_ts", watermark)
    )
    tools = (
        base.filter(F.col("role") == "tool")
        .select(
            F.col("conv_id").alias("tool_conv_id"),
            F.col("turn_idx").alias("tool_turn_idx"),
            F.col("tool").alias("tool_name"),
            F.col("ts").alias("tool_ts"),
        )
        .withWatermark("tool_ts", watermark)
    )
    return agents, tools


def _join_cond(max_lag_seconds: int):
    return (
        (F.col("conv_id") == F.col("tool_conv_id"))
        & (F.col("tool_ts") >= F.col("agent_ts"))
        & (F.col("tool_ts") <= F.col("agent_ts") + F.expr(f"INTERVAL {max_lag_seconds} SECONDS"))
    )


def agent_tool_stream_join(
    transcripts: DataFrame,
    max_lag_seconds: int = 120,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Split one transcript stream into agent/tool substreams and join them.

    Works on a streaming OR batch transcript DataFrame; in streaming mode both
    sides carry watermarks so the join state is evicted once
    ``agent_ts + max_lag`` falls behind the tool-side watermark.
    """
    agents, tools = _agent_tool_sides(transcripts, watermark)
    return agents.join(tools, _join_cond(max_lag_seconds), "inner").select(
        "conv_id",
        "agent_turn_idx",
        "tool_turn_idx",
        "tool_name",
        (F.col("tool_ts").cast("long") - F.col("agent_ts").cast("long")).alias("lag_seconds"),
    )


def agent_tool_hourly_stats(
    transcripts: DataFrame,
    max_lag_seconds: int = 120,
    watermark: str = "10 minutes",
    window: str = "1 hour",
) -> DataFrame:
    """CHAINED stateful operators in ONE streaming query (SURVEY §7 "hard
    parts"): stream-stream join → tumbling-window aggregation. Spark ≥3.5
    supports stacking stateful operators when the downstream aggregation
    windows the join's own event-time column (``tool_ts`` here); watermark
    eviction cascades join-state → window-state in the same query run.

    Output: window_start, tool_name, n_calls (correlated agent→tool
    invocations per tool per window). The same plan runs on a batch
    DataFrame for the stream≡batch equality test.
    """
    agents, tools = _agent_tool_sides(transcripts, watermark)
    if transcripts.isStreaming:
        joined = agents.join(tools, _join_cond(max_lag_seconds), "inner")
    else:
        # batch form: (conv_id, time-bucket) equi-join — exactly equivalent
        # to the range join (sessionize.time_bucket_keys proof) but a hot
        # conversation spreads over its time span instead of one quadratic
        # task. The streaming side keeps the plain range join: watermark
        # state eviction is derived from the time-range condition.
        from ..operators.sessionize import time_bucket_keys

        a_buckets, t_bucket = time_bucket_keys("agent_ts", "tool_ts", max_lag_seconds)
        agents_b = agents.withColumn("__bkt", F.explode(a_buckets))
        tools_b = tools.withColumn("__bkt", t_bucket)
        joined = agents_b.join(
            tools_b,
            (agents_b["__bkt"] == tools_b["__bkt"]) & _join_cond(max_lag_seconds),
            "inner",
        )
    joined = joined.select("conv_id", "tool_name", "tool_ts")
    return (
        joined.groupBy(F.window("tool_ts", window).alias("w"), "tool_name")
        .agg(F.count(F.lit(1)).alias("n_calls"))
        .select(F.col("w.start").alias("window_start"), "tool_name", "n_calls")
    )
