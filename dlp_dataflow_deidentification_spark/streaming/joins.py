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
    cond = (
        (F.col("conv_id") == F.col("tool_conv_id"))
        & (F.col("tool_ts") >= F.col("agent_ts"))
        & (F.col("tool_ts") <= F.col("agent_ts") + F.expr(f"INTERVAL {max_lag_seconds} SECONDS"))
    )
    return agents.join(tools, cond, "inner").select(
        "conv_id",
        "agent_turn_idx",
        "tool_turn_idx",
        "tool_name",
        (F.col("tool_ts").cast("long") - F.col("agent_ts").cast("long")).alias("lag_seconds"),
    )
