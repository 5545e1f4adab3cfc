"""Transcript table sources.

The engine's primary input (BASELINE.json input_hint) is a table of multi-turn
conversation transcripts:

    conv_id string, turn_idx int, role string, text string, tool string, ts timestamp

Two deterministic constructions:

* ``transcripts_from_events_sql`` — derives the table from the driver's
  ``events`` parquet via SQL written in the **common dialect** of Spark SQL and
  DuckDB, so the driver's DuckDB oracle computes the *identical* input rows.
  PII snippets are embedded deterministically (modeled on the reference's
  CCRecords AdditionalDetails free text,
  /root/reference/src/test/resources/CCRecords_sample.jsonl) and a hot
  conversation key (~8% of rows) exercises skew handling.

* ``synthesize_transcripts`` — pure ``spark.range`` generator for streaming
  tests and benchmarks at arbitrary scale (no driver tables needed); same
  PII mix, seedless/deterministic.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Common-dialect SQL (valid + value-identical in Spark SQL and DuckDB).
# Avoids: float→int casts (rounding differs), implicit casts, dialect-specific
# functions. Uses only ||, CASE, %, LPAD, CAST AS STRING, ROW_NUMBER.
TRANSCRIPTS_FROM_EVENTS_SQL = """
SELECT
  conv_id,
  CAST(ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY ts, event_id) - 1 AS INT) AS turn_idx,
  CASE WHEN event_type = 'error' THEN 'tool'
       WHEN event_id % 2 = 0 THEN 'agent'
       ELSE 'customer' END AS role,
  'turn about ' || event_type
    || CASE WHEN event_id % 3 = 0
            THEN ' email user' || CAST(user_id AS STRING) || '@example.com'
            ELSE '' END
    || CASE WHEN event_id % 4 = 0
            THEN ' call 415-555-' || LPAD(CAST(event_id % 10000 AS STRING), 4, '0')
            ELSE '' END
    || CASE WHEN event_id % 5 = 0
            THEN ' iban DE44 5001 0517 5407 3249 31 on file'
            ELSE '' END
    || CASE WHEN event_id % 7 = 0
            THEN ' ssn 552-09-' || LPAD(CAST(event_id % 10000 AS STRING), 4, '0')
            ELSE '' END
    || CASE WHEN event_id % 11 = 0
            THEN ' user name:' || LPAD(CAST(event_id AS STRING), 16, '0')
            ELSE '' END
    || CASE WHEN event_id % 6 = 0
            THEN ' card 4111 1111 1111 1111 expires soon'
            ELSE '' END
    || ' ref e' || CAST(event_id AS STRING) AS text,
  CASE WHEN event_type = 'error' THEN 'web_search' ELSE 'N/A' END AS tool,
  ts
FROM (
  SELECT
    CASE WHEN user_id % 13 = 0 THEN 'conv-hot'
         ELSE 'conv-' || LPAD(CAST(user_id % 997 AS STRING), 4, '0') END AS conv_id,
    event_id, ts, user_id, event_type
  FROM events
) keyed
"""


def transcripts_from_events_sql(events_relation: str = "events") -> str:
    """The shared derivation SQL, optionally re-targeted at another relation."""
    return TRANSCRIPTS_FROM_EVENTS_SQL.replace("FROM events", f"FROM {events_relation}")


def load_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive the transcript table from ``{sf_dir}/events.parquet``."""
    spark.read.parquet(f"{sf_dir}/events.parquet").createOrReplaceTempView("events")
    return spark.sql(TRANSCRIPTS_FROM_EVENTS_SQL)


def synthesize_transcripts(
    spark: SparkSession,
    n_turns: int,
    n_conversations: int = 1000,
    hot_fraction_mod: int = 13,
    start_ts: str = "2026-01-01 00:00:00",
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic transcript generator at arbitrary scale.

    Built on ``spark.range`` (parallel, no driver-side data): scales to any
    n_turns; used by the benchmark and the streaming tests. Distributed by
    construction — each range partition generates its slice independently.
    """
    rng = spark.range(0, n_turns, 1, partitions or spark.sparkContext.defaultParallelism)
    i = F.col("id")
    conv_num = F.pmod(F.xxhash64(i), F.lit(n_conversations))
    conv_id = F.when(conv_num % hot_fraction_mod == 0, F.lit("conv-hot")).otherwise(
        F.concat(F.lit("conv-"), F.lpad(conv_num.cast("string"), 6, "0"))
    )
    role = (
        F.when(i % 9 == 0, F.lit("tool"))
        .when(i % 2 == 0, F.lit("agent"))
        .otherwise(F.lit("customer"))
    )
    text = F.concat(
        F.lit("turn "),
        i.cast("string"),
        F.when(i % 3 == 0, F.concat(F.lit(" email user"), (i % 100000).cast("string"), F.lit("@example.com"))).otherwise(F.lit("")),
        F.when(i % 4 == 0, F.concat(F.lit(" call 415-555-"), F.lpad((i % 10000).cast("string"), 4, "0"))).otherwise(F.lit("")),
        F.when(i % 5 == 0, F.lit(" iban DE44 5001 0517 5407 3249 31 on file")).otherwise(F.lit("")),
        F.when(i % 7 == 0, F.concat(F.lit(" ssn 552-09-"), F.lpad((i % 10000).cast("string"), 4, "0"))).otherwise(F.lit("")),
        F.when(i % 11 == 0, F.concat(F.lit(" user name:"), F.lpad(i.cast("string"), 16, "0"))).otherwise(F.lit("")),
        F.when(i % 6 == 0, F.lit(" card 4111 1111 1111 1111 expires soon")).otherwise(F.lit("")),
    )
    # event time: interleaved across conversations, ~1 turn/second globally,
    # with a deterministic 5% out-of-order jitter to exercise watermarks.
    # Offset split into DAY + SECOND components so the int32 quantity that
    # timestamp_add requires never overflows (a flat second offset caps the
    # generator at ~2^31 turns; day-count overflow needs 2^31 days).
    jitter = F.when(i % 20 == 0, F.lit(-30)).otherwise(F.lit(0))
    day_base = F.timestamp_add(
        "DAY", (i / F.lit(86400)).cast("int"), F.lit(start_ts).cast("timestamp")
    )
    ts = F.timestamp_add("SECOND", (F.pmod(i, F.lit(86400)) + jitter).cast("int"), day_base)
    df = rng.select(
        conv_id.alias("conv_id"),
        i.alias("_gid"),
        role.alias("role"),
        text.alias("text"),
        F.when(role == "tool", F.lit("web_search")).otherwise(F.lit("N/A")).alias("tool"),
        ts.alias("ts"),
    )
    from pyspark.sql import Window as W

    turn = F.row_number().over(W.partitionBy("conv_id").orderBy("_gid")) - 1
    return df.withColumn("turn_idx", turn.cast("int")).drop("_gid").select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    )
