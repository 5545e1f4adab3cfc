"""Raw chat-log parsing → transcript rows.

Native re-expression of the reference's transcript sessionizer
(txt/ParseTextLogDoFn.java:41-107 and common/Util.java:455-522): each input
line is ``<id> [Agent]: ... [Customer]: ...`` — one conversation per line —
split into alternating role turns, emitted as
(conv_id, turn_idx, role, text, tool, ts) rows.

Pure JVM plan: regexp split on the role tags + posexplode; no Python. The
reference emits (id_fileIndex_rand, role, text, position, "N/A") to two
tagged outputs (agent/customer); the multi-output becomes two filters on the
single role column.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TAG = r"\[(Agent|Customer)\]:"


def parse_chatlog(
    df: DataFrame,
    line_col: str = "line",
    default_ts: str = "1970-01-01 00:00:00",
) -> DataFrame:
    """lines → transcript rows. conv_id = leading numeric id of the line
    (SanitizeFileName-style key); turn_idx = tag position in the line."""
    line = F.trim(F.col(line_col))
    conv_id = F.regexp_extract(line, r"^(\d+)", 1)
    # roles in order of appearance; texts: split by tags (first chunk = preamble/id)
    roles = F.regexp_extract_all(F.col(line_col), F.lit(_TAG), F.lit(1))
    chunks = F.split(line, _TAG)
    # drop the leading "<id>" chunk; length from F.size so arbitrarily long
    # conversations are never silently truncated
    texts = F.slice(chunks, 2, F.greatest(F.size(chunks) - 1, F.lit(0)))
    turns = F.arrays_zip(roles.alias("role"), texts.alias("text"))
    # materialize conv_id/turns BELOW the explode: in the naive
    # select(conv_id_expr, posexplode(turns)) the analyzer evaluates every
    # non-generator expression in the Project ABOVE the Generate, so the
    # whole-line trim+regex behind conv_id re-ran once per EXPLODED TURN —
    # quadratic in line length (measured 129 s on a 61k-turn 3.7 MB line at
    # sf1.0; linear after this two-step projection, which CollapseProject
    # cannot merge across the Generate)
    pre = df.select(conv_id.alias("conv_id"), turns.alias("__turns"))
    out = (
        pre.select("conv_id", F.posexplode("__turns").alias("turn_idx", "t"))
        .select(
            "conv_id",
            F.col("turn_idx").cast("int"),
            F.lower(F.col("t.role")).alias("role"),
            F.trim(F.col("t.text")).alias("text"),
        )
        .filter(F.col("text") != "")
        .withColumn("tool", F.lit("N/A"))
        .withColumn("ts", F.lit(default_ts).cast("timestamp"))
    )
    return out


def agent_turns(parsed: DataFrame) -> DataFrame:
    """The reference's agent-tagged output (ParseTextLogDoFn outputs twice)."""
    return parsed.filter(F.col("role") == "agent")


def customer_turns(parsed: DataFrame) -> DataFrame:
    return parsed.filter(F.col("role") == "customer")
