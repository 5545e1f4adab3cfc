"""INSPECT operator: find PII, emit a findings table.

Re-implements the reference's inspect path
(/root/reference/src/main/java/com/google/swarm/tokenization/beam/DLPInspectText.java:284-338
and response conversion common/DLPTransform.java:266-345) with the findings
schema mirroring common/Util.java:162-173:

  source_ref, field_id, quote, info_type_name, likelihood
  [, location_start, location_end]   (codepoint offsets)

Two paths:
  * ``inspect``        — JVM-native: explode(regexp_extract_all) per detector,
                          no offsets. Whole-stage codegen; this is the scale
                          path and the one with a full SQL oracle.
  * ``inspect_offsets``— Arrow-batched pandas UDF returning byte-range
                          offsets (Util.java:170-171 location_start/end),
                          for strict findings-schema parity.
"""
from __future__ import annotations

import re
from typing import Iterable, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..functions.infotypes import InfoType, resolve


def inspect(
    df: DataFrame,
    detectors: Iterable["str | InfoType"],
    text_columns: Sequence[str],
    id_columns: Sequence[str] = (),
) -> DataFrame:
    """Native findings table: one row per (input row, column, detector, match).

    Columns: *id_columns, field_id, info_type_name, likelihood, quote.
    Pure regexp_extract_all + explode → no Python, no shuffle.
    """
    dets = [resolve(d) for d in detectors]
    # single-pass plan: per row, one array of finding-structs covering every
    # (column, detector) pair, then one explode — the source is scanned ONCE
    # (the naive per-detector union would re-scan it len(dets)·len(cols) times)
    def _tag(col: str, it: InfoType):
        # single-arg lambda (PySpark HOFs dispatch on arity)
        return lambda q: F.struct(
            F.lit(col).alias("field_id"),
            F.lit(it.name).alias("info_type_name"),
            F.lit(it.likelihood).alias("likelihood"),
            q.alias("quote"),
        )

    per_pair = []
    for col in text_columns:
        for it in dets:
            per_pair.append(
                F.transform(
                    F.regexp_extract_all(F.col(col), F.lit(it.pattern), F.lit(0)),
                    _tag(col, it),
                )
            )
    findings = F.flatten(F.array(*per_pair))
    return df.select(
        *[F.col(c) for c in id_columns], F.explode(findings).alias("f")
    ).select(*id_columns, "f.*")


_FINDING = StructType(
    [
        StructField("field_id", StringType()),
        StructField("info_type_name", StringType()),
        StructField("likelihood", StringType()),
        StructField("quote", StringType()),
        StructField("location_start", IntegerType()),
        StructField("location_end", IntegerType()),
    ]
)


def inspect_offsets(
    df: DataFrame,
    detectors: Iterable["str | InfoType"],
    text_columns: Sequence[str],
    id_columns: Sequence[str] = (),
) -> DataFrame:
    """Findings with codepoint offsets (dlpInspectionSchema parity,
    Util.java:162-173). Arrow-batched pandas UDF: regex scanning is C-backed
    (`re`), one UDF call per Arrow batch, then a JVM-side explode."""
    dets = [(resolve(d).name, resolve(d).likelihood, re.compile(resolve(d).pattern)) for d in detectors]

    @F.pandas_udf(ArrayType(_FINDING))
    def _scan(s: pd.Series, field: pd.Series) -> pd.Series:
        def one(text, fid):
            if text is None:
                return []
            return [
                (fid, name, lk, m.group(0), m.start(), m.end())
                for (name, lk, rx) in dets
                for m in rx.finditer(text)
            ]

        return pd.Series([one(t, f) for t, f in zip(s, field)])

    parts = []
    for col in text_columns:
        parts.append(
            df.select(
                *[F.col(c) for c in id_columns],
                F.explode(_scan(F.col(col), F.lit(col))).alias("f"),
            ).select(*id_columns, "f.*")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def inspection_report(findings: DataFrame, job_name: str, source_col: str) -> DataFrame:
    """Shape findings into the reference's BigQuery inspection schema
    (job_name, source_file, transaction_time, quote, info_type_name,
    likelihood, ... — Util.java:162-173)."""
    return findings.select(
        F.lit(job_name).alias("job_name"),
        F.col(source_col).cast("string").alias("source_file"),
        F.date_format(F.current_timestamp(), "yyyy-MM-dd HH:mm:ss").alias("transaction_time"),
        "quote",
        "info_type_name",
        "likelihood",
        *(
            [F.col("location_start").cast("long").alias("location_start_byte_range"),
             F.col("location_end").cast("long").alias("location_end_byte_range")]
            if "location_start" in findings.columns
            else []
        ),
        F.col("field_id").alias("record_loc_field_id"),
    )
