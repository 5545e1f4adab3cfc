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

# Cloud DLP likelihood scale (google.privacy.dlp.v2.Likelihood); the
# reference forwards minLikelihood from the inspect template
# (beam/DLPInspectText.java:269-270, inspect-template.json:8-12).
LIKELIHOODS = (
    "LIKELIHOOD_UNSPECIFIED",
    "VERY_UNLIKELY",
    "UNLIKELY",
    "POSSIBLE",
    "LIKELY",
    "VERY_LIKELY",
)


def _likelihood_rank(name: str) -> int:
    try:
        return LIKELIHOODS.index(name)
    except ValueError:
        raise ValueError(f"unknown likelihood {name!r}; one of {LIKELIHOODS}") from None


def _filter_min_likelihood(dets: list, min_likelihood: "str | None") -> list:
    """Detector likelihood is a per-detector constant in this engine, so the
    service-side minLikelihood finding filter is equivalent to pruning the
    detector list at plan time (zero runtime cost)."""
    if not min_likelihood:
        return dets
    floor = _likelihood_rank(min_likelihood)
    return [d for d in dets if _likelihood_rank(d.likelihood) >= floor]


def inspect(
    df: DataFrame,
    detectors: Iterable["str | InfoType"],
    text_columns: Sequence[str],
    id_columns: Sequence[str] = (),
    min_likelihood: "str | None" = None,
    include_quote: bool = True,
    max_findings_per_item: "int | None" = None,
) -> DataFrame:
    """Native findings table: one row per (input row, column, detector, match).

    Columns: *id_columns, field_id, info_type_name, likelihood, quote.
    Pure regexp_extract_all + explode → no Python, no shuffle.

    InspectConfig fidelity (inspect-template.json:8-32,
    beam/DLPInspectText.java:269-270,306-309): ``min_likelihood`` drops
    detectors below the floor, ``include_quote=False`` nulls the quote (the
    match text is never shipped to the sink), ``max_findings_per_item``
    caps findings per input row (DLP limits.maxFindingsPerItem analogue).
    """
    dets = _filter_min_likelihood([resolve(d) for d in detectors], min_likelihood)

    # single-pass plan: per row, one array of finding-structs covering every
    # (column, detector) pair, then one explode — the source is scanned ONCE
    # (the naive per-detector union would re-scan it len(dets)·len(cols) times)
    def _tag(col: str, it: InfoType):
        # single-arg lambda (PySpark HOFs dispatch on arity)
        return lambda q: F.struct(
            F.lit(col).alias("field_id"),
            F.lit(it.name).alias("info_type_name"),
            F.lit(it.likelihood).alias("likelihood"),
            (q if include_quote else F.lit(None).cast("string")).alias("quote"),
        )

    if not dets:  # everything filtered out → empty findings, stable schema
        return df.select(
            *[F.col(c) for c in id_columns],
            F.lit(None).cast("string").alias("field_id"),
            F.lit(None).cast("string").alias("info_type_name"),
            F.lit(None).cast("string").alias("likelihood"),
            F.lit(None).cast("string").alias("quote"),
        ).limit(0)

    per_pair = []
    for col in text_columns:
        for it in dets:
            per_pair.append(
                F.transform(
                    # coalesce: a NULL cell contributes an empty array —
                    # without it flatten() would NULL the whole row's
                    # findings, dropping matches from non-null columns
                    F.regexp_extract_all(
                        F.coalesce(F.col(col), F.lit("")), F.lit(it.pattern), F.lit(0)
                    ),
                    _tag(col, it),
                )
            )
    findings = F.flatten(F.array(*per_pair))
    if max_findings_per_item is not None:
        findings = F.slice(findings, 1, max_findings_per_item)
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
    min_likelihood: "str | None" = None,
    include_quote: bool = True,
    max_findings_per_item: "int | None" = None,
) -> DataFrame:
    """Findings with codepoint offsets (dlpInspectionSchema parity,
    Util.java:162-173). Arrow-batched pandas UDF: regex scanning is C-backed
    (`re`), one UDF call per Arrow batch, then a JVM-side explode. One array
    per input row covering ALL text columns (single source scan; the
    ``max_findings_per_item`` cap therefore applies per row, like DLP's
    limits.maxFindingsPerItem)."""
    resolved = _filter_min_likelihood([resolve(d) for d in detectors], min_likelihood)
    dets = [(it.name, it.likelihood, re.compile(it.pattern)) for it in resolved]
    cap = max_findings_per_item

    @F.pandas_udf(ArrayType(_FINDING))
    def _scan(*cols: pd.Series) -> pd.Series:
        def one(texts):
            out = []
            for fid, text in zip(text_columns, texts):
                if text is None:
                    continue
                out.extend(
                    (fid, name, lk, m.group(0) if include_quote else None, m.start(), m.end())
                    for (name, lk, rx) in dets
                    for m in rx.finditer(text)
                )
            return out[:cap] if cap is not None else out

        return pd.Series([one(texts) for texts in zip(*cols)])

    if not dets:
        return df.select(
            *[F.col(c) for c in id_columns],
            *[F.lit(None).cast(f.dataType).alias(f.name) for f in _FINDING.fields],
        ).limit(0)
    return df.select(
        *[F.col(c) for c in id_columns],
        F.explode(_scan(*[F.col(c) for c in text_columns])).alias("f"),
    ).select(*id_columns, "f.*")


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
