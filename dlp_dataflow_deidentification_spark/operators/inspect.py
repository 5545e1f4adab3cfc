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
    findings_order: str = "position",
) -> DataFrame:
    """Native findings table: one row per (input row, column, detector, match).

    Columns: *id_columns, field_id, info_type_name, likelihood, quote.
    Pure regexp_extract_all + explode → no Python, no shuffle.

    InspectConfig fidelity (inspect-template.json:8-32,
    beam/DLPInspectText.java:269-270,306-309): ``min_likelihood`` drops
    detectors below the floor, ``include_quote=False`` nulls the quote (the
    match text is never shipped to the sink), ``max_findings_per_item``
    caps findings per input row (DLP limits.maxFindingsPerItem analogue).

    ``findings_order`` picks which findings survive the cap:
    ``"position"`` (default — DLP behavior) keeps the first N in document
    order, total order (column_idx, start_offset, detector_idx); match
    offsets are derived natively from cumulative segment/match lengths of
    ``split``/``regexp_extract_all`` — still one source scan, zero Python,
    no shuffle. ``"detector"`` keeps the first N in (column,
    detector-config-order, match-position) order — cheaper (no offset
    bookkeeping) and the engine's pre-round-4 rule.
    """
    if findings_order not in ("position", "detector"):
        raise ValueError(
            f"findings_order must be 'position' or 'detector', got {findings_order!r}"
        )
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

    if not dets or not text_columns:
        # everything filtered out (or nothing to scan) → empty findings,
        # stable schema. where(False), not limit(0): limit is unsupported
        # on streaming DataFrames and would crash streaming inspect jobs
        return df.select(
            *[F.col(c) for c in id_columns],
            F.lit(None).cast("string").alias("field_id"),
            F.lit(None).cast("string").alias("info_type_name"),
            F.lit(None).cast("string").alias("likelihood"),
            F.lit(None).cast("string").alias("quote"),
        ).where(F.lit(False))

    if max_findings_per_item is not None and findings_order == "position":
        return _inspect_position_capped(
            df, dets, text_columns, id_columns, include_quote, max_findings_per_item
        )

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


def _inspect_position_capped(
    df: DataFrame,
    dets: list,
    text_columns: Sequence[str],
    id_columns: Sequence[str],
    include_quote: bool,
    cap: int,
) -> DataFrame:
    """Position-ordered ``max_findings_per_item``: per row, every (column,
    detector) pair's matches are tagged with their codepoint start offset
    (cumulative lengths of the split segments + preceding matches — the
    same derivation the DuckDB oracle and ``inspect_offsets`` use), the
    combined array is ``array_sort``-ed on (column_idx, offset,
    detector_idx) and sliced to the cap.

    FAST PATH: a row whose TOTAL finding count is <= cap emits every finding
    untruncated — its survivor set is order-independent, so no offsets are
    needed at all. Only over-cap rows (the minority in real corpora) take
    the conditional branch that re-splits the text for segment lengths; the
    CASE WHEN evaluates branches lazily per row, so the splits/folds are
    never executed for in-cap rows.

    Plan-shape note (measured HOF-capture trap, operators/dedup.py): the
    match arrays are materialized as their own projection (and multi-
    referenced, so CollapseProject keeps them un-inlined); every reference
    in the tagging stage is a WHOLE-ARRAY input to one higher-order
    function — never captured inside a per-element lambda — so regexp/split
    subtrees are evaluated at most once per row. The per-element work
    touches only the accumulator and the zipped element."""
    proj = [F.col(c) for c in id_columns]
    for ci, col in enumerate(text_columns):
        txt = F.coalesce(F.col(col), F.lit(""))
        # keep the coalesced text for the lazy split branch
        proj.append(txt.alias(f"__t_{ci}"))
        for di, it in enumerate(dets):
            proj.append(
                F.regexp_extract_all(txt, F.lit(it.pattern), F.lit(0)).alias(
                    f"__m_{ci}_{di}"
                )
            )
    stage1 = df.select(*proj)

    def _tagged(ci: int, col: str, di: int, it) -> "F.Column":
        m = F.col(f"__m_{ci}_{di}")
        # split lives INSIDE the over-cap branch: whole-array input to one
        # zip_with → evaluated once per row, and only for rows that need it
        s = F.split(F.col(f"__t_{ci}"), it.pattern, -1)
        # (len(segment-before-match), len(match)) pairs; n segments for n
        # matches — ints only, the strings are not carried into the fold
        lens = F.zip_with(
            F.slice(s, 1, F.size(m)),
            m,
            lambda seg, q: F.struct(
                F.length(seg).alias("sl"), F.length(q).alias("ql")
            ),
        )
        # one left-to-right fold per row, accumulating ONLY the int start
        # offsets (start_i = running_total + len(seg_i)). The growing-array
        # concat is inherently O(m²) in element copies, but on a primitive
        # int array that is a cheap memcpy of 4-byte slots — the previous
        # form carried the full tagged STRUCTS (five strings each) through
        # every step, re-copying all quotes/names O(m²) times.
        starts = F.aggregate(
            lens,
            F.struct(
                F.lit(0).alias("cur"), F.array().cast("array<int>").alias("arr")
            ),
            lambda acc, x: F.struct(
                (acc["cur"] + x["sl"] + x["ql"]).alias("cur"),
                F.concat(acc["arr"], F.array(acc["cur"] + x["sl"])).alias("arr"),
            ),
            lambda acc: acc["arr"],
        )
        # one LINEAR pass attaches the heavy struct per match at its offset
        return F.zip_with(
            starts,
            m,
            lambda p, q: F.struct(
                F.lit(ci).alias("_col"),
                p.alias("_pos"),
                F.lit(di).alias("_det"),
                F.lit(col).alias("field_id"),
                F.lit(it.name).alias("info_type_name"),
                F.lit(it.likelihood).alias("likelihood"),
                (q if include_quote else F.lit(None).cast("string")).alias("quote"),
            ),
        )

    def _plain(ci: int, col: str, di: int, it) -> "F.Column":
        # untruncated tag (fast path): no positions, just the output fields
        m = F.col(f"__m_{ci}_{di}")
        return F.transform(
            m,
            lambda q: F.struct(
                F.lit(col).alias("field_id"),
                F.lit(it.name).alias("info_type_name"),
                F.lit(it.likelihood).alias("likelihood"),
                (q if include_quote else F.lit(None).cast("string")).alias("quote"),
            ),
        )

    pairs = [
        (ci, col, di, it)
        for ci, col in enumerate(text_columns)
        for di, it in enumerate(dets)
    ]
    total = None
    for ci, _col, di, _it in pairs:
        sz = F.size(F.col(f"__m_{ci}_{di}"))
        total = sz if total is None else total + sz

    # default struct comparator = lexicographic on fields in order:
    # (_col, _pos, _det) is a total order (a detector cannot match twice at
    # one offset), so the string fields never tie-break
    sorted_slice = F.slice(
        F.array_sort(F.flatten(F.array(*[_tagged(*p) for p in pairs]))), 1, cap
    )
    stripped = F.transform(
        sorted_slice,
        lambda f: F.struct(
            f["field_id"].alias("field_id"),
            f["info_type_name"].alias("info_type_name"),
            f["likelihood"].alias("likelihood"),
            f["quote"].alias("quote"),
        ),
    )
    simple = F.flatten(F.array(*[_plain(*p) for p in pairs]))
    final = F.when(total <= F.lit(cap), simple).otherwise(stripped)
    return stage1.select(
        *[F.col(c) for c in id_columns], F.explode(final).alias("f")
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
    findings_order: str = "position",
) -> DataFrame:
    """Findings with codepoint offsets (dlpInspectionSchema parity,
    Util.java:162-173). Arrow-batched pandas UDF: regex scanning is C-backed
    (`re`), one UDF call per Arrow batch, then a JVM-side explode. One array
    per input row covering ALL text columns (single source scan; the
    ``max_findings_per_item`` cap therefore applies per row, like DLP's
    limits.maxFindingsPerItem). ``findings_order`` as in ``inspect``:
    ``"position"`` (default, DLP rule) caps in (column_idx, start_offset,
    detector_idx) order; ``"detector"`` in detector-config order."""
    if findings_order not in ("position", "detector"):
        raise ValueError(
            f"findings_order must be 'position' or 'detector', got {findings_order!r}"
        )
    resolved = _filter_min_likelihood([resolve(d) for d in detectors], min_likelihood)
    dets = [(it.name, it.likelihood, re.compile(it.pattern)) for it in resolved]
    cap = max_findings_per_item
    by_position = findings_order == "position"

    @F.pandas_udf(ArrayType(_FINDING))
    def _scan(*cols: pd.Series) -> pd.Series:
        def one(texts):
            out = []
            for ci, (fid, text) in enumerate(zip(text_columns, texts)):
                if text is None:
                    continue
                out.extend(
                    (
                        (ci, m.start(), di),
                        (fid, name, lk, m.group(0) if include_quote else None, m.start(), m.end()),
                    )
                    for di, (name, lk, rx) in enumerate(dets)
                    for m in rx.finditer(text)
                )
            if by_position and cap is not None:
                out.sort(key=lambda e: e[0])
            vals = [e[1] for e in out]
            return vals[:cap] if cap is not None else vals

        return pd.Series([one(texts) for texts in zip(*cols)])

    if not dets or not text_columns:
        # where(False), not limit(0): streaming-safe empty frame (see inspect)
        return df.select(
            *[F.col(c) for c in id_columns],
            *[F.lit(None).cast(f.dataType).alias(f.name) for f in _FINDING.fields],
        ).where(F.lit(False))
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
