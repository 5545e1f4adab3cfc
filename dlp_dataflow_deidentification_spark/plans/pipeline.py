"""Config-driven end-to-end pipelines — the engine's
``DLPTextToBigQueryStreamingV2`` (reference: main() + run()/runReidPipeline,
DLPTextToBigQueryStreamingV2.java:82-371; options
DLPTextToBigQueryStreamingV2PipelineOptions.java).

One declarative spec replaces the reference's pipeline-options surface:

    spec = {
      "source": {"path": ..., "format": "csv|tsv|txt|jsonl|avro|parquet|orc",
                  "headers": [...], "streaming": false},
      "mode": "inspect" | "deid" | "reid",
      "template": <path or dict>,            # deid/inspect template
      "reid_columns": [...],                 # reid mode
      "text_columns": [...],                 # inspect mode
      "sink": {"path": ..., "format": "parquet|csv|text",
                "partition_by_source": true},
      "error_path": ...,                     # malformed-record side output
      "num_shards": 0,                       # conv-id salt (hot keys)
    }

Batch and streaming share the same transform graph; streaming adds the
exactly-once ledger sink and a checkpoint (streaming/jobs.py).
"""
from __future__ import annotations

import time
from typing import Any

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..operators.deidentify import deidentify, reidentify
from ..operators.inspect import inspect
from ..operators.skew import salted_repartition
from ..sources import files
from .config import DeidTemplate, InspectConfig


def _maybe_inspect_config(template: "str | dict") -> "InspectConfig | None":
    """Return the compiled InspectConfig when the template is a DLP inspect
    template (has inspectConfig — inspect-template.json:8-32); None for
    deid templates. Envelope/comment handling via the shared loader."""
    from .config import load_template_doc

    doc = load_template_doc(template)
    if "inspectConfig" in doc:
        return InspectConfig.from_dict(doc)
    return None

ERROR_SCHEMA_COLS = ("file_name", "transaction_timestamp", "error_message", "stack_trace")


def load_template(
    template: "str | dict",
    crypto_key: "str | None",
    deterministic_mode: str = "siv",
) -> DeidTemplate:
    # no default key: templates using crypto transforms raise from the
    # compiler unless the caller supplies one (plans/config._require_key)
    if isinstance(template, str):
        return DeidTemplate.from_file(
            template, crypto_key=crypto_key, deterministic_mode=deterministic_mode
        )
    return DeidTemplate.from_dict(
        template, crypto_key=crypto_key, deterministic_mode=deterministic_mode
    )


def split_malformed(df: DataFrame, required: list[str]) -> tuple[DataFrame, DataFrame]:
    """Route rows with null required cells to an error table (the reference
    drops malformed-arity CSV rows with a warning,
    beam/ConvertCSVRecordToDLPRow.java:61-77, and appends API failures to an
    error_log table, common/DLPTransform.java:330-343 / Util.java:175-181).
    In Spark, malformed CSV/JSON rows surface as nulls under PERMISSIVE mode."""
    cond = None
    for c in required:
        this = F.col(c).isNull()
        cond = this if cond is None else (cond | this)
    bad = df.filter(cond)
    good = df.filter(~cond)
    src = (
        F.col(files.SOURCE_KEY_COL)
        if files.SOURCE_KEY_COL in df.columns
        else F.lit("unknown")
    )
    errors = bad.select(
        src.alias("file_name"),
        F.date_format(F.current_timestamp(), "yyyy-MM-dd HH:mm:ss").alias(
            "transaction_timestamp"
        ),
        F.lit("malformed record: required field null").alias("error_message"),
        F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("stack_trace"),
    )
    return good, errors


def run_batch(spark: SparkSession, spec: dict[str, Any], crypto_key: "str | None" = None) -> dict:
    """Execute a batch pipeline spec; returns row-count metrics (the
    reference's numberOfRowsRead / numberOfRowsDeidentified counters).

    ``crypto_key`` has NO default value on purpose: specs whose template
    tokenizes/hashes (or mode="reid") fail loudly without an explicit key."""
    src = spec["source"]
    df = files.read_files(
        spark,
        src["path"],
        src["format"],
        headers=src.get("headers"),
        delimiter=src.get("delimiter"),
    )
    metrics: dict[str, int] = {}

    required = spec.get("required_columns") or []
    if required:
        df, errors = split_malformed(df, required)
        if spec.get("error_path"):
            # count THIS run's errors via observe() during the write —
            # re-reading the append-mode directory would report cumulative
            # historical rows on reruns
            err_obs = Observation()
            errors = errors.observe(err_obs, F.count(F.lit(1)).alias("n"))
            errors.write.mode("append").parquet(spec["error_path"])
            metrics["rows_error"] = int(err_obs.get["n"])

    mode = spec.get("mode", "deid")
    # ONE shared cipher default for the whole spec surface: a deid spec and a
    # reid spec that both omit crypto_mode round-trip (both SIV, the template
    # compiler's default). ECB-decrypting an SIV token can "succeed" and emit
    # garbage, so asymmetric defaults would corrupt silently.
    # MIGRATION NOTE: token stores minted by an explicit crypto_mode="ecb"
    # deid spec must pass crypto_mode="ecb" on the reid side too — the reid
    # default is now "siv", and SIV-decrypting ECB tokens fails per token
    # (strict) or NULLs/dead-letters every row (tolerant).
    crypto_mode = spec.get("crypto_mode", "siv")
    if mode == "deid":
        out = deidentify(
            df,
            load_template(spec["template"], crypto_key, crypto_mode),
        )
    elif mode == "reid":
        if not crypto_key:
            raise ValueError("mode='reid' requires an explicit crypto_key")
        # full reid surface: surrogate_info_type strips the template's
        # "NAME(len):" envelope (without it, enveloped tokens are
        # undecryptable); strict=False routes corrupt tokens to NULL
        out = reidentify(
            df,
            spec["reid_columns"],
            crypto_key,
            surrogate_info_type=spec.get("surrogate_info_type"),
            strict=spec.get("strict", True),
            mode=crypto_mode,
        )
    elif mode == "inspect":
        ids = [files.SOURCE_KEY_COL] if files.SOURCE_KEY_COL in df.columns else []
        icfg = _maybe_inspect_config(spec["template"])
        if icfg is not None:
            out = inspect(
                df,
                icfg.detectors,
                spec["text_columns"],
                id_columns=ids,
                min_likelihood=icfg.min_likelihood,
                include_quote=icfg.include_quote,
                max_findings_per_item=icfg.max_findings_per_item,
            )
        else:  # a deid template: inspect with its referenced detectors
            # honor the spec's crypto_mode here too: inspection only needs
            # the detector list, but compiling with the wrong cipher mode
            # can raise (e.g. SIV default without the cryptography wheel)
            template = load_template(spec["template"], crypto_key, crypto_mode)
            out = inspect(df, template.detectors, spec["text_columns"], id_columns=ids)
    else:
        raise ValueError(f"unknown mode {mode!r}")

    if spec.get("num_shards"):
        out = salted_repartition(out, spec.get("shard_key", files.SOURCE_KEY_COL), spec["num_shards"])

    sink = spec["sink"]
    fmt = sink.get("format", "parquet")
    # numberOfRowsDeidentified analogue: observed on the output DataFrame
    # during the write (Beam Counter semantics — this run only, not the
    # cumulative content of an append-mode sink directory)
    obs = Observation()
    out = out.observe(obs, F.count(F.lit(1)).alias("n"))
    if fmt == "text":
        files.write_text_lines(out, sink["path"], delimiter=sink.get("delimiter", ","))
    elif sink.get("partition_by_source") and files.SOURCE_KEY_COL in out.columns:
        files.write_partitioned_by_key(out, sink["path"], fmt)
    else:
        out.write.mode("append").format(fmt).save(sink["path"])
    metrics["rows_written"] = int(obs.get["n"])
    return metrics
