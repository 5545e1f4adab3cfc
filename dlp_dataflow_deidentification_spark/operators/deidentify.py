"""DEID / REID record operators.

Spark-first re-expression of the reference's DLPTransform DEID/REID paths
(/root/reference/src/main/java/com/google/swarm/tokenization/common/DLPTransform.java:110-181,
remote call beam/DLPDeidentifyText.java:325-382; REID beam/DLPReidentifyText.java:323-381).
The reference shards rows, buffers them in keyed state, and ships ≤524,000-byte
micro-tables to the DLP service; in-process none of that is needed — each
transform is a native Column expression applied in one narrow projection, so
the whole DEID stage is a single WholeStageCodegen span with no shuffle.
"""
from __future__ import annotations

from pyspark.sql import DataFrame

from ..plans.config import DeidTemplate
from ..functions import transforms


def deidentify(df: DataFrame, template: DeidTemplate) -> DataFrame:
    """Apply a compiled DeidTemplate; schema-preserving (transformed columns
    become strings, like the reference's all-STRING BigQuery output —
    DLPTextToBigQueryStreaming.java:845-846)."""
    cols = set(df.columns)
    out = df
    for ft in template.transformations:
        for name in ft.fields:
            if name not in cols:
                continue
            out = out.withColumn(name, ft.builder(out[name]))
    return out


def reidentify(
    df: DataFrame,
    columns: list[str],
    key: str,
    surrogate_info_type: str | None = None,
    strict: bool = True,
    mode: str = "siv",
    alphabet: str = "NUMERIC",
    context: str | None = None,
) -> DataFrame:
    """Reverse deterministic tokenization on selected columns (reference REID:
    re-identify-config.config:8-27; output table suffix `_re_id`,
    common/DLPTransform.java:196-197). ``strict=False`` nulls corrupt tokens
    instead of failing (pair with plans.pipeline.split_malformed for the
    error-table side output) — honored on BOTH cipher paths. ``mode``
    defaults to "siv", matching the template compiler's
    cryptoDeterministicConfig default (plans.config deterministic_mode), so
    an omitted-mode deid→reid pair round-trips; pass ``mode="ecb"`` only for
    tokens minted by the explicit ECB opt-in path, ``mode="ffx"`` (with
    ``alphabet``/``context`` matching the deid template's
    cryptoReplaceFfxFpeConfig) for format-preserving FF1 tokens."""
    if mode not in ("siv", "ecb", "ffx"):
        raise ValueError(f"mode must be 'siv', 'ecb', or 'ffx', got {mode!r}")
    out = df
    for name in columns:
        if mode == "siv":
            from ..functions import crypto
            from ..plans.config import derive_siv_key

            col = crypto.siv_reidentify(
                out[name], derive_siv_key(key), surrogate_info_type, strict
            )
        elif mode == "ffx":
            from ..functions import fpe

            col = fpe.ff1_reidentify(
                out[name],
                fpe.derive_fpe_key(key),
                alphabet,
                context=out[context] if context else None,
                surrogate_info_type=surrogate_info_type,
                strict=strict,
            )
        else:
            col = transforms.crypto_reidentify(out[name], key, surrogate_info_type, strict)
        out = out.withColumn(name, col)
    return out
