"""PySpark-native streaming de-identification / tokenization engine.

From-scratch re-expression of the capabilities of
GoogleCloudPlatform/dlp-dataflow-deidentification (reference, read-only at
/root/reference) on idiomatic PySpark: DataFrame/SQL plans, JVM-native
expressions for the DLP transform semantics, Arrow-batched pandas UDFs only
where offsets or per-key state genuinely require Python, and Structured
Streaming (watermarks, session windows, stateful joins, exactly-once sink)
for the streaming pipelines.
"""
from .plans.config import DeidTemplate, InspectConfig
from .operators.deidentify import deidentify, reidentify
from .operators.inspect import inspect, inspect_offsets, inspection_report
from .operators import risk
from .functions import findings, infotypes, transforms

__all__ = [
    "DeidTemplate",
    "InspectConfig",
    "deidentify",
    "reidentify",
    "inspect",
    "inspect_offsets",
    "inspection_report",
    "risk",
    "findings",
    "infotypes",
    "transforms",
]
