"""Template creation / validation utility — the engine's DLPTemplateHelper
(reference: tool/DLPTemplateHelper.java:46-75).

The reference tool reads ``*.config`` template skeletons with ``%s``
placeholders, substitutes a KMS-wrapped key (KEK), its key name (version
suffix stripped — DLP templates reject versioned key names), and a
timestamp, then uploads the finalized JSON. This module does the same
substitution locally (no cloud storage/KMS in-process), plus what the Java
tool cannot do: VALIDATE the result by compiling it through the engine's
template compiler and reporting the plan.

CLI:
    python -m dlp_dataflow_deidentification_spark.plans.template_helper \
        render <skeleton.config> --kek <b64> --key-name <name> [--out f.json]
    python -m dlp_dataflow_deidentification_spark.plans.template_helper \
        validate <template.json> [--key <crypto key>]
"""
from __future__ import annotations

import json
import time


def strip_key_version(key_name: str) -> str:
    """DLP templates do not allow versioned key names — drop the
    '/cryptoKeyVersions/N' suffix (DLPTemplateHelper.java:56-58)."""
    return key_name.split("/cryptoKeyVersions/")[0]


def render_config(text: str, kek: str, key_name: str, timestamp: "int | None" = None) -> str:
    """Substitute a skeleton's ``%s`` placeholders in the reference tool's
    order: every (wrappedKey, cryptoKeyName) pair gets (kek, key_name); the
    final placeholder is the millisecond timestamp appended to displayName
    (DLPTemplateHelper.java:60-75). Placeholder arity is inferred from the
    skeleton (deid=5, reid=3, inspect=1 in the reference's resources).

    Substitution is a literal split-on-"%s" interleave, NOT Python
    %-formatting: a skeleton containing a literal percent elsewhere (a
    regex like ``[0-9]{1,3}%`` or a displayName) must not raise or be
    consumed as a format directive."""
    parts = text.split("%s")
    n = len(parts) - 1
    if n < 1:
        raise ValueError("skeleton has no %s placeholders")
    if n % 2 != 1:
        raise ValueError(
            f"skeleton has {n} placeholders; expected an odd count "
            "(N key pairs + 1 trailing timestamp)"
        )
    ts = int(time.time() * 1000) if timestamp is None else int(timestamp)
    key = json.dumps(strip_key_version(key_name))
    args: list = []
    for _ in range(n // 2):
        args += [json.dumps(kek), key]
    args.append(str(ts))
    rendered = parts[0] + "".join(a + p for a, p in zip(args, parts[1:]))
    json.loads(rendered)  # must be valid JSON after substitution
    return rendered


def validate_template(doc: "str | dict", crypto_key: "str | None" = None) -> dict:
    """Compile a template through the engine and report the plan:
    {kind, transformations: [{fields, kind}], detectors: [names],
    needs_crypto_key, errors}. Raises nothing — errors land in the report
    so the CLI can exit non-zero with the reason."""
    from . import config as C

    report: dict = {"kind": None, "transformations": [], "detectors": [], "errors": []}
    try:
        doc = C.load_template_doc(doc)  # comments + envelopes, one loader
    except (OSError, json.JSONDecodeError) as e:
        report["errors"].append(f"unreadable template: {e}")
        return report
    if "inspectConfig" in doc:
        report["kind"] = "inspect"
        try:
            icfg = C.InspectConfig.from_dict(doc)
            report["detectors"] = [d.name for d in icfg.detectors]
            report["min_likelihood"] = icfg.min_likelihood
            report["include_quote"] = icfg.include_quote
            report["max_findings_per_item"] = icfg.max_findings_per_item
        except Exception as e:
            report["errors"].append(str(e))
        return report
    report["kind"] = "deid"
    # a template with crypto transforms must compile with a key; probe first
    # without one to report needs_crypto_key precisely
    needs_key = False
    try:
        t = C.DeidTemplate.from_dict(doc, crypto_key=crypto_key)
    except ValueError as e:
        if "crypto_key" in str(e) and crypto_key is None:
            needs_key = True
            try:
                t = C.DeidTemplate.from_dict(doc, crypto_key="0" * 16)
            except Exception as e2:
                report["errors"].append(str(e2))
                report["needs_crypto_key"] = True
                return report
        else:
            report["errors"].append(str(e))
            return report
    except Exception as e:
        report["errors"].append(str(e))
        return report
    report["needs_crypto_key"] = needs_key or bool(
        [ft for ft in t.transformations if ft.kind.startswith(("cryptoHash", "cryptoDeterministic", "dateShift"))]
    )
    report["transformations"] = [
        {"fields": ft.fields, "kind": ft.kind} for ft in t.transformations
    ]
    report["detectors"] = [d.name for d in t.detectors]
    return report


def main(argv: "list[str] | None" = None) -> int:
    import argparse

    ap = argparse.ArgumentParser(prog="template_helper")
    sub = ap.add_subparsers(dest="cmd", required=True)
    r = sub.add_parser("render", help="substitute KEK/key-name/timestamp into a .config skeleton")
    r.add_argument("skeleton")
    r.add_argument("--kek", required=True)
    r.add_argument("--key-name", required=True)
    r.add_argument("--out")
    r.add_argument("--timestamp", type=int)
    v = sub.add_parser("validate", help="compile a template and print the plan report")
    v.add_argument("template")
    v.add_argument("--key")
    args = ap.parse_args(argv)

    if args.cmd == "render":
        with open(args.skeleton) as f:
            rendered = render_config(f.read(), args.kek, args.key_name, args.timestamp)
        if args.out:
            with open(args.out, "w") as f:
                f.write(rendered)
        else:
            print(rendered)
        return 0
    report = validate_template(args.template, args.key)
    print(json.dumps(report, indent=2))
    return 1 if report["errors"] else 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
