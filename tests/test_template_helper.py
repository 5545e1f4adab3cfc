"""DLPTemplateHelper analogue: render the reference's OWN .config skeletons
(read live from /root/reference) and validate templates via the compiler."""
import json
import os

import pytest

from dlp_dataflow_deidentification_spark.plans import template_helper as TH

REF = "/root/reference/src/main/resources"


@pytest.mark.parametrize(
    "skeleton", ["de-identify-config.config", "re-identify-config.config", "inspect-config.config"]
)
def test_render_reference_skeletons_to_valid_json(skeleton):
    path = os.path.join(REF, skeleton)
    if not os.path.exists(path):
        pytest.skip("reference resources not present")
    with open(path) as f:
        text = f.read()
    rendered = TH.render_config(
        text,
        kek="CiQAbCk1...base64kek...",
        key_name="projects/p/locations/l/keyRings/r/cryptoKeys/k/cryptoKeyVersions/3",
        timestamp=1700000000000,
    )
    doc = json.loads(rendered)
    # version suffix stripped (DLP rejects versioned key names)
    assert "cryptoKeyVersions" not in rendered
    if "deidentifyTemplate" in doc:
        disp = doc["deidentifyTemplate"]["displayName"]
    else:
        disp = doc["inspectTemplate"]["displayName"]
    assert "1700000000000" in rendered or disp  # timestamp substituted somewhere


def test_render_rejects_even_placeholder_count():
    with pytest.raises(ValueError):
        TH.render_config('{"a":%s,"b":%s}', "k", "n")


def test_validate_repo_deid_template_reports_plan():
    rep = TH.validate_template(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "configs/deid_cards.json")
    )
    assert rep["kind"] == "deid" and not rep["errors"]
    kinds = {t["kind"] for t in rep["transformations"]}
    assert "cryptoHashConfig" in kinds or "characterMaskConfig" in kinds
    assert rep["needs_crypto_key"] is True  # deid_cards hashes the PIN


def test_validate_reference_inspect_template():
    path = os.path.join(REF, "inspect-template.json")
    if not os.path.exists(path):
        pytest.skip("reference resources not present")
    rep = TH.validate_template(path)
    assert rep["kind"] == "inspect" and not rep["errors"]
    assert rep["detectors"]  # the reference template declares infoTypes


def test_validate_surfaces_unsupported_transform_as_error():
    rep = TH.validate_template(
        {
            "deidentifyConfig": {
                "recordTransformations": {
                    "fieldTransformations": [
                        {
                            "fields": [{"name": "x"}],
                            "primitiveTransformation": {"noSuchConfig": {}},
                        }
                    ]
                }
            }
        }
    )
    assert rep["errors"] and "unsupported" in rep["errors"][0]


def test_cli_validate_exit_codes(tmp_path):
    good = str(tmp_path / "good.json")
    with open(good, "w") as f:
        json.dump(
            {
                "deidentifyConfig": {
                    "recordTransformations": {
                        "fieldTransformations": [
                            {
                                "fields": [{"name": "x"}],
                                "primitiveTransformation": {"redactConfig": {}},
                            }
                        ]
                    }
                }
            },
            f,
        )
    assert TH.main(["validate", good]) == 0
    bad = str(tmp_path / "bad.json")
    with open(bad, "w") as f:
        f.write("{not json")
    assert TH.main(["validate", bad]) == 1
