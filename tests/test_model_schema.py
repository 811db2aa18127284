"""Model-JSON schema validation (models/schema.py).

Reference analog: src/config/validate/validateJsonModelFromSchema.py
over the indelErrorModel and empiricalVariantScoring schemas; the
reference's own shipped model files must validate.
"""
import glob
import json
import os

import pytest

from strelka_tpu.models.schema import (ModelValidationError, validate_model,
                                       validate_model_file)

CFG = "/root/reference/src/config"


@pytest.mark.skipif(not os.path.exists(CFG), reason="no reference checkout")
def test_reference_model_files_validate():
    evs = glob.glob(f"{CFG}/empiricalVariantScoring/models/*.json")
    assert len(evs) == 4
    for p in evs:
        validate_model_file(p, "evs")
    validate_model_file(f"{CFG}/indelErrorModel/models/indelErrorModel.json",
                        "indel-error")
    validate_model_file(f"{CFG}/indelErrorModel/models/theta.json", "theta")


def test_invalid_models_rejected():
    with pytest.raises(ModelValidationError, match="sample"):
        validate_model({}, "indel-error")
    with pytest.raises(ModelValidationError, match="indelRate"):
        validate_model({"sample": [{"sampleName": "s", "motif": [
            {"noisyLocusRate": 0.1, "repeatCount": 1,
             "repeatPatternSize": 1}]}]}, "indel-error")
    with pytest.raises(ModelValidationError):
        validate_model({"sample": [{"sampleName": "s", "motif": [
            {"indelRate": 2.0, "noisyLocusRate": 0.1, "repeatCount": 1,
             "repeatPatternSize": 1}]}]}, "indel-error")  # rate > 1
    with pytest.raises(ModelValidationError, match="CalibrationModels"):
        validate_model({"Models": {}}, "evs")
    with pytest.raises(ModelValidationError):
        validate_model({"CalibrationModels": {"Bogus": {}}}, "evs")


def test_loaders_validate(tmp_path):
    from strelka_tpu.models.error_model import load_error_model_json
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"sample": [{"motif": []}]}))
    with pytest.raises(ModelValidationError):
        load_error_model_json(str(bad))


def test_validate_model_tool(capsys):
    from strelka_tpu.workflow.tools import main
    p = f"{CFG}/empiricalVariantScoring/models/somaticSNVScoringModels.json"
    if os.path.exists(p):
        assert main(["validate-model", p, "evs"]) == 0
