"""--report-evs-features round trip: caller EVSF output -> feature CSV
-> RF training -> exported model loads back into the caller.

Reference analog: --reportEVSFeatures (gvcf_writer.cpp:515-527,
position_somatic_snv_strand_grid_vcf.cpp:429-437) feeding
scoringModelTraining/*/bin/{vcf_to_feature_csv,evs_learn,
evs_exportmodel}.py.
"""
import gzip
import os

import numpy as np
import pytest

DEMO = "/root/reference/src/demo/data"


def _evsf_records(path):
    out = []
    with gzip.open(path, "rt") as f:
        for line in f:
            if line.startswith("#"):
                if line.startswith("##INFO=<ID=EVSF"):
                    out.append("HEADER")
                continue
            info = line.split("\t")[7]
            for kv in info.split(";"):
                if kv.startswith("EVSF="):
                    out.append([float(x) for x in kv[5:].split(",")])
    return out


@pytest.mark.skipif(not os.path.exists(DEMO), reason="no demo data")
def test_germline_evsf_reported(tmp_path):
    from strelka_tpu.workflow.germline import run_germline
    out = tmp_path / "run"
    rc = run_germline([
        "--reference", f"{DEMO}/demo20.fa",
        "--align-file", f"{DEMO}/NA12891_demo20.bam",
        "--output-dir", str(out), "--exome", "--report-evs-features"])
    assert rc == 0
    recs = _evsf_records(str(out / "variants.vcf.gz"))
    assert "HEADER" in recs
    vecs = [r for r in recs if r != "HEADER"]
    assert len(vecs) >= 10  # every variant record carries features
    from strelka_tpu.pipeline.gvcf import (DEFAULT_GERMLINE_INDEL_EVSF,
                                           DEFAULT_GERMLINE_SNV_EVSF)
    lens = {len(v) for v in vecs}
    assert lens <= {len(DEFAULT_GERMLINE_SNV_EVSF),
                    len(DEFAULT_GERMLINE_INDEL_EVSF)}
    assert all(np.isfinite(v).all() for v in vecs)


@pytest.mark.skipif(not os.path.exists(DEMO), reason="no demo data")
def test_somatic_evsf_and_training_roundtrip(tmp_path):
    from strelka_tpu.workflow.somatic import run_somatic
    out = tmp_path / "som"
    rc = run_somatic([
        "--reference", f"{DEMO}/demo20.fa",
        "--normal-align-file", f"{DEMO}/NA12892_demo20.bam",
        "--tumor-align-file", f"{DEMO}/NA12891_demo20.bam",
        "--output-dir", str(out), "--exome", "--report-evs-features"])
    assert rc == 0
    snv_path = str(out / "somatic.snvs.vcf.gz")
    recs = _evsf_records(snv_path)
    assert "HEADER" in recs
    vecs = [r for r in recs if r != "HEADER"]
    assert vecs and all(len(v) == 10 for v in vecs)

    # EVSF must not change calls: records minus EVSF match a plain run
    plain = tmp_path / "plain"
    assert run_somatic([
        "--reference", f"{DEMO}/demo20.fa",
        "--normal-align-file", f"{DEMO}/NA12892_demo20.bam",
        "--tumor-align-file", f"{DEMO}/NA12891_demo20.bam",
        "--output-dir", str(plain), "--exome"]) == 0

    def _strip(path):
        out_lines = []
        with gzip.open(path, "rt") as f:
            for line in f:
                if line.startswith("#"):
                    continue
                fields = line.split("\t")
                fields[7] = ";".join(kv for kv in fields[7].split(";")
                                     if not kv.startswith("EVSF="))
                out_lines.append("\t".join(fields))
        return out_lines

    assert _strip(snv_path) == _strip(str(plain / "somatic.snvs.vcf.gz"))

    # feature CSV -> train -> export -> load
    from strelka_tpu.ops.rf import load_scoring_model
    from strelka_tpu.training.evs_train import (load_feature_csv,
                                                train_and_export,
                                                vcf_to_feature_csv)
    csv_path = tmp_path / "feat.csv"
    n = vcf_to_feature_csv([snv_path], [snv_path], str(csv_path), "SNV")
    assert n == 2 * len(vecs)
    feats, labels, names = load_feature_csv(str(csv_path))
    assert feats.shape == (n, 10)
    model_path = tmp_path / "model.json"
    train_and_export(feats, labels, names, str(model_path),
                     "SNV", "Somatic", n_trees=5, max_depth=3)
    forest = load_scoring_model(str(model_path), "SNV", "Somatic")
    scores = forest.score_phred(feats)
    assert np.isfinite(scores).all()


def test_format_evsf_precision():
    from strelka_tpu.pipeline.gvcf import format_evsf
    # %.5g mirrors C++ default-float setprecision(5)
    assert format_evsf([1.0, 0.333333333, 1e-5, 12345.678]) == \
        "1,0.33333,1e-05,12346"
