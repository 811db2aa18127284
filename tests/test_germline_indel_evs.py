"""Germline indel EVS: feature assembly + end-to-end scoring with a
trained model (the reference ships germline models only in its
installer, so a model trained on our own feature definitions stands in
for the wire-format test)."""
import gzip
import json
import os

import numpy as np
import pytest

from strelka_tpu.training import evs_train

GERMLINE_INDEL_FEATURES = [
    "GenotypeCategory",
    "SampleIndelRepeatCount",
    "SampleIndelRepeatUnitSize",
    "SampleIndelAlleleBiasLower",
    "SampleIndelAlleleBias",
    "SampleProxyRMSMappingQuality",
    "RelativeTotalLocusDepth",
    "SamplePrimaryAltAlleleDepthFraction",
    "ConservativeGenotypeQuality",
    "InterruptedHomopolymerLength",
    "ContextCompressability",
    "IndelCategory",
    "SampleAlleleCountStrandBias",
    "NormalizedAltHaplotypeCountRatio",
]


@pytest.fixture(scope="module")
def indel_model(tmp_path_factory):
    rng = np.random.default_rng(7)
    n = 1500
    x = rng.normal(size=(n, len(GERMLINE_INDEL_FEATURES)))
    # make GQX (col 8) the dominant signal so real calls score high
    x[:, 8] = rng.uniform(0, 60, size=n)
    labels = (x[:, 8] > 20).astype(int)
    clf = evs_train.train_forest(x, labels, n_trees=10, max_depth=5)
    doc = evs_train.export_model_json(
        clf, GERMLINE_INDEL_FEATURES, "INDEL", "Germline", 3.0)
    path = tmp_path_factory.mktemp("gevs") / "germlineIndel.json"
    with open(path, "w") as f:
        json.dump(doc, f)
    return str(path)


def test_germline_indel_evs_e2e(indel_model, tmp_path):
    from strelka_tpu.workflow.germline import run_germline
    out = str(tmp_path / "run")
    rc = run_germline([
        "--reference", "/root/reference/src/demo/data/demo20.fa",
        "--align-file", "/root/reference/src/demo/data/NA12891_demo20.bam",
        "--output-dir", out, "--exome",
        "--indel-scoring-model-file", indel_model,
    ])
    assert rc == 0
    indel_lines = []
    with gzip.open(os.path.join(out, "variants.vcf.gz"), "rt") as f:
        for line in f:
            if line.startswith("#"):
                continue
            fields = line.split("\t")
            if len(fields[3]) != len(fields[4].split(",")[0]):
                indel_lines.append(fields)
    assert indel_lines, "demo sample should call at least one indel"
    for fields in indel_lines:
        fmt = fields[8].split(":")
        sample = fields[9].split(":")
        gqx = int(sample[fmt.index("GQX")])
        ft = sample[fmt.index("FT")]
        # EVS-scored GQX is capped at the model's phred range, and the
        # filter field reflects the model cutoff rather than raw GQX
        assert 0 <= gqx <= 60
        assert ft in ("PASS", "LowGQX")


def test_feature_vector_shape(indel_model):
    from strelka_tpu.ops.rf import load_scoring_model
    forest = load_scoring_model(indel_model, "INDEL", "Germline")
    assert list(forest.features) == GERMLINE_INDEL_FEATURES
    assert forest.filter_cutoff == 3.0


def test_indel_edge_distance_oracle():
    """Scalar transcription of the reference's distanceFromClosestReadEdge
    (starling_read_align_score_indels.cpp:977-1018: readPos assignment
    then min with revReadPos, default fullReadLength; capped at 20 by
    AlleleReportInfoUtil.cpp:356) vs the vectorized helper."""
    import numpy as np

    from strelka_tpu.pipeline.germline_caller import indel_edge_distances

    def oracle(lrp, rrp, rl):
        read_pos = lrp - 1              # read offset of ref pos-1
        rev_read_pos = rl - 1 - rrp     # reverse twin of right_pos
        dist = rl
        if read_pos >= 0:
            dist = read_pos
        if rev_read_pos >= 0 and rev_read_pos < dist:
            dist = rev_read_pos
        return min(dist, 20)

    cases = []
    for lrp in (-3, 0, 1, 5, 30, 50, 95, 99, 120):
        for ins in (0, 2, 7):
            cases.append((lrp, lrp + ins, 100))
    lrp = np.array([c[0] for c in cases])
    rrp = np.array([c[1] for c in cases])
    rl = np.array([c[2] for c in cases])
    got = indel_edge_distances(lrp, rrp, rl)
    exp = [oracle(*c) for c in cases]
    assert got.tolist() == exp
