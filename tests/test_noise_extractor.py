"""Panel noise extraction + somatic --noise-vcf consumption
(strelkaNoiseExtractor / snoiseWorkflow + NoiseBuffer/SiteNoise)."""
import gzip
import os

import pytest

from strelka_tpu.workflow.noise_extractor import run_noise_extractor
from strelka_tpu.workflow.somatic import run_somatic

DEMO = "/root/reference/src/demo/data"


@pytest.fixture(scope="module")
def noise_vcf(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("noise") / "noise.vcf.gz")
    rc = run_noise_extractor([
        "--reference", f"{DEMO}/demo20.fa",
        "--align-file", f"{DEMO}/NA12892_demo20.bam",
        "--align-file", f"{DEMO}/NA12891_demo20.bam",
        "--output", out])
    assert rc == 0
    return out


def test_noise_vcf_format(noise_vcf):
    n = 0
    with gzip.open(noise_vcf, "rt") as f:
        for line in f:
            if line.startswith("#"):
                continue
            fields = line.rstrip("\n").split("\t")
            assert len(fields) >= 8
            info = dict(kv.split("=") for kv in fields[7].split(";")
                        if "=" in kv)
            assert 0.0 < float(info["PNOISE"]) <= 1.0
            assert 0.0 <= float(info["PNOISE2"]) <= 1.0
            n += 1
    # the demo panel (two 40x samples over 5kb) has plenty of sites
    # with at least one nonref basecall
    assert n > 10


def test_somatic_consumes_noise_vcf(noise_vcf, tmp_path):
    out = str(tmp_path / "som_noise")
    rc = run_somatic([
        "--reference", f"{DEMO}/demo20.fa",
        "--normal-align-file", f"{DEMO}/NA12892_demo20.bam",
        "--tumor-align-file", f"{DEMO}/NA12891_demo20.bam",
        "--output-dir", out, "--exome", "--noise-vcf", noise_vcf])
    assert rc == 0
    got_pnoise = 0
    with gzip.open(os.path.join(out, "somatic.snvs.vcf.gz"), "rt") as f:
        for line in f:
            if line.startswith("#"):
                continue
            if "PNOISE=" in line:
                got_pnoise += 1
    # real het sites in this tumor/normal pair overlap panel noise
    assert got_pnoise > 0
