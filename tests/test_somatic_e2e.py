"""Somatic workflow end-to-end test against the reference's committed
expected demo results (the reference's own correctness criterion:
runStrelkaSomaticWorkflowDemo.bash diffs outputs vs expectedResults)."""
import gzip
import os

import pytest

from strelka_tpu.workflow.somatic import run_somatic

EXPECTED_DIR = "/root/reference/src/demo/expectedResults"


@pytest.fixture(scope="module")
def somatic_output(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("som_run"))
    rc = run_somatic([
        "--reference", "/root/reference/src/demo/data/demo20.fa",
        "--normal-align-file", "/root/reference/src/demo/data/NA12892_demo20.bam",
        "--tumor-align-file", "/root/reference/src/demo/data/NA12891_demo20.bam",
        "--output-dir", out, "--exome",
    ])
    assert rc == 0
    return out


def load_scores(path, key):
    d = {}
    with gzip.open(path, "rt") as f:
        for line in f:
            if line.startswith("#"):
                continue
            fields = line.split("\t")
            info = dict(kv.split("=") for kv in fields[7].split(";") if "=" in kv)
            d[int(fields[1])] = {
                "q": int(info[key]), "q_nt": int(info[key + "_NT"]),
                "nt": info["NT"], "ref": fields[3], "alt": fields[4],
                "filter": fields[6],
            }
    return d


def test_somatic_snvs_vs_expected(somatic_output):
    mine = load_scores(os.path.join(somatic_output, "somatic.snvs.vcf.gz"), "QSS")
    exp = load_scores(os.path.join(EXPECTED_DIR, "somatic.snvs.vcf.gz"), "QSS")
    # every expected site must be called with the right alleles + NT
    for pos, e in exp.items():
        assert pos in mine, f"missing somatic SNV at {pos}"
        m = mine[pos]
        assert m["ref"] == e["ref"] and m["alt"] == e["alt"], pos
        assert m["nt"] == e["nt"], pos
        # every site matches the reference scores exactly
        assert m["q"] == e["q"], (pos, m["q"], e["q"])
        assert m["q_nt"] == e["q_nt"], (pos, m["q_nt"], e["q_nt"])
        assert m["filter"] == e["filter"], (pos, m["filter"], e["filter"])
    # no unexpected PASS calls at other positions
    for pos, m in mine.items():
        if pos not in exp:
            assert m["filter"] != "PASS", f"unexpected PASS call at {pos}"


def test_somatic_indels_vs_expected(somatic_output):
    mine = load_scores(os.path.join(somatic_output, "somatic.indels.vcf.gz"), "QSI")
    exp = load_scores(os.path.join(EXPECTED_DIR, "somatic.indels.vcf.gz"), "QSI")
    for pos, e in exp.items():
        assert pos in mine, f"missing somatic indel at {pos}"
        m = mine[pos]
        assert m["ref"] == e["ref"] and m["alt"] == e["alt"], pos
        assert m["nt"] == e["nt"], pos
        # both demo indels match the reference scores exactly
        assert m["q"] == e["q"], (pos, m["q"], e["q"])
        assert m["q_nt"] == e["q_nt"], (pos, m["q_nt"], e["q_nt"])
        assert m["filter"] == e["filter"], pos


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


def test_whole_file_diff(somatic_output):
    """Reference-style whole-file diff (runStrelkaSomaticWorkflowDemo
    filterVariableMetadata): both somatic output files must be
    byte-identical to the committed expected results — every header
    line, record, score, filter and 50bp window stat — modulo the
    volatile metadata the reference's own check filters plus the two
    tool-identity lines (##source / ##content name strelka_tpu)."""
    import re
    volatile = re.compile(
        r"^##(fileDate|source|source_version|startTime|reference|cmdline|"
        r"content)")

    def lines(path):
        with gzip.open(path, "rt") as f:
            return [l for l in f if not volatile.match(l)]

    for kind in ("snvs", "indels"):
        mine = lines(os.path.join(somatic_output, f"somatic.{kind}.vcf.gz"))
        exp = lines(os.path.join(EXPECTED_DIR, f"somatic.{kind}.vcf.gz"))
        assert mine == exp, kind


def test_callable_regions_cover_pass_sites(tmp_path):
    """--output-callable-regions: every PASS somatic SNV position must
    be inside the callable track (QSS>=15 or NQSS>=15 positions,
    SomaticCallableProcessor)."""
    out = str(tmp_path / "callable_run")
    rc = run_somatic([
        "--reference", "/root/reference/src/demo/data/demo20.fa",
        "--normal-align-file",
        "/root/reference/src/demo/data/NA12892_demo20.bam",
        "--tumor-align-file",
        "/root/reference/src/demo/data/NA12891_demo20.bam",
        "--output-dir", out, "--exome", "--output-callable-regions"])
    assert rc == 0
    intervals = []
    with gzip.open(os.path.join(out, "somatic.callable.regions.bed.gz"),
                   "rt") as f:
        for line in f:
            c, b, e = line.split("\t")[:3]
            intervals.append((int(b), int(e)))
    snvs = load_scores(os.path.join(out, "somatic.snvs.vcf.gz"), "QSS")
    for pos, rec in snvs.items():
        if rec["filter"] == "PASS":
            assert any(b < pos <= e for b, e in intervals), pos
