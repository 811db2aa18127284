"""Ploidy-region VCF tests (ploidy_util analog): haploid priors and
no-call regions flow through to gVCF output."""
import gzip
import os

import pytest

from strelka_tpu.workflow.germline import run_germline


def test_ploidy_regions(tmp_path):
    # declare demo20:1-2000 haploid and 3000-3500 ploidy-0 for sample 1
    pvcf = tmp_path / "ploidy.vcf"
    pvcf.write_text(
        "##fileformat=VCFv4.1\n"
        '##FORMAT=<ID=CN,Number=1,Type=Integer,Description="copy number">\n'
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\n"
        "demo20\t1\t.\tN\t<CNV>\t.\tPASS\tEND=2000\tCN\t1\n"
        "demo20\t3000\t.\tN\t<CNV>\t.\tPASS\tEND=3500\tCN\t0\n")
    out = str(tmp_path / "run")
    rc = run_germline([
        "--reference", "/root/reference/src/demo/data/demo20.fa",
        "--align-file", "/root/reference/src/demo/data/NA12891_demo20.bam",
        "--output-dir", out,
        "--ploidy-region-vcf", str(pvcf),
    ])
    assert rc == 0
    lines = [l.rstrip().split("\t") for l in
             gzip.open(os.path.join(out, "genome.S1.vcf.gz"), "rt")
             if not l.startswith("#")]
    # haploid region: variant at 1706 (hom C->T) called as single-allele GT
    v1706 = next(l for l in lines if l[1] == "1706")
    gt = v1706[9].split(":")[0]
    assert gt == "1", v1706
    # het sites inside haploid region should not call het GTs
    for l in lines:
        pos = int(l[1])
        if pos < 2000 and l[4] != ".":
            assert "/" not in l[9].split(":")[0], l
    # ploidy-0 region: covered sites keep their diploid GT but carry
    # the PloidyConflict filter (updateSnvLocusWithSampleInfo:366-373 —
    # uncovered sites report GT '.')
    p0 = [l for l in lines if 3000 <= int(l[1]) < 3500 and l[4] == "."]
    assert p0
    for l in p0:
        gt = l[9].split(":")[0]
        if gt == ".":
            continue  # uncovered span
        assert gt == "0/0", l
        assert "PloidyConflict" in l[6], l
    # diploid region unaffected
    v2455 = next(l for l in lines if l[1] == "2455")
    assert v2455[9].split(":")[0] == "1/1"


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


def test_forced_gt_emits_homref_record(tmp_path):
    """A forced allele with no read support is genotyped and reported
    (is_forced_output semantics: the record appears even as 0/0)."""
    import gzip

    import jax
    jax.config.update("jax_platforms", "cpu")
    from strelka_tpu.workflow.germline import run_germline

    fvcf = tmp_path / "forced.vcf"
    fvcf.write_text("##fileformat=VCFv4.1\n"
                    "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
                    "demo20\t2100\t.\tA\tATTT\t.\t.\t.\n")
    out = str(tmp_path / "out")
    rc = run_germline([
        "--reference", "/root/reference/src/demo/data/demo20.fa",
        "--align-file", "/root/reference/src/demo/data/NA12891_demo20.bam",
        "--output-dir", out, "--exome", "--forced-gt", str(fvcf)])
    assert rc == 0
    recs = [l.split("\t") for l in
            gzip.open(out + "/variants.vcf.gz", "rt")
            if not l.startswith("#") and l.split("\t")[1] == "2100"]
    assert recs, "forced allele must be reported"
    f = recs[0]
    assert f[4].endswith("TTT")
    sample = f[9].split(":")
    assert sample[0] == "0/0"          # no support -> hom-ref call
    assert f[6] == "NoPassedVariantGTs"
