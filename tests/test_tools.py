"""libexec-equivalent workflow tools tests."""
import gzip

import pytest

from strelka_tpu.workflow import tools


def test_extract_small_indel_candidates(tmp_path):
    src = tmp_path / "manta.vcf"
    src.write_text(
        "##fileformat=VCFv4.1\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        "c\t10\t.\tA\tAT\t.\tPASS\t.\n"                      # 1bp ins: keep
        "c\t20\t.\t" + "A" * 51 + "\tA\t.\tPASS\t.\n"        # 50bp del: drop
        "c\t30\t.\tA\t<DEL>\t.\tPASS\tEND=500\n"             # symbolic: drop
        "c\t40\t.\tA\tG\t.\tPASS\t.\n"                        # snv: drop
        "c\t50\t.\tAC\tA,ACTT\t.\tPASS\t.\n")                # del+ins: keep both
    out = tmp_path / "cand.vcf.gz"
    n = tools.extract_small_indel_candidates(str(src), str(out))
    assert n == 2
    recs = [l for l in gzip.open(out, "rt") if not l.startswith("#")]
    assert len(recs) == 2
    assert recs[0].split("\t")[1] == "10"
    assert recs[1].split("\t")[4] == "A,ACTT"


def test_sort_vcf(tmp_path):
    src = tmp_path / "u.vcf"
    src.write_text(
        "##contig=<ID=c1,length=100>\n##contig=<ID=c2,length=100>\n"
        "#CHROM\tPOS\tID\tREF\tALT\n"
        "c2\t5\t.\tA\tG\n"
        "c1\t50\t.\tA\tG\n"
        "c1\t10\t.\tA\tG\n")
    out = tmp_path / "s.vcf.gz"
    tools.sort_vcf(str(src), str(out))
    recs = [l.split("\t")[:2] for l in gzip.open(out, "rt")
            if not l.startswith("#")]
    assert recs == [["c1", "10"], ["c1", "50"], ["c2", "5"]]


def test_update_nopassed_filter(tmp_path):
    src = tmp_path / "v.vcf"
    src.write_text(
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2\n"
        "c\t1\t.\tA\tG\t30\tPASS\t.\tGT:FT\t0/0:PASS\t0/1:LowGQX\n"
        "c\t2\t.\tA\tG\t30\tNoPassedVariantGTs\t.\tGT:FT\t0/1:PASS\t0/0:PASS\n")
    out = tmp_path / "o.vcf.gz"
    n = tools.update_no_passed_variant_gts_filter(str(src), str(out))
    assert n == 2
    recs = [l.split("\t")[6] for l in gzip.open(out, "rt")
            if not l.startswith("#")]
    assert recs == ["NoPassedVariantGTs", "PASS"]


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


def test_vcf_cmdline_swapper(tmp_path):
    from strelka_tpu.workflow.tools import vcf_cmdline_swapper
    src = tmp_path / "in.vcf"
    src.write_text("##fileformat=VCFv4.1\n##cmdline=old args\n"
                   "#CHROM\tPOS\nchr1\t5\n")
    out = tmp_path / "out.vcf"
    vcf_cmdline_swapper(str(src), str(out), "new args")
    text = out.read_text()
    assert "##cmdline=new args\n" in text
    assert "old args" not in text
    # insertion when absent
    src2 = tmp_path / "in2.vcf"
    src2.write_text("##fileformat=VCFv4.1\n#CHROM\tPOS\nchr1\t5\n")
    out2 = tmp_path / "out2.vcf"
    vcf_cmdline_swapper(str(src2), str(out2), "added")
    lines = out2.read_text().splitlines()
    assert lines[1] == "##cmdline=added"
    assert lines[2].startswith("#CHROM")


def test_cat_files(tmp_path):
    from strelka_tpu.workflow.tools import cat_files
    a = tmp_path / "a"; a.write_bytes(b"one")
    b = tmp_path / "b"; b.write_bytes(b"two")
    out = tmp_path / "sub" / "out"
    cat_files([str(a), str(b)], str(out))
    assert out.read_bytes() == b"onetwo"
