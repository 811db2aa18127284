"""End-to-end germline workflow regression test on the bundled demo
data (the reference's germline demo criterion is error-free completion,
src/demo/README.md; we additionally lock down key expected calls)."""
import gzip
import os

import numpy as np
import pytest

from strelka_tpu.workflow.germline import run_germline


@pytest.fixture(scope="module")
def demo_output(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("demo_run"))
    rc = run_germline([
        "--reference", "/root/reference/src/demo/data/demo20.fa",
        "--align-file", "/root/reference/src/demo/data/NA12891_demo20.bam",
        "--align-file", "/root/reference/src/demo/data/NA12892_demo20.bam",
        "--output-dir", out, "--exome",
    ])
    assert rc == 0
    return out


def read_vcf_lines(path):
    recs = []
    with gzip.open(path, "rt") as f:
        for line in f:
            if not line.startswith("#"):
                recs.append(line.rstrip("\n").split("\t"))
    return recs


def test_variants_vcf(demo_output):
    recs = read_vcf_lines(os.path.join(demo_output, "variants.vcf.gz"))
    assert len(recs) > 15
    by_pos = {int(r[1]): r for r in recs}
    # het A->G at 1271 in sample 1, homref in sample 2
    r = by_pos[1271]
    assert r[3] == "A" and r[4] == "G"
    assert r[9].startswith("0/1") and r[10].startswith("0/0")
    # hom C->T at 1706 in sample 1
    r = by_pos[1706]
    assert r[3] == "C" and r[4] == "T" and r[9].startswith("1/1")
    # sample-2-only variant at 1873 keeps allele ordering
    r = by_pos[1873]
    assert r[9].startswith("0/0") and r[10].startswith("0/1")
    # the TAT insertion at 1148
    r = by_pos[1148]
    assert r[4] == "CTAT"
    assert "RU=TAT" in r[7]
    # all variant positions sorted
    poss = [int(r[1]) for r in recs]
    assert poss == sorted(poss)


def test_gvcf_blocks_cover_contig(demo_output):
    recs = read_vcf_lines(os.path.join(demo_output, "genome.S1.vcf.gz"))
    covered = np.zeros(5001, dtype=bool)
    for r in recs:
        pos = int(r[1])
        if r[4] == ".":  # non-variant site/block
            end = pos
            for kv in r[7].split(";"):
                if kv.startswith("END="):
                    end = int(kv[4:])
            covered[pos:end + 1] = True
        else:
            covered[pos] = True
    # every position of the contig is described by some record
    assert covered[1:5001].all()


def test_gvcf_format_sanity(demo_output):
    recs = read_vcf_lines(os.path.join(demo_output, "genome.S2.vcf.gz"))
    assert all(len(r) == 10 for r in recs)
    for r in recs:
        if r[4] != ".":
            fmt = r[8].split(":")
            vals = r[9].split(":")
            assert len(fmt) == len(vals)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
