"""Germline self-golden regression snapshot.

The reference checkout ships no germline expected VCFs (its demo only
checks error-free completion), so this pins the engine's own demo
output: the committed snapshot under tests/data/germline_golden was
produced by a validated build (somatic demo byte-identical to the
reference golden; germline calls match the known demo het/hom/indel
set). Any change to germline records — scores, filters, blocks, PLs —
must be reviewed and the snapshot regenerated deliberately.
"""
import gzip
import os

import pytest

DEMO = "/root/reference/src/demo/data"
GOLD = os.path.join(os.path.dirname(__file__), "data", "germline_golden")


def _records(lines):
    # drop the volatile tool/cmdline identity headers, keep everything
    # else including FILTER/FORMAT headers and every record field
    return [l for l in lines
            if not l.startswith(("##source", "##content", "##fileDate",
                                 "##cmdline", "##startTime", "##reference"))]


@pytest.mark.skipif(not os.path.exists(DEMO), reason="no demo data")
def test_joint_exome_demo_matches_snapshot(tmp_path):
    from strelka_tpu.workflow.germline import run_germline
    out = tmp_path / "run"
    rc = run_germline([
        "--reference", f"{DEMO}/demo20.fa",
        "--align-file", f"{DEMO}/NA12891_demo20.bam",
        "--align-file", f"{DEMO}/NA12892_demo20.bam",
        "--output-dir", str(out), "--exome"])
    assert rc == 0
    for name, got in [("joint_exome.variants.vcf", "variants.vcf.gz"),
                      ("joint_exome.genome.S1.vcf", "genome.S1.vcf.gz"),
                      ("joint_exome.genome.S2.vcf", "genome.S2.vcf.gz")]:
        with open(os.path.join(GOLD, name)) as f:
            exp = _records(f.readlines())
        with gzip.open(out / got, "rt") as f:
            act = _records(f.readlines())
        assert act == exp, f"{name}: germline output changed vs snapshot"
