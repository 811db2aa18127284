"""gVCF structural invariant: block and site records tile the report
range contiguously without overlap (gvcf_writer semantics)."""
import gzip

import pytest


@pytest.fixture(scope="module")
def demo_gvcf(tmp_path_factory):
    import jax
    jax.config.update("jax_platforms", "cpu")
    from strelka_tpu.workflow.germline import run_germline

    out = str(tmp_path_factory.mktemp("cov"))
    rc = run_germline([
        "--reference", "/root/reference/src/demo/data/demo20.fa",
        "--align-file", "/root/reference/src/demo/data/NA12891_demo20.bam",
        "--output-dir", out, "--exome"])
    assert rc == 0
    return out + "/genome.S1.vcf.gz"


def test_gvcf_tiles_contig_without_gaps(demo_gvcf):
    spans = []
    with gzip.open(demo_gvcf, "rt") as f:
        for line in f:
            if line.startswith("#"):
                continue
            fields = line.rstrip("\n").split("\t")
            pos = int(fields[1])
            ref, alt = fields[3], fields[4]
            end = pos
            for kv in fields[7].split(";"):
                if kv.startswith("END="):
                    end = int(kv[4:])
            if alt != "." and len(ref) > len(alt.split(",")[0]):
                continue  # deletion records overlay sites by design
            if alt != "." and len(ref) == 1 and len(alt.split(",")[0]) > 1:
                continue  # insertion records anchor on the prior base
            spans.append((pos, end))
    spans.sort()
    # contiguous from position 1 to the contig end, no gaps/overlaps
    assert spans[0][0] == 1
    cursor = 0
    for b, e in spans:
        assert b == cursor + 1, (b, cursor)
        cursor = e
    assert cursor == 5000  # demo20 length
