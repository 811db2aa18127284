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


def test_native_block_compressor_matches_python(tmp_path):
    """native/blocks.cpp must produce byte-identical gVCF lines to the
    BlockState fallback on a region with variants, indels, depth
    variation, and uncovered stretches."""
    import numpy as np

    from benchmarks import synth
    from strelka_tpu.io.fasta import FastaReference
    from strelka_tpu.options import GermlineOptions
    from strelka_tpu.pipeline import germline_caller as gc
    from strelka_tpu.pipeline import gvcf

    refs, batch, _ = synth.generate(L=50_000, depth=18, snv_every=700,
                                    indel_every=700, seed=9)
    # carve out an uncovered gap to exercise ./. blocks
    keep = (batch.pos < 20_000) | (batch.pos > 21_500)
    batch = batch.select(keep)
    fa = tmp_path / "ref.fa"
    fa.write_text(">d\n" + refs + "\n")
    ref = FastaReference(str(fa))
    opt = GermlineOptions()
    res = gc.call_region(opt, ref, "d", 0, 50_000, [batch])
    nocomp = np.zeros(50_000, bool)
    nocomp[5000:5010] = True  # exercise nocompress single-site records
    outs = {}
    for force in (False, True):
        gvcf.FORCE_PYTHON_BLOCKS = force
        try:
            g, v = gvcf.emit_region(opt, res, ["S"],
                                    nocompress_mask=nocomp)
        finally:
            gvcf.FORCE_PYTHON_BLOCKS = False
        outs[force] = (g, v)
    assert outs[False][1] == outs[True][1]
    assert outs[False][0] == outs[True][0]
    assert len(outs[False][0][0]) > 500


def test_variant_records_invariant_under_segmentation(tmp_path):
    """The variant record set must not depend on --max-region-size:
    indels landing exactly on a segment boundary were silently dropped
    (emission loop never reached pos+1 == begin), and deletion REF
    strings sliced only the segment window."""
    import gzip
    import sys

    sys.path.insert(0, "/root/repo")
    from benchmarks import synth
    from strelka_tpu.io.bam import BamHeader
    from strelka_tpu.io.bam_writer import write_bam
    from strelka_tpu.workflow.germline import run_germline

    refs, batch, _ = synth.generate(L=60_000, depth=30, snv_every=1500,
                                    indel_every=997, seed=41)
    fa = tmp_path / "ref.fa"
    fa.write_text(">syn\n" + refs + "\n")
    bam = str(tmp_path / "s.bam")
    write_bam(bam, BamHeader(text="", ref_names=["syn"],
                             ref_lengths=[len(refs)]), batch)

    def records(tag, size):
        out = tmp_path / tag
        run_germline(["--reference", str(fa), "--align-file", bam,
                      "--exome", "--max-region-size", str(size),
                      "--output-dir", str(out)])
        return [l for l in gzip.open(out / "variants.vcf.gz", "rt")
                if not l.startswith("#")]

    whole = records("whole", 60_000)
    assert len(whole) > 50
    # deterministic boundary hit: split exactly at a called indel's
    # first changed base (k.pos == segment begin), the case the old
    # emission loop could never reach
    indel_pos = next(int(l.split("\t")[1]) for l in whole
                     if len(l.split("\t")[3]) != len(l.split("\t")[4])
                     and int(l.split("\t")[1]) > 2000)
    split = records("split", indel_pos)
    assert sorted(whole) == sorted(split)
    # and a many-boundaries sweep (997-spaced indels vs 1kb segments)
    fine = records("fine", 1000)
    assert sorted(whole) == sorted(fine)
