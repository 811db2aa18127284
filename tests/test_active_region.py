"""Active region detection + haplotype generation tests (mirrors the
reference's ActiveRegionTest.cpp style: synthetic reference + reads
pumped through the detector)."""
import numpy as np
import pytest

from strelka_tpu.io.fasta import decode_bases, encode_bases
from strelka_tpu.ops.aligner import align_global
from strelka_tpu.pipeline import active_region as ar
from strelka_tpu.pipeline import assembly, reads as rd
from strelka_tpu.utils import cigar as cg

from tests.test_pileup import make_batch


def test_anchor_mask():
    # hpol run of 6 A's -> interior non-anchor
    ref = encode_bases("CGTCGAAAAAACGTCG")
    m = ar.anchor_mask(ref)
    assert not m[5:11].all()
    assert m[0] and m[3]
    # dinuc repeat ACACAC
    ref2 = encode_bases("GGTACACACACGTTGC")
    m2 = ar.anchor_mask(ref2)
    assert not m2[4:11].all()


def test_aligner_basic():
    ref = encode_bases("ACGTACGTACGT")
    # exact match
    s, ops, lens = align_global(ref, ref)
    assert cg.cigar_to_string(ops, lens) == "12M"
    assert s == 12
    # deletion of 2
    q = encode_bases("ACGTCGTACGT".replace("ACGTCGT", "ACGTGT"))
    q = encode_bases("ACGTGTACGT")  # del of AC at pos 4
    s, ops, lens = align_global(q, ref)
    assert cg.ref_span(ops, lens) == 12
    assert (ops == cg.DELETE).sum() >= 1
    # insertion
    q = encode_bases("ACGTTTACGTACGT")  # ins TT after pos 4
    s, ops, lens = align_global(q, ref)
    assert (ops == cg.INSERT).any()
    assert cg.read_span(ops, lens) == len(q)


def test_active_region_detection_and_haplotypes():
    rng = np.random.default_rng(5)
    ref = rng.integers(0, 4, 400).astype(np.uint8)
    # ensure non-repetitive around the variant cluster
    refs = decode_bases(ref)
    # create alt haplotype with 2 SNVs 5bp apart + 1bp del
    alt = list(refs)
    alt[200] = "ACGT"[(ref[200] + 1) % 4]
    alt[205] = "ACGT"[(ref[205] + 2) % 4]
    alt_hap = "".join(alt[:210]) + "".join(alt[211:])  # del at 210
    reads = []
    rl = 60
    for i in range(30):
        st = 160 + (i % 30)
        if i % 2 == 0:
            reads.append((st, f"{rl}M", refs[st:st + rl], [35] * rl, 0, 60))
        else:
            seq = alt_hap[st:st + rl]
            pre = 210 - st
            cigarstr = f"{pre}M1D{rl - pre}M"
            reads.append((st, cigarstr, seq, [35] * rl, 0, 60))
    batch = make_batch(reads)
    keep, level = rd.filter_and_classify_reads(batch, 20)
    ea = rd.expand_alignments(batch)
    counts, depth = ar.variant_evidence(batch, ea, level, ref, 0, 400)
    assert counts[200] > 0 and counts[205] > 0 and counts[210] >= 4
    anchors = ar.anchor_mask(ref)
    regions = ar.find_active_regions(counts, depth, anchors, ref, 0)
    assert len(regions) >= 1
    reg = next(r for r in regions if r.begin <= 200 < r.end)
    assert reg.begin < 200 and reg.end > 211
    dv = ar.process_active_region(batch, ea, level, ref, 0, reg)
    # both SNVs and the deletion discovered on one haplotype
    snv_pos = {p for p, b, h in dv.snvs}
    assert {200, 205} <= snv_pos
    assert any(k.delete_length == 1 for k, h in dv.indels)
    # hap ids consistent
    assert all(h == 1 for _, _, h in dv.snvs)


def test_assembly_reconstructs_haplotype():
    rng = np.random.default_rng(9)
    hap = decode_bases(rng.integers(0, 4, 120).astype(np.uint8))
    reads = [hap[i:i + 50] for i in range(0, 70, 3)] * 3
    contigs = assembly.assemble_region(reads)
    assert contigs
    best = max(contigs, key=lambda x: len(x[0]))[0]
    assert best in hap or hap in best or len(best) > 80


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
