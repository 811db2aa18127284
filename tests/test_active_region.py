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
    opt = assembly.AssemblerOptions(min_word_length=20, min_coverage=3)
    contigs, _ = assembly.run_iterative_assembler(reads, opt)
    assert contigs
    best = max(contigs, key=lambda c: len(c.seq)).seq
    assert best in hap or hap in best or len(best) > 80


def test_select_haplotypes_same_count_groups():
    # the three worked examples from ActiveRegionProcessor.cpp:448-452
    ref = b"\x00" * 10
    h1, h2, h3 = b"\x01" * 10, b"\x02" * 10, b"\x03" * 10

    def ids(n, base):
        return list(range(base, base + n))

    # (15, ref), (12, h1), (12, h2) -> [ref, h1, h2] (ploidy+1 w/ ref)
    sel = ar.select_haplotypes(
        {ref: ids(15, 0), h1: ids(12, 100), h2: ids(12, 200)}, ref, 2, None)
    assert sorted(sel) == sorted([ref, h1, h2])
    # (15, ref), (12, h1), (12, h2), (12, h3) -> [ref] (tie group dropped)
    sel = ar.select_haplotypes(
        {ref: ids(15, 0), h1: ids(12, 100), h2: ids(12, 200),
         h3: ids(12, 300)}, ref, 2, None)
    assert sel == [ref]
    # (15, h1), (12, h2), (12, h3) -> [h1] (no ref selected, no +1 slot)
    sel = ar.select_haplotypes(
        {h1: ids(15, 0), h2: ids(12, 100), h3: ids(12, 200)}, ref, 2, None)
    assert sel == [h1]
    # below MinHaplotypeCount haplotypes never selected
    sel = ar.select_haplotypes({h1: ids(2, 0)}, ref, 2, None)
    assert sel == []


def test_phasing_noise_filter():
    # hap2 = hap1 with one base changed at the head of an 11bp
    # homopolymer, unique support single-stranded (reverse) -> filtered
    hap1 = b"\x01" + bytes([0] * 11) + b"\x02\x03"
    hap2 = b"\x00" + bytes([0] * 11) + b"\x02\x03"
    ids1 = list(range(20))
    ids2 = list(range(100, 104))
    is_fwd = np.ones(200, dtype=bool)
    is_fwd[ids2] = False  # hap2 support all reverse
    assert ar._is_sequencer_phasing_noise(
        {hap1: ids1, hap2: ids2}, hap1, hap2, is_fwd)
    # mixed strands -> kept
    is_fwd[ids2[0]] = True
    assert not ar._is_sequencer_phasing_noise(
        {hap1: ids1, hap2: ids2}, hap1, hap2, is_fwd)
    # short homopolymer -> kept
    hap1s = b"\x01" + bytes([0] * 5) + b"\x02\x03"
    hap2s = b"\x00" + bytes([0] * 5) + b"\x02\x03"
    is_fwd[ids2] = False
    assert not ar._is_sequencer_phasing_noise(
        {hap1s: ids1, hap2s: ids2}, hap1s, hap2s, is_fwd)


def test_assembly_fallback_discovers_variants():
    # reads shorter than the active region: counting can't span, the
    # assembly path must reconstruct both alleles and discover the SNVs
    rng = np.random.default_rng(3)
    ref = rng.integers(0, 4, 220).astype(np.uint8)
    refs = decode_bases(ref)
    alt = list(refs)
    alt[90] = "ACGT"[(ref[90] + 1) % 4]
    alt[100] = "ACGT"[(ref[100] + 2) % 4]
    alts = "".join(alt)
    rl = 36
    reads = []
    for i, st in enumerate(range(40, 140, 2)):
        src = refs if i % 2 == 0 else alts
        flag = 0 if i % 3 else 16
        reads.append((st, f"{rl}M", src[st:st + rl], [35] * rl, flag, 60))
    batch = make_batch(reads)
    keep, level = rd.filter_and_classify_reads(batch, 20)
    ea = rd.expand_alignments(batch)
    region = ar.ActiveRegion(80, 120)  # span 40 > read length
    counts, depth = ar.variant_evidence(batch, ea, level, ref, 0, 220)
    cand_mask = ar.candidate_variant_mask(counts, depth, ref)
    dv = ar.process_active_region(batch, ea, level, ref, 0, region,
                                  cand_mask=cand_mask)
    assert not dv.bypassed
    snv_pos = {p for p, b, h in dv.snvs}
    assert {90, 100} <= snv_pos


def test_oversized_region_bypasses_haplotyping():
    rng = np.random.default_rng(4)
    ref = rng.integers(0, 4, 400).astype(np.uint8)
    batch = make_batch([(10, "30M", decode_bases(ref[10:40]),
                         [35] * 30, 0, 60)])
    keep, level = rd.filter_and_classify_reads(batch, 20)
    ea = rd.expand_alignments(batch)
    dv = ar.process_active_region(batch, ea, level, ref, 0,
                                  ar.ActiveRegion(10, 300))
    assert dv.bypassed and not dv.indels and not dv.snvs


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
