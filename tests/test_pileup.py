"""Pileup pipeline tests: vectorized expansion/MMDF/pileup vs scalar
reference logic, on synthetic reads and the demo BAM."""
import numpy as np
import pytest

from strelka_tpu.io import bam as bamio
from strelka_tpu.io.fasta import FastaReference, encode_bases
from strelka_tpu.pipeline import pileup as pl
from strelka_tpu.pipeline import reads as rd
from strelka_tpu.utils import cigar as cg


def make_batch(reads):
    """reads: list of (pos, cigar_str, seq_str, qual_list, flag, mapq).
    Delegates to the shared constructor in benchmarks/synth.py."""
    from benchmarks.synth import make_batch as _mb
    return _mb(reads)


def test_expand_alignments_basic():
    #        pos  cigar        seq           qual
    batch = make_batch([
        (10, "5M", "ACGTA", [30] * 5, 0, 60),
        (20, "2M3I2M2D2M", "AACGTACGT", [30] * 9, 16, 60),
        (5, "2S3M", "TTACG", [30] * 5, 0, 60),
    ])
    ea = rd.expand_alignments(batch)
    # read 0: 5 aligned bases at 10..14
    m0 = ea.match_read == 0
    assert np.array_equal(ea.match_refpos[m0], np.arange(10, 15))
    assert np.array_equal(ea.match_readoff[m0], np.arange(5))
    # read 1: aligned at 20,21 (off 0,1), 22,23 (off 5,6), 26,27 (off 7,8)
    m1 = ea.match_read == 1
    assert np.array_equal(ea.match_refpos[m1], [20, 21, 22, 23, 26, 27])
    assert np.array_equal(ea.match_readoff[m1], [0, 1, 5, 6, 7, 8])
    # insertion event at refpos 22 readoff 2 len 3, non-edge
    assert ea.ins_refpos.tolist() == [22]
    assert ea.ins_readoff.tolist() == [2]
    assert ea.ins_len.tolist() == [3]
    assert not ea.ins_is_edge[0]
    # deletion event: ref 24,25
    assert ea.devent_refpos.tolist() == [24]
    assert ea.devent_len.tolist() == [2]
    assert np.array_equal(ea.del_refpos, [24, 25])
    # read 2 soft-clip: aligned starts at ref 5 with readoff 2
    m2 = ea.match_read == 2
    assert np.array_equal(ea.match_refpos[m2], [5, 6, 7])
    assert np.array_equal(ea.match_readoff[m2], [2, 3, 4])
    assert ea.ref_begin[2] == 5 and ea.ref_end[2] == 8


def scalar_mmdf(seq, ref_win, events, F):
    """Direct transcription of the ddata delta algorithm."""
    S = len(seq)
    F2 = 2 * F
    DL = max(1 + F2, S) - F2
    delta = np.zeros(DL, np.int32)
    for start, length in events:
        delta[max(F2, start) - F2] += 1
        if start + length < DL:
            delta[start + length] -= 1
    cs = np.cumsum(delta)
    return np.array([cs[min(DL - 1, max(F, p) - F)] for p in range(S)])


def test_mmdf_matches_scalar():
    ref = encode_bases("ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT")
    # read matches ref[5:25] with 2 mismatches at read offsets 3, 12
    seq = ref[5:25].copy()
    seq[3] ^= 1
    seq[12] ^= 2
    from strelka_tpu.io.fasta import decode_bases
    batch = make_batch([(5, "20M", decode_bases(seq), [30] * 20, 0, 60)])
    ea = rd.expand_alignments(batch)
    mmf, _ = rd.mismatch_density_filter(batch, ea, ref, 0, flank_size=5,
                                        max_mismatch=1)
    counts = scalar_mmdf(seq, ref, [(3, 1), (12, 1)], F=5)
    assert np.array_equal(mmf, counts > 1)
    # with flank 10 both mismatches fall in one window somewhere
    mmf10, _ = rd.mismatch_density_filter(batch, ea, ref, 0, flank_size=10,
                                          max_mismatch=1)
    counts10 = scalar_mmdf(seq, ref, [(3, 1), (12, 1)], F=10)
    assert np.array_equal(mmf10, counts10 > 1)
    assert mmf10.any()


def test_pileup_simple():
    ref = encode_bases("A" * 40)
    batch = make_batch([
        (10, "5M", "AACAA", [30, 30, 25, 30, 30], 0, 60),     # C at 12
        (10, "5M", "AACAA", [30, 30, 14, 30, 30], 16, 60),    # C at 12, low q
        (12, "1M2D2M", "CAA", [30] * 3, 0, 60),               # C at 12, del 13-14
        (11, "3M", "AAA", [30] * 3, 0, 10),                   # submapped
    ])
    keep, level = rd.filter_and_classify_reads(batch, min_mapq=20)
    assert keep.all()
    assert level.tolist() == [0, 0, 0, 2]
    ea = rd.expand_alignments(batch)
    pu = pl.build_pileup(batch, ea, level, ref, 0, 40, min_qscore=17,
                         mapq_adjust=False)
    assert pu.depth[12] == 3
    assert pu.used[12].sum() == 2        # low-qual call filtered
    counts = pu.used_counts()
    assert counts[12, 1] == 2            # two used C calls
    assert pu.spandel[13] == 1 and pu.spandel[14] == 1
    assert pu.submapped[11] == 1 and pu.submapped[12] == 1
    assert pu.depth[11] == 2             # submapped not in tier1 depth


def test_pileup_demo_consistency(demo_bams, demo_fasta):
    ref = FastaReference(demo_fasta)
    contig = ref.load_contig("demo20")
    hdr, batch = bamio.read_bam(demo_bams[0])
    keep, level = rd.filter_and_classify_reads(batch, min_mapq=20)
    sub = batch.select(keep)
    level = level[keep]
    ea = rd.expand_alignments(sub)
    mmf, _ = rd.mismatch_density_filter(sub, ea, contig, 0, 20, 2)
    pu = pl.build_pileup(sub, ea, level, contig, 0, len(contig),
                         min_qscore=17, mm_filter=mmf)
    assert pu.depth.max() > 20
    assert pu.used.sum() <= pu.valid.sum()
    # depth equals valid lane count everywhere
    assert np.array_equal(pu.depth, pu.valid.sum(axis=1))
    # a sample of pileup columns must match ref at most positions
    counts = pu.used_counts()
    maj = counts.argmax(axis=1)
    cov = counts.sum(axis=1) >= 10
    agree = (maj[cov] == contig[cov]).mean()
    assert agree > 0.95


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


def test_spliced_read_pileup():
    """RNA spliced alignments (N CIGAR): exons contribute coverage, the
    skip gap contributes neither depth nor spanning-deletion counts
    (read segment handling for RNA, starling_read_segment)."""
    import numpy as np

    from strelka_tpu.io.fasta import decode_bases
    from strelka_tpu.pipeline import pileup as pl
    from strelka_tpu.pipeline import reads as rd

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, 500).astype(np.uint8)
    refs = decode_bases(codes)
    seq = refs[100:130] + refs[230:260]
    batch = make_batch([(100, "30M100N30M", seq, [35] * 60, 0, 60)])
    keep, level = rd.filter_and_classify_reads(batch, 20)
    ea = rd.expand_alignments(batch)
    for use_native in (False, True):
        if use_native:
            from strelka_tpu.io.native import pileup_native
            res = pileup_native(batch, level, codes, 0, 0, 500,
                                min_qscore=17, mm_flank=20, mm_max=2)
            if res is None:
                continue
            pu = res[0]
        else:
            pu = pl.build_pileup(batch, ea, level, codes, 0, 500,
                                 min_qscore=17, mm_filter=None)
        d = pu.used.sum(axis=1)
        assert d[100:130].sum() == 30
        assert d[130:230].sum() == 0
        assert d[230:260].sum() == 30
        assert pu.spandel[130:230].sum() == 0
