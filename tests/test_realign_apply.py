"""Realignment-application unit tests (finishRealignment analog)."""
import numpy as np
import pytest

from strelka_tpu.pipeline import candidates as cand
from strelka_tpu.pipeline import realign_apply as ra
from strelka_tpu.pipeline.realign import LocusReadScores
from strelka_tpu.utils import cigar as cg

from tests.test_pileup import make_batch


def test_realign_embeds_deletion():
    # soft clips unroll into aligned bases (candidate alignments cover
    # the whole read; optimal clipping is only retained in RNA mode)
    batch = make_batch([(100, "10S80M", "A" * 90, [30] * 90, 0, 60)])
    res = ra.realign_read_to_indel(batch, 0, cand.IndelKey(130, 2, ""))
    assert res is not None
    pos, ops, lens = res
    assert pos == 90
    assert cg.cigar_to_string(ops, lens) == "40M2D50M"
    assert cg.read_span(ops, lens) == 90


def test_realign_embeds_insertion():
    batch = make_batch([(100, "80M", "A" * 80, [30] * 80, 0, 60)])
    res = ra.realign_read_to_indel(batch, 0, cand.IndelKey(140, 0, "ACG"))
    pos, ops, lens = res
    assert cg.cigar_to_string(ops, lens) == "40M3I37M"
    assert cg.read_span(ops, lens) == 80
    assert cg.ref_span(ops, lens) == 77


def test_realign_skips_complex_cases():
    # spliced read (N skip) must not be rewritten
    batch = make_batch([(100, "30M1000N30M", "A" * 60, [30] * 60, 0, 60)])
    assert ra.realign_read_to_indel(batch, 0, cand.IndelKey(110, 2, "")) is None
    # read already carrying an indel
    batch2 = make_batch([(100, "30M2D30M", "A" * 60, [30] * 60, 0, 60)])
    assert ra.realign_read_to_indel(batch2, 0, cand.IndelKey(110, 1, "")) is None
    # swap allele is not rewritten
    batch3 = make_batch([(100, "60M", "A" * 60, [30] * 60, 0, 60)])
    assert ra.realign_read_to_indel(batch3, 0, cand.IndelKey(110, 2, "GG")) is None
    # indel outside the aligned span
    assert ra.realign_read_to_indel(batch3, 0, cand.IndelKey(300, 2, "")) is None


def test_unroll_read():
    batch = make_batch([(100, "10S80M", "A" * 90, [30] * 90, 0, 60)])
    pos, ops, lens = ra.unroll_read(batch, 0)
    assert pos == 90 and cg.cigar_to_string(ops, lens) == "90M"
    # no clips -> nothing to unroll
    batch2 = make_batch([(100, "80M", "A" * 80, [30] * 80, 0, 60)])
    assert ra.unroll_read(batch2, 0) is None


def test_plan_indel_alignment_offsets():
    # a read whose leading clip IS the insertion: scored offset puts
    # the read start at the insertion point -> leading soft clip
    batch = make_batch([(100, "3S97M", "A" * 100, [30] * 100, 0, 60)])
    key = cand.IndelKey(100, 0, "AAA")
    pos, ops, lens = ra.plan_indel_alignment(batch, 0, key,
                                             hap_offset=50, win_begin=50)
    assert pos == 100
    assert cg.cigar_to_string(ops, lens) == "3S97M"
    # read straddling an interior insertion
    pos, ops, lens = ra.plan_indel_alignment(batch, 0, key,
                                             hap_offset=30, win_begin=50)
    assert pos == 80
    assert cg.cigar_to_string(ops, lens) == "20M3I77M"


def test_apply_realignments_batch_rebuild():
    batch = make_batch([
        (100, "50M", "A" * 50, [30] * 50, 0, 60),
        (120, "50M", "A" * 50, [30] * 50, 0, 60),
        (140, "50M", "A" * 50, [30] * 50, 0, 60),
    ])
    key = cand.IndelKey(145, 2, "")
    scores = LocusReadScores(
        read_rows=np.array([0, 1, 2]),
        allele_lhoods=np.array([[0.0, -10.0],   # read 0 prefers ref
                                [-10.0, 0.0],   # read 1 prefers indel
                                [-10.0, 0.0]]), # read 2 prefers indel
        read_len=np.array([50, 50, 50]),
        n_nonambig=np.array([50, 50, 50]),
        is_fwd=np.array([True, True, True]),
    )
    out, n_re = ra.apply_realignments(batch, {0: scores}, [[key]])
    assert n_re == 2
    # read 0 untouched
    assert cg.cigar_to_string(*out.get_cigar(0)) == "50M"
    assert cg.cigar_to_string(*out.get_cigar(1)) == "25M2D25M"
    assert cg.cigar_to_string(*out.get_cigar(2)) == "5M2D45M"
    # offsets consistent
    assert out.cig_off[-1] == len(out.cig_ops)
    assert np.array_equal(out.seq, batch.seq)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


def test_rna_softclip_input_retained():
    """RNA mode: a soft-clipped input alignment that scores as well as
    the chosen realignment is kept (isTestSoftClippedInputAligned)."""
    import numpy as np

    from strelka_tpu.io.fasta import decode_bases
    from strelka_tpu.pipeline import candidates as cand
    from strelka_tpu.pipeline import realign, realign_apply as ra
    from strelka_tpu.pipeline import reads as rd
    from tests.test_pileup import make_batch

    rng = np.random.default_rng(4)
    L = 600
    codes = rng.integers(0, 4, L).astype(np.uint8)
    refs = decode_bases(codes)
    # a read whose trailing 30 bases are RNA junk (mismatch everywhere):
    # the aligner soft-clipped them; unrolling would add 30 mismatches
    rl = 100
    st = 200
    junk = "".join("ACGT"[(codes[st + 70 + i] + 2) % 4] for i in range(30))
    seq = refs[st:st + 70] + junk
    reads = [(st, "70M30S", seq, [35] * rl, 0, 60),
             # clean ref reads to give the locus a scoring context
             *[(p, f"{rl}M", refs[p:p + rl], [35] * rl, 0, 60)
               for p in range(150, 260, 10)]]
    batch = make_batch(sorted(reads, key=lambda r: r[0]))
    level = np.full(batch.n, rd.MapLevel.TIER1, dtype=np.int8)
    ea = rd.expand_alignments(batch)
    key = cand.IndelKey(250, 2, "")
    scores = realign.score_locus(batch, ea, level, codes, 0, [key])
    assert scores is not None

    # default DNA mode: clips unroll
    dna_batch, n_dna = ra.apply_realignments(
        batch, {0: scores}, [[key]], unroll_clips=True)
    # RNA mode with input re-scoring: the clipped read keeps its input
    # alignment (the junk tail would score 30 mismatches if unrolled,
    # far below 30 * ln 0.25)
    rna_batch, n_rna = ra.apply_realignments(
        batch, {0: scores}, [[key]], unroll_clips=False,
        ref_codes=codes, ref_offset=0)
    row = int(np.nonzero(batch.pos == st)[0][0])
    ops_rna, lens_rna = rna_batch.get_cigar(row)
    from strelka_tpu.utils import cigar as cg
    assert list(ops_rna) == [cg.MATCH, cg.SOFT_CLIP]
    assert list(lens_rna) == [70, 30]


def test_aligned_span_table_matches_scalar():
    """aligned_span_table must agree with _aligned_span on edge-indel,
    clipped, spliced, and plain CIGARs (a prior table version
    classified edge I/D ops as non-complex)."""
    from benchmarks.synth import make_batch
    from strelka_tpu.pipeline.realign_apply import (_aligned_span,
                                                    aligned_span_table)

    reads = [
        (10, "100M", "A" * 100, [30] * 100, 0, 60),
        (20, "5S3I92M", "A" * 100, [30] * 100, 0, 60),
        (30, "97M3I", "A" * 100, [30] * 100, 0, 60),
        (40, "10M3D87M3S", "A" * 100, [30] * 100, 0, 60),
        (50, "4S92M4S", "A" * 100, [30] * 100, 0, 60),
        (60, "30M200N70M", "A" * 100, [30] * 100, 0, 60),
        (70, "2S96M2S", "A" * 100, [30] * 100, 16, 60),
    ]
    batch = make_batch(reads)
    cl, cr, hc = aligned_span_table(batch)
    for r in range(batch.n):
        ecl, ecr, ehc = _aligned_span(batch, r)
        assert (int(cl[r]), int(cr[r]), bool(hc[r])) == (ecl, ecr, ehc), \
            (r, reads[r][1])
