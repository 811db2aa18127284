"""Native pileup equivalence vs the Python expand+MMDF+scatter path."""
import numpy as np
import pytest

from strelka_tpu.io import native
from strelka_tpu.io.bam import read_bam
from strelka_tpu.io.fasta import FastaReference
from strelka_tpu.pipeline import pileup as pl
from strelka_tpu.pipeline import reads as rd


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable")
    return lib


def python_pileup(batch, level, rc, ref_offset, begin, end, min_q=17,
                  t2=None):
    ea = rd.expand_alignments(batch)
    mmf, t2m = rd.mismatch_density_filter(batch, ea, rc, ref_offset, 20, 2,
                                          tier2_max_mismatch=t2)
    return pl.build_pileup(batch, ea, level, rc, begin, end,
                           min_qscore=min_q, mm_filter=mmf,
                           tier2_mm_filter=t2m)


def compare(pu_py, pu_nat):
    assert np.array_equal(pu_py.depth, pu_nat.depth)
    assert np.array_equal(pu_py.spandel, pu_nat.spandel)
    assert np.array_equal(pu_py.submapped, pu_nat.submapped)
    assert np.array_equal(pu_py.mapq_n, pu_nat.mapq_n)
    np.testing.assert_allclose(pu_py.mapq_sumsq, pu_nat.mapq_sumsq)
    assert np.array_equal(pu_py.mapq_zero, pu_nat.mapq_zero)
    assert np.array_equal(pu_py.used_counts(), pu_nat.used_counts())
    # lane-level comparison up to common depth axis
    D = min(pu_py.max_depth, pu_nat.max_depth)
    for fld in ("base_id", "qual", "raw_qual", "is_fwd", "read_idx",
                "read_off", "valid", "used", "tier2_used"):
        a = getattr(pu_py, fld)[:, :D]
        b = getattr(pu_nat, fld)[:, :D]
        assert np.array_equal(a, b), fld


def test_native_pileup_matches_python_demo(lib, demo_bams, demo_fasta):
    ref = FastaReference(demo_fasta)
    rc = ref.load_contig("demo20")
    for path in demo_bams:
        _, raw = read_bam(path)
        keep, level = rd.filter_and_classify_reads(raw, 20, tier2_min_mapq=0)
        b = raw.select(keep)
        lvl = level[keep]
        pu_py = python_pileup(b, lvl, rc, 0, 0, len(rc), t2=10)
        res = native.pileup_native(b, lvl, rc, 0, 0, len(rc), 17,
                                   t2_mm_max=10)
        assert res is not None
        pu_nat, used_fwd = res
        compare(pu_py, pu_nat)
        # fwd counts from native match python recomputation
        fwd_counts = np.zeros_like(pu_py.used_counts())
        li, di = np.nonzero(pu_py.used & pu_py.is_fwd)
        np.add.at(fwd_counts, (li, pu_py.base_id[li, di]), 1)
        assert np.array_equal(fwd_counts, used_fwd)


def test_native_pileup_subregion(lib, demo_bams, demo_fasta):
    ref = FastaReference(demo_fasta)
    rc = ref.load_contig("demo20")
    _, raw = read_bam(demo_bams[0])
    keep, level = rd.filter_and_classify_reads(raw, 20)
    b = raw.select(keep)
    lvl = level[keep]
    pu_py = python_pileup(b, lvl, rc, 0, 1000, 3000)
    res = native.pileup_native(b, lvl, rc, 0, 1000, 3000, 17)
    pu_nat, _ = res
    compare(pu_py, pu_nat)


def test_native_pileup_unsorted_positions(lib, demo_bams, demo_fasta):
    """Post-realignment batches carry locally moved (unsorted) pos;
    the stripe read-windowing must not drop reads (regression: binary
    search over unsorted pos silently excluded overlapping reads)."""
    ref = FastaReference(demo_fasta)
    rc = ref.load_contig("demo20")
    _, raw = read_bam(demo_bams[0])
    keep, level = rd.filter_and_classify_reads(raw, 20)
    b = raw.select(keep)
    lvl = level[keep]
    # move every 7th read 60bp left: unsorted but still valid
    pos = b.pos.copy()
    pos[::7] = np.maximum(pos[::7] - 60, 0)
    import dataclasses
    b2 = dataclasses.replace(b, pos=pos)
    pu_py = python_pileup(b2, lvl, rc, 0, 0, len(rc))
    res = native.pileup_native(b2, lvl, rc, 0, 0, len(rc), 17)
    assert res is not None
    compare(pu_py, res[0])


def test_native_pileup_unsorted_positions_striped(lib):
    """Same regression at a scale that engages the multi-thread stripe
    path (>=4096 reads, L >= 128k): unsorted pos falls back to
    full-read walks per stripe."""
    import sys
    sys.path.insert(0, "/root/repo")
    from benchmarks import synth

    refs, batch, _ = synth.generate(L=200_000, depth=12, snv_every=500,
                                    seed=3)
    from strelka_tpu.io.fasta import encode_bases
    rc = encode_bases(refs)
    keep, level = rd.filter_and_classify_reads(batch, 20)
    b = batch.select(keep)
    lvl = level[keep]
    assert b.n >= 4096
    pos = b.pos.copy()
    pos[::9] = np.maximum(pos[::9] - 80, 0)
    import dataclasses
    b2 = dataclasses.replace(b, pos=pos)
    pu_py = python_pileup(b2, lvl, rc, 0, 0, len(rc))
    res = native.pileup_native(b2, lvl, rc, 0, 0, len(rc), 17)
    assert res is not None
    compare(pu_py, res[0])


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


def test_neighbor_mm_native_matches_python():
    """The native pileup's per-call neighbor-mismatch flags must match
    the python MMDF path (mismatch_count_ns semantics,
    starling_read_util.cpp:211)."""
    import numpy as np

    from strelka_tpu.io.native import pileup_native
    from strelka_tpu.pipeline import pileup as pl
    from strelka_tpu.pipeline import reads as rd
    from tests.test_pileup import make_batch

    rng = np.random.default_rng(8)
    L = 400
    ref_codes = rng.integers(0, 4, L).astype(np.uint8)
    from strelka_tpu.io.fasta import decode_bases
    refs = decode_bases(ref_codes)
    reads = []
    for k in range(40):
        st = int(rng.integers(0, L - 90))
        rl = 80
        seq = list(refs[st:st + rl])
        # plant clustered mismatches on some reads
        for _ in range(int(rng.integers(0, 4))):
            p = int(rng.integers(0, rl))
            seq[p] = "ACGT"[int(rng.integers(0, 4))]
        reads.append((st, f"{rl}M", "".join(seq), [35] * rl, 0, 60))
    reads.sort(key=lambda r: r[0])
    batch = make_batch(reads)
    level = np.full(batch.n, rd.MapLevel.TIER1, dtype=np.int8)
    ea = rd.expand_alignments(batch)
    res = pileup_native(batch, level, ref_codes, 0, 0, L, min_qscore=17,
                        mm_flank=20, mm_max=2)
    assert res is not None
    pu_n, _ = res
    mmf, _t2, nbm = rd.mismatch_density_filter(
        batch, ea, ref_codes, 0, 20, 2, with_neighbor=True)
    pu_p = pl.build_pileup(batch, ea, level, ref_codes, 0, L,
                           min_qscore=17, mm_filter=mmf, neighbor_mm=nbm)
    # compare per (position, slot) where both are valid
    v = pu_p.valid & pu_n.valid
    assert v.any()
    D = min(pu_n.neighbor_mm.shape[1], pu_p.neighbor_mm.shape[1])
    np.testing.assert_array_equal(
        np.asarray(pu_n.neighbor_mm)[:, :D][v[:, :D]],
        np.asarray(pu_p.neighbor_mm)[:, :D][v[:, :D]])


def test_np_snv_hist_matches_native():
    """_np_snv_hist (the no-library fallback) must produce identical
    integer counts to native snv_hist."""
    import numpy as np

    from strelka_tpu.io.native import snv_hist_native
    from strelka_tpu.models.snv_digt import _np_snv_hist, _SNV_QTAB_SIZE

    rng = np.random.default_rng(4)
    L, D = 300, 24
    base = rng.integers(0, 6, (L, D)).astype(np.int8)
    qual = rng.integers(-2, 70, (L, D)).astype(np.int16)
    mask = rng.random((L, D)) < 0.8
    h1 = np.zeros((L, _SNV_QTAB_SIZE * 4), np.int8)
    ok = snv_hist_native(base, qual, mask, _SNV_QTAB_SIZE, h1)
    if not ok:
        import pytest
        pytest.skip("native library unavailable")
    h2 = np.zeros((L, _SNV_QTAB_SIZE * 4), np.int8)
    _np_snv_hist(base, qual, mask, h2)
    np.testing.assert_array_equal(h1, h2)
