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
