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


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
