"""Oracle test for the histogram->matmul somatic grid kernel.

The dense per-call formulation below is the direct transcription of
position_somatic_snv_strand_grid_lhood_cached.cpp (each basecall
contributes ln((1-e)(1-f) + (e/3)f) etc.); freq_grid_lhoods computes
the same sums as qscore-histogram matmuls against het_ratio_cache-style
tables. They must agree to f32 tolerance, including the q=0 ln(0)
-inf corner cases.
"""
import numpy as np

from strelka_tpu.models import somatic_snv as ss


def _dense_oracle(base_id, qual, mask, is_fwd, ref_gt):
    L, D = base_id.shape
    F = np.asarray(ss.FRACTIONS, np.float64)
    R = np.asarray(ss.STRAND_FRACTIONS, np.float64)
    out = np.zeros((L, ss.GRID_SIZE))
    with np.errstate(divide="ignore"):
        for li in range(L):
            lh = np.zeros(len(F))
            lf = np.zeros(len(R))
            lr = np.zeros(len(R))
            for d in range(D):
                if not mask[li, d]:
                    continue
                e = 10.0 ** (-float(qual[li, d]) / 10.0)
                ce = 1.0 - e
                if base_id[li, d] == ref_gt[li]:
                    lh += np.log(ce * (1 - F) + (e / 3.0) * F)
                    on = np.log(ce * (1 - R) + (e / 3.0) * R)
                    off = np.full(len(R), np.log(ce))
                else:
                    lh += np.log(ce * F + (e / 3.0) * (1 - F))
                    on = np.log(ce * R + (e / 3.0) * (1 - R))
                    off = np.full(len(R), np.log(e) + np.log(1 / 3.0))
                if is_fwd[li, d]:
                    lf += on
                    lr += off
                else:
                    lf += off
                    lr += on
            out[li, :len(F)] = lh
            out[li, len(F):] = np.logaddexp(lf, lr) + np.log(0.5)
    return out


def test_matmul_kernel_matches_dense_oracle():
    rng = np.random.default_rng(9)
    L, D = 64, 24
    base = rng.integers(0, 4, (L, D)).astype(np.int8)
    qual = rng.integers(2, 41, (L, D)).astype(np.int16)
    mask = rng.random((L, D)) < 0.9
    fwd = rng.random((L, D)) < 0.5
    ref_gt = rng.integers(0, 4, L).astype(np.int32)
    got = np.asarray(ss.freq_grid_lhoods(base, qual, mask, fwd, ref_gt))
    exp = _dense_oracle(base, qual, mask, fwd, ref_gt)
    assert np.allclose(got, exp, rtol=2e-4, atol=2e-3)


def test_matmul_kernel_q0_neg_inf_cases():
    # q=0 basecalls: ln(1-e) = ln 0. A q=0 ref call forces the f=0
    # (REF) state and the off-strand sums to -inf; a q=0 alt call
    # forces the f=1 (HOM) state to -inf.
    base = np.zeros((3, 2), np.int8)
    qual = np.zeros((3, 2), np.int16)
    mask = np.ones((3, 2), bool)
    fwd = np.array([[True, True], [False, False], [True, False]])
    ref_gt = np.array([0, 0, 1], np.int32)  # rows 0,1: ref calls; row 2: alt
    got = np.asarray(ss.freq_grid_lhoods(base, qual, mask, fwd, ref_gt))
    exp = _dense_oracle(base, qual, mask, fwd, ref_gt)
    assert np.array_equal(np.isneginf(got), np.isneginf(exp))
    fin = np.isfinite(exp)
    assert np.allclose(got[fin], exp[fin], rtol=2e-4, atol=2e-3)
    # ref calls at q=0 kill the REF state
    assert np.isneginf(got[0, 0]) and np.isneginf(got[1, 0])
    # alt call at q=0 kills the HOM state
    assert np.isneginf(got[2, 1])


def test_capped_call_matches_uncapped_rowwise():
    # The tunneled TPU backend deterministically miscompiles the joint
    # posterior at batch heights >= 32768 (row-local math changes with
    # batch height; docs/tpu_backend_shape_bug.md). Production routes
    # through somatic_snv_call_capped, which chunks at SNV_CALL_ROW_CAP
    # rows. On CPU both paths are correct, so capped must equal
    # uncapped row-for-row across a chunk boundary, including a ragged
    # tail.
    rng = np.random.default_rng(11)
    L = ss.SNV_CALL_ROW_CAP + 1237
    G = ss.GRID_SIZE
    nl = -np.abs(rng.normal(80, 40, (L, G))).astype(np.float32)
    tl = -np.abs(rng.normal(80, 40, (L, G))).astype(np.float32)
    full = ss.somatic_snv_call(nl, tl)
    capped = ss.somatic_snv_call_capped(nl, tl)
    for f in type(full)._fields:
        assert np.array_equal(np.asarray(getattr(full, f)),
                              np.asarray(getattr(capped, f))), f


def test_capped_call_is_wired_into_the_caller():
    # the production run_tier must never launch the posterior above the
    # cap (the cliff sits at 32768; the cap keeps a 2x margin)
    import inspect

    from strelka_tpu.pipeline import somatic_caller as sc
    assert ss.SNV_CALL_ROW_CAP <= 16384
    src = inspect.getsource(sc)
    assert "somatic_snv_call_capped(" in src
    # no direct uncapped production call remains in the caller
    assert "ss.somatic_snv_call(" not in src
