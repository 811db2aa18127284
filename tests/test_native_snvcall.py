"""Native germline SNV call tail (native/snvcall.cpp) vs a scalar
python transcription of its canonical accumulation order, and a
decision-level comparison against the XLA tile path it replaces on the
CPU backend."""
import math

import numpy as np
import pytest

from strelka_tpu.io.native import snv_call_native, snv_hist_native
from strelka_tpu.models import digt
from strelka_tpu.models import snv_digt as sd

TINY = np.finfo(np.float64).tiny


def scalar_oracle(hist, ref_gt, s_mis, haploid, qtab, e0,
                  gp, pp_t, gh, ph):
    """Statement-level mirror of snv_call_tail (sequential ascending
    slot order; f32 lhood; f64 tail with libm exp/log)."""
    L, K = hist.shape
    lhood = np.zeros((L, 10), np.float32)
    outs = {k: np.zeros(L, np.int64) for k in
            ("g_max", "p_max", "snv_q", "g_qmax", "p_qmax")}
    pl = np.zeros((L, 10), np.int64)
    ln_ref = np.zeros(L, np.float64)
    ln10 = math.log(10.0)
    for l in range(L):
        lh = np.zeros(10, np.float32)
        for k in range(K):
            c = int(hist[l, k])
            if c == 0:
                continue
            fc = np.float32(c)
            for g in range(10):
                lh[g] = np.float32(lh[g] + fc * qtab[k, g])
        if s_mis is not None:
            for g in range(10):
                m = np.float32(0.0)
                for b in range(4):
                    m = np.float32(m + np.float32(s_mis[l, b]) * e0[b, g])
                lh[g] = np.float32(lh[g] + m)
        lhood[l] = lh
        ref = int(ref_gt[l])
        refc = min(ref, 3)
        hap = haploid is not None and bool(haploid[l])

        def result_set(prior_row):
            ppv = lh.astype(np.float64) + prior_row
            mx = ppv[0]
            for g in range(1, 10):
                if ppv[g] > mx:
                    mx = ppv[g]
            p = np.array([math.exp(v - mx) for v in ppv])
            s1 = 0.0
            for g in range(10):
                s1 += p[g]
            for g in range(10):
                p[g] = p[g] / s1
            mg = 0
            for g in range(1, 10):
                if ppv[g] > ppv[mg]:
                    mg = g
            total = 0.0
            for g in range(10):
                total += p[g]
            rp = p[refc]
            comp = max(total - p[mg], 0.0)
            qr = min(math.floor(-10.0 * math.log10(max(rp, TINY)) + 0.5),
                     999)
            qm = min(math.floor(-10.0 * math.log10(max(comp, TINY)) + 0.5),
                     999)
            return mg, int(qr), int(qm), math.log(max(rp, TINY))

        gprior = (gh if hap else gp)[ref]
        pprior = (ph if hap else pp_t)[ref]
        mg, qr, qm, lr = result_set(gprior)
        outs["g_max"][l], outs["snv_q"][l], outs["g_qmax"][l] = mg, qr, qm
        ln_ref[l] = lr
        mgp, _qrp, qmp, _ = result_set(pprior)
        outs["p_max"][l], outs["p_qmax"][l] = mgp, qmp
        span = 4 if hap else 10
        lmax = lh[0]
        for g in range(1, span):
            if lh[g] > lmax:
                lmax = lh[g]
        for g in range(10):
            d = np.float32(lh[g] - lmax)
            t = np.float32(np.float32(-10.0) * d)
            u = math.floor(float(t) / ln10 + 0.5)
            pl[l, g] = min(max(u, 0), 999)
    return lhood, outs, pl, ln_ref


def _random_tile(rng, L, D):
    base = rng.integers(0, 4, (L, D)).astype(np.int8)
    qual = rng.integers(2, 42, (L, D)).astype(np.int16)
    mask = rng.random((L, D)) < 0.85
    ref_gt = rng.integers(0, 5, L).astype(np.int8)
    return base, qual, mask, ref_gt


@pytest.mark.parametrize("with_dep,with_hap", [(False, False),
                                               (True, False),
                                               (True, True)])
def test_native_matches_scalar_transcription(with_dep, with_hap):
    rng = np.random.default_rng(3)
    L, D = 80, 24
    base, qual, mask, ref_gt = _random_tile(rng, L, D)
    hist = np.zeros((L, sd._SNV_QTAB_SIZE * 4), np.int8)
    if not snv_hist_native(base, qual, mask, sd._SNV_QTAB_SIZE, hist):
        sd._np_snv_hist(base, qual, mask, hist)
    s_mis = None
    if with_dep:
        s_mis = np.zeros((L, 4), np.float32)
        rows = rng.integers(0, L, 10)
        s_mis[rows, rng.integers(0, 4, 10)] = rng.uniform(
            0.0, 2.0, 10).astype(np.float32)
    hap = None
    if with_hap:
        hap = rng.random(L) < 0.3
    pr = sd.make_ln_priors(0.001)
    qtab = sd._snv_qtab()
    e0 = np.asarray(sd._e0_tab())
    res = snv_call_native(hist, ref_gt, s_mis, hap, qtab, e0,
                          pr["genome"], pr["poly"],
                          pr["genome_haploid"], pr["poly_haploid"])
    assert res is not None, "native library unavailable"
    lhood, g_max, p_max, snv_q, g_qmax, p_qmax, pl, ln_ref = res

    olh, oo, opl, olr = scalar_oracle(
        hist, ref_gt, s_mis, hap, qtab, e0, pr["genome"], pr["poly"],
        pr["genome_haploid"], pr["poly_haploid"])
    np.testing.assert_array_equal(lhood, olh)
    np.testing.assert_array_equal(g_max, oo["g_max"])
    np.testing.assert_array_equal(p_max, oo["p_max"])
    np.testing.assert_array_equal(snv_q, oo["snv_q"])
    np.testing.assert_array_equal(g_qmax, oo["g_qmax"])
    np.testing.assert_array_equal(p_qmax, oo["p_qmax"])
    np.testing.assert_array_equal(pl, opl)
    np.testing.assert_array_equal(ln_ref, olr)


def test_native_decisions_match_device_path():
    """The native path's decisions (genotypes, phred scores) must match
    the XLA hist-tile path up to accumulation-order ulps: genotype
    indices equal, q-scores within 1 phred (flips only at rounding
    boundaries)."""
    import jax.numpy as jnp
    rng = np.random.default_rng(5)
    L, D = 600, 30
    base, qual, mask, ref_gt = _random_tile(rng, L, D)
    hist = np.zeros((L, sd._SNV_QTAB_SIZE * 4), np.int8)
    if not snv_hist_native(base, qual, mask, sd._SNV_QTAB_SIZE, hist):
        sd._np_snv_hist(base, qual, mask, hist)
    pr = sd.make_ln_priors(0.001)
    res = snv_call_native(hist, ref_gt, None, None, sd._snv_qtab(),
                          np.asarray(sd._e0_tab()), pr["genome"],
                          pr["poly"], pr["genome_haploid"],
                          pr["poly_haploid"])
    assert res is not None
    lhood, g_max, p_max, snv_q, g_qmax, p_qmax, pl, ln_ref = res

    dev = sd.call_snv_hist_tile(jnp.asarray(hist),
                                jnp.asarray(ref_gt.astype(np.int32)))
    np.testing.assert_array_equal(g_max, np.asarray(dev.genome_max_gt))
    np.testing.assert_array_equal(p_max, np.asarray(dev.poly_max_gt))
    for a, b in ((snv_q, dev.snv_qphred),
                 (g_qmax, dev.genome_max_gt_qphred),
                 (p_qmax, dev.poly_max_gt_qphred)):
        diff = np.abs(a - np.asarray(b))
        assert diff.max() <= 1, diff.max()
        assert (diff != 0).mean() < 0.01
    pldiff = np.abs(pl - np.asarray(dev.phred_loghood))
    assert pldiff.max() <= 1


def test_pipeline_uses_native_and_device_flag_forces_xla(monkeypatch):
    """The chunked driver takes the native path on CPU and the XLA
    path under STRELKA_TPU_SNV_DEVICE=1; both produce a full
    SnvCallResult with identical genotype decisions."""
    import jax
    if jax.default_backend() != "cpu":
        pytest.skip("cpu-backend test")
    import jax.numpy as jnp
    rng = np.random.default_rng(9)
    L, D = 400, 20
    base, qual, mask, ref_gt = _random_tile(rng, L, D)
    tile = sd.SnvPileupTile(
        base_id=jnp.asarray(base), qual=jnp.asarray(qual),
        is_fwd=jnp.asarray(rng.random((L, D)) < 0.5),
        mask=jnp.asarray(mask), ref_gt=jnp.asarray(ref_gt))
    r_native = sd.call_snv_tile_chunked(tile)
    monkeypatch.setenv("STRELKA_TPU_SNV_DEVICE", "1")
    r_dev = sd.call_snv_tile_chunked(tile)
    np.testing.assert_array_equal(np.asarray(r_native.genome_max_gt),
                                  np.asarray(r_dev.genome_max_gt))
    np.testing.assert_array_equal(np.asarray(r_native.poly_max_gt),
                                  np.asarray(r_dev.poly_max_gt))
    assert np.abs(np.asarray(r_native.snv_qphred)
                  - np.asarray(r_dev.snv_qphred)).max() <= 1
