"""Validate the batched SNV caller against a direct scalar port of the
reference math (position_snp_call_pprob_digt.cpp), the same way the
reference unit-tests its caller with synthetic pileups."""
import numpy as np
import pytest

import strelka_tpu  # noqa: F401  (enables x64)
from strelka_tpu.models import digt, snv_digt

import jax.numpy as jnp


def scalar_lhood(base_ids, quals, ref_gt=None, force_ref_mask=None):
    """Direct scalar transcription of get_diploid_gt_lhood."""
    lhood = np.zeros(digt.SIZE, dtype=np.float32)
    ln3 = np.float32(np.log(1 / 3))
    ln2 = np.float32(np.log(0.5))
    for obs, q, forced in zip(
        base_ids, quals,
        force_ref_mask if force_ref_mask is not None else [False] * len(base_ids),
    ):
        e = np.float32(10.0 ** (-q / 10))
        ce = np.float32(1.0 - e)
        val = np.array([
            np.log(e) + ln3,
            np.log(ce + (1 - ce) / 3) + ln2,
            np.log(ce),
        ], dtype=np.float32)
        for gt in range(digt.SIZE):
            g = ref_gt if forced else gt
            lhood[gt] += val[digt.EXPECT2[g, obs]]
    return lhood


def scalar_result_set(lhood, ln_prior, ref_gt):
    pp = lhood.astype(np.float64) + ln_prior
    mx = pp.max()
    p = np.exp(pp - mx)
    p /= p.sum()
    max_gt = int(np.argmax(pp))
    comp = p.sum() - p[max_gt]
    q_ref = min(999, round(-10 * np.log10(max(p[ref_gt], 1e-300))))
    q_max = min(999, round(-10 * np.log10(max(comp, 1e-300))))
    return p, max_gt, q_ref, q_max


def make_tile(columns):
    """columns: list of (base_ids, quals, fwd_flags, ref_gt)."""
    L = len(columns)
    D = max(len(c[0]) for c in columns)
    base = np.zeros((L, D), np.int32)
    qual = np.zeros((L, D), np.int32)
    fwd = np.zeros((L, D), bool)
    mask = np.zeros((L, D), bool)
    refg = np.zeros(L, np.int32)
    for i, (b, q, f, r) in enumerate(columns):
        n = len(b)
        base[i, :n] = b
        qual[i, :n] = q
        fwd[i, :n] = f
        mask[i, :n] = True
        refg[i] = r
    return snv_digt.SnvPileupTile(
        base_id=jnp.asarray(base), qual=jnp.asarray(qual),
        is_fwd=jnp.asarray(fwd), mask=jnp.asarray(mask),
        ref_gt=jnp.asarray(refg),
    )


def test_lhood_matches_scalar():
    rng = np.random.default_rng(0)
    cols = []
    for _ in range(40):
        depth = rng.integers(1, 30)
        b = rng.integers(0, 4, depth)
        q = rng.integers(2, 41, depth)
        f = rng.random(depth) < 0.5
        cols.append((b, q, f, int(rng.integers(0, 4))))
    tile = make_tile(cols)
    res = snv_digt.call_snv_tile(tile, theta=0.001)
    for i, (b, q, f, r) in enumerate(cols):
        expect = scalar_lhood(b, q)
        np.testing.assert_allclose(np.asarray(res.lhood)[i], expect, rtol=2e-5, atol=2e-4)


def test_posteriors_and_q_match_scalar():
    rng = np.random.default_rng(1)
    priors = snv_digt.make_ln_priors(0.001)
    cols = []
    for _ in range(50):
        depth = rng.integers(2, 40)
        r = int(rng.integers(0, 4))
        # mostly-ref pileup with occasional alt
        b = np.where(rng.random(depth) < 0.8, r, rng.integers(0, 4, depth))
        q = rng.integers(10, 41, depth)
        f = rng.random(depth) < 0.5
        cols.append((b, q, f, r))
    tile = make_tile(cols)
    res = snv_digt.call_snv_tile(tile, theta=0.001)
    for i, (b, q, f, r) in enumerate(cols):
        lh = scalar_lhood(b, q)
        p, max_gt, q_ref, q_max = scalar_result_set(lh, priors["genome"][r], r)
        assert int(res.genome_max_gt[i]) == max_gt
        assert abs(int(res.snv_qphred[i]) - q_ref) <= 1  # float-assoc rounding slack
        assert abs(int(res.genome_max_gt_qphred[i]) - q_max) <= 1


def test_hom_alt_site_is_called():
    # 20x C over ref A at q30 -> confident CC call
    b = np.full(20, 1)
    q = np.full(20, 30)
    f = np.tile([True, False], 10)
    tile = make_tile([(b, q, f, 0)])
    res = snv_digt.call_snv_tile(tile)
    assert int(res.genome_max_gt[0]) == digt.LABELS.index("CC")
    assert int(res.snv_qphred[0]) > 100


def test_het_site_is_called():
    b = np.array([0, 1] * 15)
    q = np.full(30, 30)
    f = np.tile([True, False], 15)
    tile = make_tile([(b, q, f, 0)])
    res = snv_digt.call_snv_tile(tile)
    assert digt.LABELS[int(res.genome_max_gt[0])] == "AC"


def test_strand_bias_detects_artifact():
    # alt only on fwd strand -> high SB; balanced alt -> low SB
    b = np.array([0] * 10 + [1] * 10)
    q = np.full(20, 30)
    f_biased = np.array([True] * 5 + [False] * 5 + [True] * 10)
    f_balanced = np.tile([True, False], 10)
    t1 = make_tile([(b, q, f_biased, 0)])
    t2 = make_tile([(b, q, f_balanced, 0)])
    sb1 = float(snv_digt.call_snv_tile(t1).strand_bias[0])
    sb2 = float(snv_digt.call_snv_tile(t2).strand_bias[0])
    assert sb1 > sb2


def test_haploid_prior_blocks_het():
    b = np.array([0, 1] * 15)
    q = np.full(30, 30)
    f = np.tile([True, False], 15)
    tile = make_tile([(b, q, f, 0)])
    res = snv_digt.call_snv_tile(tile, is_haploid=jnp.array([True]))
    assert not digt.IS_HET[int(res.genome_max_gt[0])]


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


def test_dependent_eprob_oracle():
    """Scalar transcription of blt_common/adjust_joint_eprob.cpp
    (get_dependent_eprob :58-69 + adjust_icalls_eprob :96-186) vs the
    native/vectorized dependent_eprob_deltas."""
    import math

    import numpy as np

    from strelka_tpu.models import snv_digt

    def oracle(base, qual, used, fwd, nbmm, ssd_no, ssd_one):
        L, D = base.shape
        plane = np.zeros((L, D))
        for l in range(L):
            for g in range(8):
                gb, gf = g >> 1, g & 1
                mem = [d for d in range(D)
                       if used[l, d] and base[l, d] == gb
                       and (1 if fwd[l, d] else 0) == gf
                       and qual[l, d] >= 3]
                if not mem:
                    continue
                lnran = math.log(0.75)
                num = den = 0.0
                for d in mem:
                    e = 10.0 ** (-qual[l, d] / 10.0)
                    w = lnran - math.log(e)
                    den += w
                    if nbmm[l, d]:
                        num += w
                mfrac = num / den if den > 0 else 0.0
                vexp_frac = (1 - mfrac) * ssd_no + mfrac * ssd_one
                mem.sort(key=lambda d: -qual[l, d])
                vexp = 1.0
                for d in mem:
                    e = 10.0 ** (-qual[l, d] / 10.0)
                    val = e ** vexp
                    frac = (1 - val) / (1 - e)
                    de = max(e, frac * val + (1 - frac) * 0.75)
                    plane[l, d] = math.log(de) - math.log(e)
                    vexp *= 1 - vexp_frac
        return plane

    rng = np.random.default_rng(9)
    L, D = 40, 24
    base = rng.integers(0, 5, (L, D)).astype(np.int8)
    qual = rng.integers(0, 42, (L, D)).astype(np.int16)
    used = rng.random((L, D)) < 0.8
    fwd = rng.random((L, D)) < 0.5
    nbmm = rng.random((L, D)) < 0.3
    s_delta, plane_fn = snv_digt.dependent_eprob_deltas(
        base, qual, used, fwd, nbmm, 0.35, 0.6)
    want = oracle(base, qual, used, fwd, nbmm, 0.35, 0.6)
    got = plane_fn()
    # per-call planes match where quals are unique; at equal-q ties the
    # multiset per group is what matters -> compare per-(site, base)
    # group SUMS (the only aggregation the likelihood consumes)
    for b in range(4):
        wsum = np.where(used & (base == b), want, 0).sum(axis=1)
        gsum = np.where(used & (base == b), got, 0).sum(axis=1)
        np.testing.assert_allclose(gsum, wsum, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(s_delta[:, b], wsum, rtol=1e-5,
                                   atol=1e-5)
    # python fallback agrees with native
    sd2, plane2 = snv_digt._dependent_eprob_python(
        base, qual, used, fwd, nbmm, 0.35, 0.6)
    np.testing.assert_allclose(sd2, s_delta, rtol=1e-5, atol=1e-5)


def test_rna_strand_bias_finite_with_padding():
    """RNA-mode strand bias must stay finite when the tile has masked
    padding rows (qual 0): the het-VF extension's concordant-call term
    ln(1-e) hits ln(0) there, and the strand-forced ref keys (key==3,
    increment_het_ratio_lhood:305-311) select it, so an unfloored
    -inf * mask-0 product poisons the sum to nan (found by the RNA EVS
    e2e: SB=nan flipped demo sites 1271/1508 to LowGQX)."""
    import jax.numpy as jnp

    from strelka_tpu.models import snv_digt as sd

    L, D = 8, 16
    base = np.zeros((L, D), np.int8)
    qual = np.zeros((L, D), np.int8)
    fwd = np.zeros((L, D), bool)
    mask = np.zeros((L, D), bool)
    base[0, :10] = [0, 0, 0, 0, 0, 2, 2, 2, 2, 2]   # ref A, het A/G
    qual[0, :10] = 30
    fwd[0, :10] = [1, 0, 1, 0, 1, 0, 1, 0, 1, 0]
    mask[0, :10] = True
    tile = sd.SnvPileupTile(
        base_id=jnp.asarray(base), qual=jnp.asarray(qual),
        is_fwd=jnp.asarray(fwd), mask=jnp.asarray(mask),
        ref_gt=jnp.asarray(np.zeros(L, np.int8)))
    tgt = np.zeros(L, np.int32)
    tgt[0] = 5   # A/G
    sb = sd.snv_strand_bias_tile(
        tile, jnp.asarray(tgt), jnp.zeros(L, jnp.float32), None,
        0.45, 0.0501)
    assert np.isfinite(np.asarray(sb)).all()
