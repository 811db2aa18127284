"""RNA-mode het variant-frequency extension tests vs a scalar
transcription of increment_het_ratio_lhood."""
import numpy as np
import pytest

import jax.numpy as jnp

from strelka_tpu.models import digt, snv_digt
from tests.test_snv_digt import make_tile


def scalar_het_vf(base_ids, quals, extension, increment=0.0501):
    """Direct transcription (position_snp_call_pprob_digt.cpp:262-385)."""
    ln3 = np.float32(np.log(1 / 3))
    ln2 = np.float32(np.log(0.5))
    lhood = np.zeros(10, np.float64)
    for obs, q in zip(base_ids, quals):
        e = np.float32(10.0 ** (-q / 10))
        ce = np.float32(1 - e)
        val = [np.log(e) + ln3, np.log(ce + (1 - ce) / 3) + ln2, np.log(ce)]
        for gt in range(10):
            lhood[gt] += val[digt.EXPECT2[gt, obs]]
    n_steps = 1 + int(extension / increment)
    inc = extension / n_steps
    all_het = lhood.copy()
    for i in range(n_steps):
        r = 0.5 + (i + 1) * inc
        cr = 1 - r
        hi = np.zeros(10)
        lo = np.zeros(10)
        for obs, q in zip(base_ids, quals):
            e = np.float32(10.0 ** (-q / 10))
            ce = np.float32(1 - e)
            vh = [np.log(e) + ln3,
                  np.log(ce * r + (1 - ce) / 3 * cr),
                  np.log(ce * cr + (1 - ce) / 3 * r),
                  np.log(ce)]
            low_remap = [0, 2, 1, 3]
            for gt in range(4, 10):
                k = digt.EXPECT2_BIAS[gt, obs]
                hi[gt] += vh[k]
                lo[gt] += vh[low_remap[k]]
        for gt in range(4, 10):
            m = max(all_het[gt], hi[gt], lo[gt])
            all_het[gt] = m + np.log(np.exp(all_het[gt] - m)
                                     + np.exp(hi[gt] - m) + np.exp(lo[gt] - m))
    for gt in range(4, 10):
        all_het[gt] -= np.log(1 + 2 * n_steps)
    out = lhood.copy()
    out[4:] = all_het[4:]
    return out


def test_het_vf_matches_scalar():
    rng = np.random.default_rng(4)
    b = rng.integers(0, 4, 25)
    q = rng.integers(15, 41, 25)
    f = rng.random(25) < 0.5
    tile = make_tile([(b, q, f, 0)])
    res = snv_digt.call_snv_tile(tile, het_vf_extension=0.45)
    expect = scalar_het_vf(b, q, 0.45)
    np.testing.assert_allclose(np.asarray(res.lhood)[0], expect,
                               rtol=1e-4, atol=5e-3)


def test_het_vf_helps_skewed_ratio():
    # 80/20 allele ratio (allele-specific expression): extension should
    # raise the het lhood substantially
    b = np.array([0] * 24 + [1] * 6)
    q = np.full(30, 35)
    f = np.tile([True, False], 15)
    tile = make_tile([(b, q, f, 0)])
    plain = snv_digt.call_snv_tile(tile)
    ext = snv_digt.call_snv_tile(tile, het_vf_extension=0.45)
    het = digt.LABELS.index("AC")
    assert float(ext.lhood[0, het]) > float(plain.lhood[0, het]) + 3
    # hom lhoods unchanged
    np.testing.assert_allclose(np.asarray(ext.lhood)[0, :4],
                               np.asarray(plain.lhood)[0, :4], atol=1e-4)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


def test_het_vf_with_dependent_eprob():
    """RNA het-VF extension x dependent-eprob adjustment: the chunked
    driver's plane path must match the direct call_snv_tile(dep_delta)
    result, and the extension terms must consume the adjusted mismatch
    term (increment_het_ratio_lhood:297 uses epi.de)."""
    import jax.numpy as jnp
    import numpy as np

    from strelka_tpu.models import snv_digt

    rng = np.random.default_rng(2)
    L, D = 96, 16
    base = rng.integers(0, 4, (L, D)).astype(np.int8)
    base[:, :5] = 1  # stacked same-base calls -> adjustment fires
    qual = np.full((L, D), 32, np.int16)
    fwd = np.zeros((L, D), bool)
    fwd[:, ::2] = True
    used = np.ones((L, D), bool)
    nbmm = np.zeros((L, D), bool)
    ref_gt = np.zeros(L, np.int32)
    s_delta, plane_fn = snv_digt.dependent_eprob_deltas(
        base, qual, used, fwd, nbmm, 0.35, 0.6)
    assert s_delta.sum() > 0
    tile = snv_digt.SnvPileupTile(
        jnp.asarray(base), jnp.asarray(qual.astype(np.int32)),
        jnp.asarray(fwd), jnp.asarray(used), jnp.asarray(ref_gt))
    direct = snv_digt.call_snv_tile(
        tile, het_vf_extension=0.45, compute_sb=False,
        dep_delta=jnp.asarray(plane_fn()))
    chunked = snv_digt.call_snv_tile_chunked(
        tile, het_vf_extension=0.45, dep=(s_delta, plane_fn))
    np.testing.assert_array_equal(np.asarray(direct.snv_qphred),
                                  np.asarray(chunked.snv_qphred))
    np.testing.assert_array_equal(np.asarray(direct.phred_loghood),
                                  np.asarray(chunked.phred_loghood))
    # the adjustment must actually move the het-extended lhoods
    plain = snv_digt.call_snv_tile(tile, het_vf_extension=0.45,
                                   compute_sb=False)
    assert np.abs(np.asarray(direct.lhood)
                  - np.asarray(plain.lhood)).max() > 1.0
