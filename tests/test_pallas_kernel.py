"""Pallas scoring-kernel semantics on CPU (interpret mode): both
precision paths must reproduce the XLA reference implementation.
The real-chip byte-parity gate is benchmarks/tpu_demo_parity.py."""
import numpy as np
import pytest

import jax.numpy as jnp

from strelka_tpu.ops import pallas_readlik as pk


@pytest.fixture(scope="module")
def inputs():
    B, R, L, W = 4, 16, 128, 128
    rng = np.random.default_rng(0)
    q = rng.integers(2, 42, (B, R, L))
    e = np.minimum(10.0 ** (-q / 10.0), 0.75)
    delta = jnp.asarray((np.log1p(-e) - np.log(e / 3.0)).astype(np.float32))
    codes = jnp.asarray(rng.integers(0, 5, (B, R, L)), jnp.int8)
    lnmis = jnp.asarray(rng.normal(-100, 10, (B, R)).astype(np.float32))
    win = jnp.asarray(rng.integers(0, 5, (B, W, L)), jnp.int8)
    return codes, delta, lnmis, win


def test_highest_path_matches_reference(inputs):
    codes, delta, lnmis, win = inputs
    rb, ro = pk.reference_best_offsets(codes, delta, lnmis, win)
    kb, ko = pk.score_best_offsets(codes, delta, lnmis, win,
                                   interpret=True, split3=False)
    np.testing.assert_array_equal(np.asarray(ro), np.asarray(ko))
    np.testing.assert_allclose(np.asarray(rb), np.asarray(kb),
                               rtol=0, atol=1e-4)


def test_split3_path_matches_reference(inputs):
    codes, delta, lnmis, win = inputs
    rb, ro = pk.reference_best_offsets(codes, delta, lnmis, win)
    kb, ko = pk.score_best_offsets(codes, delta, lnmis, win,
                                   interpret=True, split3=True)
    # the bf16 3-way split is exact per element; only sub-pass
    # accumulation order can differ (~1 ulp on O(100) scores)
    np.testing.assert_allclose(np.asarray(rb), np.asarray(kb),
                               rtol=0, atol=1e-4)
    assert (np.asarray(ro) == np.asarray(ko)).mean() > 0.99


def test_bf16_three_way_split_is_exact():
    # delta = hi + mid + lo reconstructs the f32 exactly: residuals
    # shrink by >=8 bits per level and f32 has 24 mantissa bits
    rng = np.random.default_rng(1)
    q = rng.integers(2, 42, 100_000)
    e = np.minimum(10.0 ** (-q / 10.0), 0.75)
    a = (np.log1p(-e) - np.log(e / 3.0)).astype(np.float32)
    hi = a.astype(jnp.bfloat16).astype(np.float32)
    r1 = a - hi
    mid = r1.astype(jnp.bfloat16).astype(np.float32)
    lo = (r1 - mid).astype(jnp.bfloat16).astype(np.float32)
    recon = (hi + mid) + lo
    assert (recon == a).all()


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
