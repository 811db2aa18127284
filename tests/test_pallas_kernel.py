"""Scoring-kernel semantics on CPU (interpret mode).

The default "exact" path must be BIT-IDENTICAL — scores and argmax
offsets — to the XLA exact_best_offsets oracle, including adversarial
near-ties and exact ties (best offsets feed realignment placement and
tie-breaks define output, starling_read_align.cpp:1353,1581-1593).
The real-chip byte-parity gate is benchmarks/tpu_demo_parity.py.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from strelka_tpu.ops import pallas_readlik as pk
from strelka_tpu.ops import readlik as rl


def make_inputs(rng, B=4, R=16, L=128, W=128):
    delta_lut, lmis_lut = rl.quantized_qscore_luts()
    q = rng.integers(2, 42, (B, R, L))
    delta = jnp.asarray(delta_lut[q])
    codes = jnp.asarray(rng.integers(0, 5, (B, R, L)), jnp.int8)
    lnmis = jnp.asarray(
        np.where(np.asarray(codes) < 4, lmis_lut[q], 0.0)
        .sum(axis=2).astype(np.float32))
    win_t = jnp.asarray(rng.integers(0, 5, (B, L, W)), jnp.int8)
    return codes, delta, lnmis, win_t


@pytest.fixture(scope="module")
def inputs():
    return make_inputs(np.random.default_rng(0))


def test_exact_kernel_bit_identical(inputs):
    codes, delta, lnmis, win_t = inputs
    rb, ro = pk.exact_best_offsets(codes, delta, lnmis, win_t)
    kb, ko = pk.score_best_offsets(codes, delta, lnmis, win_t,
                                   interpret=True, mode="exact")
    np.testing.assert_array_equal(np.asarray(rb), np.asarray(kb))
    np.testing.assert_array_equal(np.asarray(ro), np.asarray(ko))


def test_exact_kernel_near_ties_bit_identical():
    """Adversarial placements: windows that tie exactly (duplicated
    content) and near-ties whose scores differ by a single low-quality
    base (~1e-5 ln units). Exact ties must resolve to the FIRST
    (lowest) offset on both paths; near-ties must never flip."""
    rng = np.random.default_rng(7)
    B, R, L, W = 8, 32, 128, 128
    delta_lut, lmis_lut = rl.quantized_qscore_luts()
    read = rng.integers(0, 4, (L,))
    q = np.full((B, R, L), 2)  # q=2: smallest nonzero delta (~0.56)
    codes = np.broadcast_to(read, (B, R, L)).copy()
    # haplotype = the read content tiled, so MANY offsets tie exactly
    hp = np.tile(read, 3)
    win_t = np.stack([hp[l:l + W] for l in range(L)], axis=0)
    win_t = np.broadcast_to(win_t, (B, L, W)).copy()
    # perturb one window base per batch member at a mid offset: offset
    # 37's score now differs from the tied pool by exactly one q=2 delta
    for b in range(B):
        l = int(rng.integers(0, L))
        win_t[b, l, 37] = (win_t[b, l, 37] + 1) % 4
    delta = jnp.asarray(delta_lut[q])
    lnmis = jnp.asarray(lmis_lut[q].sum(axis=2).astype(np.float32))
    codes = jnp.asarray(codes, jnp.int8)
    win_t = jnp.asarray(win_t, jnp.int8)
    rb, ro = pk.exact_best_offsets(codes, delta, lnmis, win_t)
    kb, ko = pk.score_best_offsets(codes, delta, lnmis, win_t,
                                   interpret=True, mode="exact")
    np.testing.assert_array_equal(np.asarray(rb), np.asarray(kb))
    np.testing.assert_array_equal(np.asarray(ro), np.asarray(ko))
    # exact ties resolve to the first tiling period (offset 0)
    assert int(np.asarray(ro).min()) == 0


def test_exact_matches_scalar_oracle(inputs):
    """Scalar f64 transcription of the scoring math (reference
    emission: starling_read_align_score.cpp:120-168): sum lmis over
    called bases + sum delta over matches. The kernel's only roundings
    are the fixed-order limb combination (<= ~1e-4 on O(1e3) sums)."""
    codes, delta, lnmis, win_t = inputs
    c = np.asarray(codes)
    d = np.asarray(delta, dtype=np.float64)
    m = np.asarray(lnmis, dtype=np.float64)
    w = np.asarray(win_t)
    B, R, L = c.shape
    W = w.shape[2]
    kb, ko = pk.exact_best_offsets(codes, delta, lnmis, win_t)
    for b in range(B):
        for r in range(0, R, 5):
            s = np.full(W, m[b, r])
            for o in range(W):
                match = (c[b, r] == w[b, :, o]) & (c[b, r] < 4)
                s[o] += d[b, r][match].sum()
            assert abs(s.max() - float(kb[b, r])) < 2e-4
            assert s.argmax() == int(ko[b, r]) or np.isclose(
                s[int(ko[b, r])], s.max(), atol=1e-9)


def test_highest_path_matches_reference(inputs):
    codes, delta, lnmis, win_t = inputs
    rb, ro = pk.reference_best_offsets(codes, delta, lnmis, win_t)
    kb, ko = pk.score_best_offsets(codes, delta, lnmis, win_t,
                                   interpret=True, mode="highest")
    np.testing.assert_array_equal(np.asarray(ro), np.asarray(ko))
    np.testing.assert_allclose(np.asarray(rb), np.asarray(kb),
                               rtol=0, atol=1e-4)


def test_quantized_lut_invariants():
    delta_lut, _ = rl.quantized_qscore_luts()
    d_int = delta_lut.astype(np.float64) * 2.0 ** rl.QUANT_BITS
    # exact integers, non-negative, three 8-bit limbs suffice
    np.testing.assert_array_equal(d_int, np.round(d_int))
    assert d_int.min() >= 0
    assert d_int.max() < 2 ** 24
    # bf16-exactness of limbs: every limb is an integer < 256
    for shift, _ in rl.LIMBS:
        limb = (d_int.astype(np.int64) >> shift) & 255
        assert limb.max() < 256


def test_scores_independent_of_cobatched_rows():
    """The engine invariant (CLAUDE.md): per-read scores must not
    depend on what else is in the batch. Exactness makes this hold
    bitwise: score tile 0 alone vs inside a larger batch."""
    rng = np.random.default_rng(3)
    codes, delta, lnmis, win_t = make_inputs(rng, B=8)
    b_all = pk.exact_best_offsets(codes, delta, lnmis, win_t)
    b_one = pk.exact_best_offsets(codes[:1], delta[:1], lnmis[:1],
                                  win_t[:1])
    np.testing.assert_array_equal(np.asarray(b_all[0])[0],
                                  np.asarray(b_one[0])[0])
    np.testing.assert_array_equal(np.asarray(b_all[1])[0],
                                  np.asarray(b_one[1])[0])
    k_all = pk.score_best_offsets(codes, delta, lnmis, win_t,
                                  interpret=True)
    k_one = pk.score_best_offsets(codes[:1], delta[:1], lnmis[:1],
                                  win_t[:1], interpret=True)
    np.testing.assert_array_equal(np.asarray(k_all[0])[0],
                                  np.asarray(k_one[0])[0])
    np.testing.assert_array_equal(np.asarray(k_all[1])[0],
                                  np.asarray(k_one[1])[0])


def test_per_locus_path_bit_identical_to_batched():
    """ops/readlik.score_all_offsets (per-locus) uses the same limb
    formulation: for matching window geometry its best scores equal
    the batched kernel's bitwise."""
    rng = np.random.default_rng(11)
    R, L, W = 8, 64, 33
    Lh = L + W - 1
    delta_lut, lmis_lut = rl.quantized_qscore_luts()
    seqs = rng.integers(0, 5, (R, L)).astype(np.uint8)
    quals = rng.integers(2, 42, (R, L)).astype(np.int32)
    mask = np.ones((R, L), dtype=bool)
    hap = rng.integers(0, 5, (1, Lh)).astype(np.uint8)
    tile = rl.build_read_tile(seqs, quals, mask)
    oh = rl.build_hap_onehot(hap)
    (best, off) = rl.score_reads_vs_haps(tile, oh)
    # batched path on the same geometry
    codes = jnp.asarray(seqs[None], jnp.int8)
    delta = jnp.asarray(np.where(seqs < 4, delta_lut[quals], 0.0)
                        .astype(np.float32)[None])
    lnmis = jnp.asarray(np.where(seqs < 4, lmis_lut[quals], 0.0)
                        .sum(axis=1).astype(np.float32)[None])
    win_t = jnp.asarray(
        np.stack([hap[0][l:l + W] for l in range(L)], axis=0)[None],
        jnp.int8)
    bb, bo = pk.exact_best_offsets(codes, delta, lnmis, win_t)
    np.testing.assert_array_equal(
        np.asarray(best)[:, 0], np.asarray(bb)[0])
    np.testing.assert_array_equal(
        np.asarray(off)[:, 0], np.asarray(bo)[0])


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


def test_native_cpu_scorer_bit_identical(inputs):
    """native/exactscore.cpp must reproduce exact_best_offsets bitwise
    (scores and first-max argmax offsets) — it is the CPU production
    path in realign_batch."""
    from strelka_tpu.io.native import exact_score_best_offsets_native
    codes, delta, lnmis, win_t = inputs
    res = exact_score_best_offsets_native(
        np.asarray(codes), np.asarray(delta), np.asarray(lnmis),
        np.asarray(win_t))
    assert res is not None
    rb, ro = pk.exact_best_offsets(codes, delta, lnmis, win_t)
    np.testing.assert_array_equal(res[0], np.asarray(rb))
    np.testing.assert_array_equal(res[1], np.asarray(ro))


def test_native_cpu_scorer_ties(inputs):
    """Exact ties must resolve to the first offset, like jnp.argmax."""
    from strelka_tpu.io.native import exact_score_best_offsets_native
    rng = np.random.default_rng(5)
    B, R, L, W = 2, 8, 64, 32
    read = rng.integers(0, 4, (L,))
    codes = np.broadcast_to(read, (B, R, L)).astype(np.int8).copy()
    delta_lut, lmis_lut = rl.quantized_qscore_luts()
    q = np.full((B, R, L), 30)
    delta = delta_lut[q].astype(np.float32)
    lnmis = lmis_lut[q].sum(axis=2).astype(np.float32)
    hp = np.tile(read, 2)
    win_t = np.stack([hp[l:l + W] for l in range(L)], 0)
    win_t = np.broadcast_to(win_t, (B, L, W)).astype(np.int8).copy()
    res = exact_score_best_offsets_native(codes, delta, lnmis, win_t)
    rb, ro = pk.exact_best_offsets(
        jnp.asarray(codes), jnp.asarray(delta), jnp.asarray(lnmis),
        jnp.asarray(win_t))
    np.testing.assert_array_equal(res[0], np.asarray(rb))
    np.testing.assert_array_equal(res[1], np.asarray(ro))
