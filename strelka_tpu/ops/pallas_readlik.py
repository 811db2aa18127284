"""Pallas TPU kernel for read x haplotype likelihood scoring.

The XLA einsum path (ops/readlik.py) streams f32 one-hot tensors from
HBM and materializes the full [B, R, W] score tensor — HBM-bound on
v5e. This kernel:

  - streams int8 base codes + f32 per-base deltas (5 bytes/base instead
    of 16 for f32 one-hot),
  - builds the one-hot expansion in VMEM (4 masked slabs),
  - runs the [R, 4L] @ [4L, W] scoring matmul on the MXU,
  - fuses the max/argmax offset reduction so only [R] best scores +
    offsets leave the chip.

Replaces the reference's scalar scoring loop
(starling_read_align_score.cpp:108-170) as the per-chip speed-of-light
engine (SURVEY.md §2.5 'per-read likelihood hot loop').

Bit-exactness (the engine's hard invariant — best offsets feed
realignment placement and tie-breaks define output,
starling_read_align.cpp:1353,1581-1593):

The default "exact" mode is exact BY CONSTRUCTION, not by tolerance.
Per-base deltas are globally quantized to integer multiples of
2^-QUANT_BITS (ops/readlik.quantized_qscore_luts; QUANT_BITS=11 since
round 4 — the max delta quantizes to 62139 < 2^16, so two base-256
limbs cover the full qual range), so

    d_int = delta * 2^QUANT_BITS            (exact int < 2^16)
          = l1 * 2^8 + l0                   (base-256 limbs, 0..255)

Each limb is exactly representable in bf16 (8-bit mantissa) and the
window one-hot is {0,1}, so every per-element product of the two
one-pass bf16 matmuls is exact, and every partial sum is an integer
< 2^24 — exact in a f32 accumulator REGARDLESS of accumulation order.
The fixed-order combination

    score = (S1*256 + S0) * 2^-QUANT_BITS + lnmis

is elementwise IEEE f32 (identical on every backend); for reads of
<= 256 scored bases even the add is exact (S1*256 <= 2^24 - 2^16), so
the only rounding anywhere is the final + lnmis. Result: the Pallas
kernel, the XLA path (exact_best_offsets), and interpret mode produce
bit-identical scores AND argmax offsets on TPU and CPU, at 2 MXU
row-passes instead of the 6 precision-passes of a f32-HIGHEST matmul
— run as ONE [2R, 4L] @ [4L, W] dot with the limb slabs stacked along
M (stacking measured 1.6x vs dot-per-limb on v5e in round 3; the
2-limb switch cuts slab stores by 1/3 on top — A/B history in
benchmarks/exp_exact_kernel.py). (Round 2's `split3` bf16-
decomposition path had backend-dependent f32 accumulation order — it
tolerated 1% best-offset flips and was removed in favor of this
formulation.) The CPU engine path is native/exactscore.cpp — the same
formulation as bit-parallel base matching + per-qual-group popcounts,
bit-identical by the same argument.

NOTE: the quantized LUT IS the scoring semantic — changing QUANT_BITS
changes scores. The 19->11 switch was re-proven against the somatic
demo golden (byte-identical, CPU and TPU), the mito golden, and the
regenerated germline self-golden (see tests).

mode="highest" keeps the f32-HIGHEST matmul for A/B benchmarking; it
is NOT bit-stable across backends.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .readlik import LIMBS, QUANT_INV, QUANT_SCALE
from .readlik import N_BASE_CODES as N_BASE


def _score_kernel(mode, codes_ref, delta_ref, lnmis_ref, win_ref,
                  best_ref, bestoff_ref, a_scratch, w_scratch):
    """G locus tiles per grid step: reads [R, L] vs windows [L, W].

    codes_ref  [G, R, L] int8   read base codes (>=4 -> no contribution)
    delta_ref  [G, R, L] f32    ln(1-e)-ln(e/3) per base (0 at padding),
                                quantized to 2^-QUANT_BITS multiples
    lnmis_ref  [G, R, 1] f32    sum of ln(e/3) over valid bases
    win_ref    [G, L, W] int8   haplotype window codes, transposed so
                                offsets are the trailing (lane) dim —
                                no in-kernel transpose needed
    best_ref   [G, R, 1] f32    output: max score over offsets
    bestoff_ref[G, R, 1] i32    output: argmax offset (first max)
    a_scratch  [2R, 4L]         bf16 (exact; limb-stacked) / f32 [R, 4L] (highest)
    w_scratch  [4L, W]          bf16 (exact) / f32 (highest)

    Multiple tiles per grid step amortize the per-step grid/pipeline
    overhead.
    """
    G = codes_ref.shape[0]
    R = codes_ref.shape[1]
    L = codes_ref.shape[2]
    wdt = w_scratch.dtype

    if mode == "exact":
        # ROLLED loop over the G tiles (round 5): one lax.fori_loop
        # body instead of G unrolled copies. Per-tile math is identical
        # (same fixed-order ops, same writes), so results stay
        # bit-identical; but Mosaic now amortizes the per-grid-step
        # fixed cost (~2us: grid/DMA orchestration, measured flat in R)
        # over G=8 tiles without the unrolled-body compile blowup that
        # made big-G unrolled kernels slow (r4). Measured 2-3x at the
        # bench shape (benchmarks/exp_exact_kernel.py limb2r@8).
        n_limb = len(LIMBS)

        def body(g, _):
            codes = codes_ref[g].astype(jnp.int32)
            win = win_ref[g].astype(jnp.int32)
            d_int = (delta_ref[g] * QUANT_SCALE).astype(jnp.int32)
            limbs = [((d_int >> shift) & 255).astype(jnp.bfloat16)
                     for shift, _w in LIMBS]
            for b in range(N_BASE):
                m = codes == b
                w_scratch[b * L:(b + 1) * L, :] = (win == b).astype(wdt)
                for j in range(n_limb):
                    a_scratch[j * R:(j + 1) * R,
                              b * L:(b + 1) * L] = jnp.where(
                        m, limbs[j], jnp.bfloat16(0))
            big = jnp.dot(a_scratch[:], w_scratch[:],
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.DEFAULT)  # [2R, W]
            s = None
            for j, (_s, weight) in enumerate(LIMBS):
                part = big[j * R:(j + 1) * R] * weight
                s = part if s is None else s + part
            s = s * QUANT_INV + lnmis_ref[g]
            best_ref[g] = jnp.max(s, axis=1, keepdims=True)
            bestoff_ref[g] = jax.lax.argmax(s, 1, jnp.int32)[:, None]
            return 0

        jax.lax.fori_loop(0, G, body, 0)
        return

    for g in range(G):
        # int8 is the HBM/VMEM transfer type; Mosaic lacks packed-i8
        # vector compares, so widen on the VPU before the one-hot masks
        codes = codes_ref[g].astype(jnp.int32)
        win = win_ref[g].astype(jnp.int32)
        for b in range(N_BASE):
            w_scratch[b * L:(b + 1) * L, :] = (win == b).astype(wdt)
        if mode == "exact":
            n_limb = len(LIMBS)
            d_int = (delta_ref[g] * QUANT_SCALE).astype(jnp.int32)
            limbs = [((d_int >> shift) & 255).astype(jnp.bfloat16)
                     for shift, _ in LIMBS]
            # the limb slabs stack along M into ONE [2R, 4L] dot
            # (measured 1.6x vs dot-per-limb on v5e: fewer MXU
            # invocations, and the per-base masks are computed once)
            for b in range(N_BASE):
                m = codes == b
                for j in range(n_limb):
                    a_scratch[j * R:(j + 1) * R,
                              b * L:(b + 1) * L] = jnp.where(
                        m, limbs[j], jnp.bfloat16(0))
            # one MXU pass; exact (bf16 ints x {0,1}, f32 int sums)
            big = jnp.dot(a_scratch[:], w_scratch[:],
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.DEFAULT)  # [2R, W]
            # fixed-order limb combination — matches exact_best_offsets
            s = None
            for j, (_, weight) in enumerate(LIMBS):
                part = big[j * R:(j + 1) * R] * weight
                s = part if s is None else s + part
            s = s * QUANT_INV
        else:  # "highest": reference 6-pass f32 matmul
            delta = delta_ref[g]
            for b in range(N_BASE):
                a_scratch[:, b * L:(b + 1) * L] = jnp.where(
                    codes == b, delta, 0.0)
            s = jnp.dot(a_scratch[:], w_scratch[:],
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)  # [R, W]
        s = s + lnmis_ref[g]                               # broadcast [R,1]
        best_ref[g] = jnp.max(s, axis=1, keepdims=True)
        bestoff_ref[g] = jax.lax.argmax(s, 1, jnp.int32)[:, None]


def score_best_offsets(codes, delta, lnmis, win_t, interpret: bool = False,
                       mode: str = "exact"):
    """Batched best-offset scoring (Pallas kernel).

    codes  [B, R, L] int8/int32 read base codes
    delta  [B, R, L] f32 (quantized; see module doc)
    lnmis  [B, R]    f32
    win_t  [B, L, W] int8/int32 per-offset haplotype windows, offset-
                     major in the trailing dim (win_t[b, l, w] = base at
                     window position l of offset w)
    returns (best [B, R] f32, best_off [B, R] i32)

    mode="exact" (default) is bit-identical to exact_best_offsets on
    every backend; mode="highest" keeps the f32-HIGHEST matmul.

    Mosaic rejects int64 index types, so the kernel is traced with x64
    disabled (the engine otherwise enables x64 for posterior math).
    """
    with jax.enable_x64(False):
        return _score_best_offsets(codes, delta, lnmis, win_t, interpret,
                                   mode)


def _pick_g(B, R, L, W, mode):
    """Tiles per grid step: amortizes grid overhead, bounded by Mosaic
    compile time (superlinear in the unrolled body) and VMEM."""
    elt = 2 if mode == "exact" else 4
    a_rows = len(LIMBS) * R if mode == "exact" else R
    slabs = (a_rows * N_BASE * L + N_BASE * L * W) * elt

    def est(g):
        io = g * (R * L * 5 + R * 4 + L * W + R * 8) * 2  # double-buffered
        return io + slabs

    # exact mode runs a ROLLED loop over the tiles: G=8 amortizes the
    # per-grid-step fixed cost with no unrolled-body blowup (r5 A/B:
    # limb2r@8 2-3x over unrolled G=2; benchmarks/exp_exact_kernel.py).
    # The unrolled "highest" path keeps r4's G=2 (unrolled G4/G8 were
    # slower).
    G = 8 if mode == "exact" else 2
    while G > 1 and (B % G or est(G) > 10 * 2**20):
        G //= 2
    return G


@functools.partial(jax.jit, static_argnames=("interpret", "mode"))
def _score_best_offsets(codes, delta, lnmis, win_t,
                        interpret: bool = False, mode: str = "exact"):
    B, R, L = codes.shape
    W = win_t.shape[2]
    codes = codes.astype(jnp.int8)
    win_t = win_t.astype(jnp.int8)
    lnmis2 = lnmis[..., None]
    sdt = jnp.bfloat16 if mode == "exact" else jnp.float32

    G = _pick_g(B, R, L, W, mode)
    grid = (B // G,)
    out = pl.pallas_call(
        functools.partial(_score_kernel, mode),
        grid=grid,
        in_specs=[
            pl.BlockSpec((G, R, L), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, R, L), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, R, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, L, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((G, R, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, R, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, R, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, R, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((len(LIMBS) * R if mode == "exact" else R,
                        N_BASE * L), sdt),
            pltpu.VMEM((N_BASE * L, W), sdt),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * R * N_BASE * L * W
            * (len(LIMBS) if mode == "exact" else 1),
            bytes_accessed=B * (R * L * 5 + L * W + R * 8),
            transcendentals=0,
        ),
        interpret=interpret,
    )(codes, delta, lnmis2, win_t)
    best, best_off = out
    return best[..., 0], best_off[..., 0]


@jax.jit
def exact_best_offsets(codes, delta, lnmis, win_t):
    """XLA implementation of the exact limb formulation — the engine's
    CPU-backend scoring path AND the oracle the Pallas kernel must
    match bit-for-bit (scores and argmax offsets) on any backend.

    Same layout as score_best_offsets: win_t is [B, L, W] offset-major.
    Exactness argument in the module docstring; on TPU the f32-HIGHEST
    einsum of bf16-representable integers is also exact, so this
    function is backend-independent too.
    """
    codes = codes.astype(jnp.int32)
    win = win_t.astype(jnp.int32)
    d_int = (delta * QUANT_SCALE).astype(jnp.int32)
    oh_r = codes[..., None] == jnp.arange(N_BASE, dtype=jnp.int32)  # [B,R,L,4]
    oh_w = jax.nn.one_hot(win, N_BASE, dtype=jnp.float32)           # [B,L,W,4]
    s = None
    for shift, weight in LIMBS:
        limb = ((d_int >> shift) & 255).astype(jnp.float32)
        a = jnp.where(oh_r, limb[..., None], 0.0)
        part = jnp.einsum("brlc,blwc->brw", a, oh_w,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        part = part * weight
        s = part if s is None else s + part
    s = s * QUANT_INV + lnmis[..., None]
    return jnp.max(s, axis=-1), jnp.argmax(s, axis=-1).astype(jnp.int32)


@jax.jit
def reference_best_offsets(codes, delta, lnmis, win_t):
    """f32-HIGHEST einsum oracle for the mode="highest" kernel path
    (testing only — NOT bit-stable across backends; the engine runs
    exact_best_offsets / mode="exact")."""
    onehot_r = jax.nn.one_hot(codes, N_BASE, dtype=jnp.float32)
    a = (onehot_r * delta[..., None])
    onehot_w = jax.nn.one_hot(win_t, N_BASE, dtype=jnp.float32)
    s = jnp.einsum("brlc,blwc->brw", a, onehot_w,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    s = s + lnmis[..., None]
    return jnp.max(s, axis=-1), jnp.argmax(s, axis=-1).astype(jnp.int32)
