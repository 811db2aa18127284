"""Pallas TPU kernel for read x haplotype likelihood scoring.

The XLA einsum path (ops/readlik.py) streams f32 one-hot tensors from
HBM and materializes the full [B, R, W] score tensor — HBM-bound at
~14 TFLOP/s on v5e. This kernel:

  - streams int8 base codes + f32 per-base deltas (5 bytes/base instead
    of 16 for f32 one-hot),
  - builds the one-hot expansion in VMEM (4 masked slabs),
  - runs the [R, 4L] @ [4L, W] scoring matmul on the MXU,
  - fuses the max/argmax offset reduction so only [R] best scores +
    offsets leave the chip.

Replaces the reference's scalar scoring loop
(starling_read_align_score.cpp:108-170) as the per-chip speed-of-light
engine (SURVEY.md §2.5 'per-read likelihood hot loop').
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_BASE = 4


def _score_kernel(split3, codes_ref, delta_ref, lnmis_ref, win_ref,
                  best_ref, bestoff_ref, a_scratch, w_scratch):
    """G locus tiles per grid step: reads [R, L] vs windows [W, L].

    codes_ref  [G, R, L] int8   read base codes (>=4 -> no contribution)
    delta_ref  [G, R, L] f32    ln(1-e)-ln(e/3) per base (0 at padding)
    lnmis_ref  [G, R, 1] f32    sum of ln(e/3) over valid bases
    win_ref    [G, W, L] int8   haplotype window codes per offset
    best_ref   [G, R, 1] f32    output: max score over offsets
    bestoff_ref[G, R, 1] i32    output: argmax offset
    a_scratch  [R, 4L] f32
    w_scratch  [4L, W] f32

    Multiple tiles per grid step amortize the per-step grid/pipeline
    overhead (~25% step-time win at G=8 on v5e).

    split3: the windows operand is a {0,1} one-hot (exactly
    bf16-representable), so the f32-HIGHEST matmul's 6 MXU passes
    carry only 3 passes of information. The split3 path decomposes
    delta = hi + mid + lo (each bf16; exact — every residual has <=8
    significant bits left) and runs 3 one-pass bf16 matmuls with f32
    accumulation, ~2-3x faster. Each per-element product is exact, so
    the result differs from HIGHEST only in sub-pass accumulation
    order (observed <= 3.1e-5 absolute on realistic scores, ~1 ulp;
    the somatic demo stays byte-identical — see
    benchmarks/exp_split3*.py for the measurement harness).
    """
    G = codes_ref.shape[0]
    L = codes_ref.shape[2]
    for g in range(G):
        # int8 is the HBM/VMEM transfer type; Mosaic lacks packed-i8
        # vector compares, so widen on the VPU before the one-hot masks
        codes = codes_ref[g].astype(jnp.int32)
        delta = delta_ref[g]
        win = win_ref[g].astype(jnp.int32)
        for b in range(N_BASE):
            a_slab = jnp.where(codes == b, delta, 0.0)
            a_scratch[:, b * L:(b + 1) * L] = a_slab
            w_slab = (win == b).astype(jnp.float32)
            w_scratch[b * L:(b + 1) * L, :] = w_slab.T
        a = a_scratch[:]
        if split3:
            wb = w_scratch[:].astype(jnp.bfloat16)
            hi = a.astype(jnp.bfloat16)
            r1 = a - hi.astype(jnp.float32)
            mid = r1.astype(jnp.bfloat16)
            lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)

            def dot(x):
                # the engine sets jax_default_matmul_precision=highest
                # globally; bf16 x bf16 must ask for one pass
                return jnp.dot(x, wb, preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.DEFAULT)

            s = (dot(hi) + dot(mid)) + dot(lo)
        else:
            s = jnp.dot(a, w_scratch[:],
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)  # [R, W]
        s = s + lnmis_ref[g]                               # broadcast [R,1]
        best_ref[g] = jnp.max(s, axis=1, keepdims=True)
        bestoff_ref[g] = jax.lax.argmax(s, 1, jnp.int32)[:, None]


def score_best_offsets(codes, delta, lnmis, win_codes, interpret: bool = False,
                       split3: bool = True):
    """Batched best-offset scoring.

    codes     [B, R, L] int8/int32 read base codes
    delta     [B, R, L] f32
    lnmis     [B, R]    f32
    win_codes [B, W, L] int8/int32 per-offset haplotype windows
    returns (best [B, R] f32, best_off [B, R] i32)

    split3=True (default) uses the 3-pass bf16-split matmul (see
    _score_kernel); split3=False keeps the f32-HIGHEST reference
    matmul.

    Mosaic rejects int64 index types, so the kernel is traced with x64
    disabled (the engine otherwise enables x64 for posterior math).
    """
    with jax.enable_x64(False):
        return _score_best_offsets(codes, delta, lnmis, win_codes, interpret,
                                   split3)


@functools.partial(jax.jit, static_argnames=("interpret", "split3"))
def _score_best_offsets(codes, delta, lnmis, win_codes,
                        interpret: bool = False, split3: bool = True):
    B, R, L = codes.shape
    W = win_codes.shape[1]
    codes = codes.astype(jnp.int8)
    win_codes = win_codes.astype(jnp.int8)
    lnmis2 = lnmis[..., None]

    # tiles per grid step: amortizes per-step grid/pipeline overhead
    # (~25% step-time win at G=8 on v5e for the HIGHEST path). The
    # split3 body is ~3x more ops per tile and Mosaic compile time is
    # superlinear in the unrolled body (G=8 split3 measured ~300-440s
    # fresh vs ~100-150s at G=4; cached afterwards), so split3 caps at
    # G=4.
    G = 4 if split3 else 8
    while G > 1 and B % G:
        G //= 2

    grid = (B // G,)
    out = pl.pallas_call(
        functools.partial(_score_kernel, split3),
        grid=grid,
        in_specs=[
            pl.BlockSpec((G, R, L), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, R, L), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, R, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, W, L), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
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
            pltpu.VMEM((R, N_BASE * L), jnp.float32),
            pltpu.VMEM((N_BASE * L, W), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * R * N_BASE * L * W,
            bytes_accessed=B * (R * L * 5 + W * L + R * 8),
            transcendentals=0,
        ),
        interpret=interpret,
    )(codes, delta, lnmis2, win_codes)
    best, best_off = out
    return best[..., 0], best_off[..., 0]


def _squeeze_kernel_blockspecs():  # pragma: no cover - doc helper
    """Block shapes use a leading 1 for the batch dim; inside the
    kernel refs arrive squeezed to [R, L] etc. when block dim is 1."""


@jax.jit
def reference_best_offsets(codes, delta, lnmis, win_codes):
    """XLA reference implementation (for testing the kernel), and the
    engine's CPU-backend scoring path — jitted so the per-launch cost
    is one dispatch instead of six eager ops."""
    onehot_r = jax.nn.one_hot(codes, N_BASE, dtype=jnp.float32)
    a = (onehot_r * delta[..., None])
    onehot_w = jax.nn.one_hot(win_codes, N_BASE, dtype=jnp.float32)
    s = jnp.einsum("brlc,bwlc->brw", a, onehot_w,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    s = s + lnmis[..., None]
    return jnp.max(s, axis=-1), jnp.argmax(s, axis=-1).astype(jnp.int32)
