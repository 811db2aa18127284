"""On-chip experiment: find the exact-kernel's limiter (VERDICT r2 #4).

Variants of the exact limb kernel (all compute the identical canonical
result; correctness is asserted against exact_best_offsets before each
timing):

  base    — production kernel (ops/pallas_readlik.py), G=4
  hoist   — per-base masks computed once; 3 limb slabs built before
            any dot (lets Mosaic overlap VPU slab-build with MXU dots)
  stack   — the 3 limb slabs stacked along M into ONE [3R, 4L] dot;
            limb combination becomes a row-slice elementwise op
  stackG8 — stack with G=8 tiles per grid step
  int8    — int8 slabs + int8 MXU matmul (int32 accumulate), exact
            integers; 2x MXU rate + half the slab-store bytes
            (CRASHES Mosaic on v5e — kept for when it lands)
  hap2    — one tile scores R reads vs H=2 haps (A slabs amortized);
            MEASURED SLOWER (62M pair-scores/s vs 178M for per-hap
            stack at G=4): the [3R,4L]@[4L,2W] dot pipelines worse
            than two narrow dots. Direction dropped.

Round-3 results on the shared v5e (ms/step at B=512,R=128,L=W=128):
  base(per-limb dots) 0.59 | hoist 0.40 | stack 0.37 (PROMOTED)
  stackG2 0.39 | stackG1 0.41 | stackG8 0.66 | hap2(G2) 1.05
  bfcmp: Mosaic CRASHES on packed bf16 vector compares
  (vector<8x128x2xbf16> cmpf), same class as the packed-i8 compare
  limitation — mask building is stuck on 4-wide i32 compares until
  Mosaic grows packed compares or the i8 MXU dot lands. The remaining
  step-time beyond the dot (~0.26ms of 0.37) is VPU slab construction
  bounded by exactly that.

Timing: chained data-dependent steps, long-minus-short difference
(same methodology as bench.py; the tunnel's block_until_ready lies).

Usage: python benchmarks/exp_exact_kernel.py [variant ...]
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from strelka_tpu.ops.readlik import LIMBS, QUANT_INV, QUANT_SCALE

N_BASE = 4


def _kernel_hoist(G, codes_ref, delta_ref, lnmis_ref, win_ref,
                  best_ref, bestoff_ref, a0, a1, a2, w_scratch):
    L = codes_ref.shape[2]
    for g in range(G):
        codes = codes_ref[g].astype(jnp.int32)
        win = win_ref[g].astype(jnp.int32)
        d_int = (delta_ref[g] * QUANT_SCALE).astype(jnp.int32)
        limbs = [((d_int >> s) & 255).astype(jnp.bfloat16)
                 for s, _ in LIMBS]
        scr = (a2, a1, a0)
        for b in range(N_BASE):
            m = codes == b
            w_scratch[b * L:(b + 1) * L, :] = (win == b).astype(jnp.bfloat16)
            for j in range(3):
                scr[j][:, b * L:(b + 1) * L] = jnp.where(
                    m, limbs[j], jnp.bfloat16(0))
        s = None
        for j, (_, weight) in enumerate(LIMBS):
            part = jnp.dot(scr[j][:], w_scratch[:],
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.DEFAULT) * weight
            s = part if s is None else s + part
        s = s * QUANT_INV + lnmis_ref[g]
        best_ref[g] = jnp.max(s, axis=1, keepdims=True)
        bestoff_ref[g] = jax.lax.argmax(s, 1, jnp.int32)[:, None]


def _kernel_stack(G, codes_ref, delta_ref, lnmis_ref, win_ref,
                  best_ref, bestoff_ref, a_scratch, w_scratch):
    L = codes_ref.shape[2]
    R = codes_ref.shape[1]
    for g in range(G):
        codes = codes_ref[g].astype(jnp.int32)
        win = win_ref[g].astype(jnp.int32)
        d_int = (delta_ref[g] * QUANT_SCALE).astype(jnp.int32)
        limbs = [((d_int >> s) & 255).astype(jnp.bfloat16)
                 for s, _ in LIMBS]
        for b in range(N_BASE):
            m = codes == b
            w_scratch[b * L:(b + 1) * L, :] = (win == b).astype(jnp.bfloat16)
            for j in range(3):
                a_scratch[j * R:(j + 1) * R, b * L:(b + 1) * L] = jnp.where(
                    m, limbs[j], jnp.bfloat16(0))
        big = jnp.dot(a_scratch[:], w_scratch[:],
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.DEFAULT)   # [3R, W]
        s = (big[0:R] * LIMBS[0][1] + big[R:2 * R] * LIMBS[1][1]) \
            + big[2 * R:3 * R] * LIMBS[2][1]
        s = s * QUANT_INV + lnmis_ref[g]
        best_ref[g] = jnp.max(s, axis=1, keepdims=True)
        bestoff_ref[g] = jax.lax.argmax(s, 1, jnp.int32)[:, None]


def _kernel_int8(G, codes_ref, delta_ref, lnmis_ref, win_ref,
                 best_ref, bestoff_ref, a_scratch, w_scratch):
    L = codes_ref.shape[2]
    R = codes_ref.shape[1]
    for g in range(G):
        codes = codes_ref[g].astype(jnp.int32)
        win = win_ref[g].astype(jnp.int32)
        d_int = (delta_ref[g] * QUANT_SCALE).astype(jnp.int32)
        # limbs as signed int8: value v in 0..255 stored as v-256 when
        # v>127 is WRONG for the matmul; instead use 7-bit-safe split?
        # -> use (v - 128) + 128*mask trick is costly; here we test raw
        # MXU int8 throughput with 0..127 clamped limbs (timing only;
        # correctness variant would need unsigned handling)
        limbs = [jnp.minimum((d_int >> s) & 255, 127).astype(jnp.int8)
                 for s, _ in LIMBS]
        for b in range(N_BASE):
            m = codes == b
            w_scratch[b * L:(b + 1) * L, :] = (win == b).astype(jnp.int8)
            for j in range(3):
                a_scratch[j * R:(j + 1) * R, b * L:(b + 1) * L] = jnp.where(
                    m, limbs[j], jnp.int8(0))
        big = jax.lax.dot_general(
            a_scratch[:], w_scratch[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)   # [3R, W] int
        bf = big.astype(jnp.float32)
        s = (bf[0:R] * LIMBS[0][1] + bf[R:2 * R] * LIMBS[1][1]) \
            + bf[2 * R:3 * R] * LIMBS[2][1]
        s = s * QUANT_INV + lnmis_ref[g]
        best_ref[g] = jnp.max(s, axis=1, keepdims=True)
        bestoff_ref[g] = jax.lax.argmax(s, 1, jnp.int32)[:, None]


def _kernel_bfcmp(G, codes_ref, delta_ref, lnmis_ref, win_ref,
                  best_ref, bestoff_ref, a_scratch, w_scratch):
    """stack variant with bf16 equality masks (i8->bf16 converts pack
    2-wide vs the 4-wide i32 widen; small-int equality is exact)."""
    L = codes_ref.shape[2]
    R = codes_ref.shape[1]
    for g in range(G):
        codes = codes_ref[g].astype(jnp.bfloat16)
        win = win_ref[g].astype(jnp.bfloat16)
        d_int = (delta_ref[g] * QUANT_SCALE).astype(jnp.int32)
        limbs = [((d_int >> s) & 255).astype(jnp.bfloat16)
                 for s, _ in LIMBS]
        for b in range(N_BASE):
            fb = jnp.bfloat16(b)
            m = codes == fb
            w_scratch[b * L:(b + 1) * L, :] = (win == fb).astype(
                jnp.bfloat16)
            for j in range(3):
                a_scratch[j * R:(j + 1) * R,
                          b * L:(b + 1) * L] = jnp.where(
                    m, limbs[j], jnp.bfloat16(0))
        big = jnp.dot(a_scratch[:], w_scratch[:],
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.DEFAULT)
        s = (big[0:R] * LIMBS[0][1] + big[R:2 * R] * LIMBS[1][1]) \
            + big[2 * R:3 * R] * LIMBS[2][1]
        s = s * QUANT_INV + lnmis_ref[g]
        best_ref[g] = jnp.max(s, axis=1, keepdims=True)
        bestoff_ref[g] = jax.lax.argmax(s, 1, jnp.int32)[:, None]


# 2-limb quantization candidate (VERDICT r3 #3a): at QUANT_BITS=11 the
# max per-base delta (q=127 -> 30.34 ln units) quantizes to 62139 <
# 2^16, so TWO base-256 limbs cover the full qual range. Exactness is
# STRONGER than the 3-limb path: with L <= 256 nonzero terms the
# combined S_hi*256 + S_lo stays < 2^24, i.e. the combination itself is
# an exact integer in f32 (no rounded add at all; the 3-limb path has
# two deterministic rounded adds). Slab build drops from 12 to 8
# [R, L] masked stores and the dot shrinks [3R,4L] -> [2R,4L].
Q2_BITS = 11
Q2_SCALE = np.float32(2.0 ** Q2_BITS)
Q2_INV = np.float32(2.0 ** -Q2_BITS)
LIMBS2 = ((8, 256.0), (0, 1.0))


def _quant2_luts():
    q = np.arange(128, dtype=np.float32)
    e = np.clip(np.power(10.0, -q / 10.0), 1e-35, 0.75)
    lm = np.log1p(-e)
    lmis = np.log(e / 3.0).astype(np.float32)
    raw = (lm - lmis).astype(np.float64)
    delta = np.round(raw * 2.0 ** Q2_BITS) * 2.0 ** -Q2_BITS
    return delta.astype(np.float32), lmis


def _kernel_limb2(G, codes_ref, delta_ref, lnmis_ref, win_ref,
                  best_ref, bestoff_ref, a_scratch, w_scratch):
    L = codes_ref.shape[2]
    R = codes_ref.shape[1]
    for g in range(G):
        codes = codes_ref[g].astype(jnp.int32)
        win = win_ref[g].astype(jnp.int32)
        d_int = (delta_ref[g] * Q2_SCALE).astype(jnp.int32)
        limbs = [((d_int >> s) & 255).astype(jnp.bfloat16)
                 for s, _ in LIMBS2]
        for b in range(N_BASE):
            m = codes == b
            w_scratch[b * L:(b + 1) * L, :] = (win == b).astype(jnp.bfloat16)
            for j in range(2):
                a_scratch[j * R:(j + 1) * R, b * L:(b + 1) * L] = jnp.where(
                    m, limbs[j], jnp.bfloat16(0))
        big = jnp.dot(a_scratch[:], w_scratch[:],
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.DEFAULT)   # [2R, W]
        s = big[0:R] * LIMBS2[0][1] + big[R:2 * R] * LIMBS2[1][1]
        s = s * Q2_INV + lnmis_ref[g]
        best_ref[g] = jnp.max(s, axis=1, keepdims=True)
        bestoff_ref[g] = jax.lax.argmax(s, 1, jnp.int32)[:, None]


def exact2_best_offsets(codes, delta, lnmis, win_t):
    """XLA oracle for the 2-limb formulation."""
    codes = codes.astype(jnp.int32)
    win = win_t.astype(jnp.int32)
    d_int = (delta * Q2_SCALE).astype(jnp.int32)
    oh_r = codes[..., None] == jnp.arange(N_BASE, dtype=jnp.int32)
    oh_w = jax.nn.one_hot(win, N_BASE, dtype=jnp.float32)
    s = None
    for shift, weight in LIMBS2:
        limb = ((d_int >> shift) & 255).astype(jnp.float32)
        a = jnp.where(oh_r, limb[..., None], 0.0)
        part = jnp.einsum("brlc,blwc->brw", a, oh_w,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        part = part * weight
        s = part if s is None else s + part
    s = s * Q2_INV + lnmis[..., None]
    return jnp.max(s, axis=-1), jnp.argmax(s, axis=-1).astype(jnp.int32)


def _kernel_limb2k(G, codes_ref, delta_ref, lnmis_ref, win_ref,
                   best_ref, bestoff_ref, a_scratch, w_scratch):
    """2-limb with the limbs stacked along K: A [R, 8L] = [hi | lo]
    slabs, W [8L, W] = [256*onehot ; onehot]. ONE dot emits
    S_hi*256+S_lo directly (exact: products <= 255*256 and partial
    sums < 2^24 for L <= 256), no row-slice combine, and max/argmax
    runs over R rows instead of 2R."""
    L = codes_ref.shape[2]
    R = codes_ref.shape[1]
    for g in range(G):
        codes = codes_ref[g].astype(jnp.int32)
        win = win_ref[g].astype(jnp.int32)
        d_int = (delta_ref[g] * Q2_SCALE).astype(jnp.int32)
        limbs = [((d_int >> s) & 255).astype(jnp.bfloat16)
                 for s, _ in LIMBS2]
        for b in range(N_BASE):
            m = codes == b
            wb = (win == b)
            w_scratch[b * L:(b + 1) * L, :] = wb.astype(
                jnp.bfloat16) * jnp.bfloat16(256.0)
            w_scratch[(N_BASE + b) * L:(N_BASE + b + 1) * L, :] = wb.astype(
                jnp.bfloat16)
            for j in range(2):
                a_scratch[:, (j * N_BASE + b) * L:
                          (j * N_BASE + b + 1) * L] = jnp.where(
                    m, limbs[j], jnp.bfloat16(0))
        s = jnp.dot(a_scratch[:], w_scratch[:],
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)   # [R, W]
        s = s * Q2_INV + lnmis_ref[g]
        best_ref[g] = jnp.max(s, axis=1, keepdims=True)
        bestoff_ref[g] = jax.lax.argmax(s, 1, jnp.int32)[:, None]


def _kernel_limb2r(G, codes_ref, delta_ref, lnmis_ref, win_ref,
                   best_ref, bestoff_ref, a_scratch, w_scratch):
    """limb2 with a ROLLED fori_loop over the G tiles: large G (few
    grid steps, amortizing the ~2us/step fixed cost) without the
    unrolled-body blowup that made stackG8 slow."""
    L = codes_ref.shape[2]
    R = codes_ref.shape[1]

    def body(g, _):
        codes = codes_ref[g].astype(jnp.int32)
        win = win_ref[g].astype(jnp.int32)
        d_int = (delta_ref[g] * Q2_SCALE).astype(jnp.int32)
        limbs = [((d_int >> s) & 255).astype(jnp.bfloat16)
                 for s, _w in LIMBS2]
        for b in range(N_BASE):
            m = codes == b
            w_scratch[b * L:(b + 1) * L, :] = (win == b).astype(jnp.bfloat16)
            for j in range(2):
                a_scratch[j * R:(j + 1) * R, b * L:(b + 1) * L] = jnp.where(
                    m, limbs[j], jnp.bfloat16(0))
        big = jnp.dot(a_scratch[:], w_scratch[:],
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.DEFAULT)
        s = big[0:R] * LIMBS2[0][1] + big[R:2 * R] * LIMBS2[1][1]
        s = s * Q2_INV + lnmis_ref[g]
        best_ref[g] = jnp.max(s, axis=1, keepdims=True)
        bestoff_ref[g] = jax.lax.argmax(s, 1, jnp.int32)[:, None]
        return 0

    jax.lax.fori_loop(0, G, body, 0)


# --- ablation variants (TIMING ONLY, wrong results): locate the cost
# inside the limb2 kernel body. Each drops one stage of the body.

def _kernel_limb2_noA(G, codes_ref, delta_ref, lnmis_ref, win_ref,
                      best_ref, bestoff_ref, a_scratch, w_scratch):
    """A slabs written WITHOUT per-base masking (broadcast limb)."""
    L = codes_ref.shape[2]
    R = codes_ref.shape[1]
    for g in range(G):
        win = win_ref[g].astype(jnp.int32)
        d_int = (delta_ref[g] * Q2_SCALE).astype(jnp.int32)
        limbs = [((d_int >> s) & 255).astype(jnp.bfloat16)
                 for s, _ in LIMBS2]
        for b in range(N_BASE):
            w_scratch[b * L:(b + 1) * L, :] = (win == b).astype(jnp.bfloat16)
            for j in range(2):
                a_scratch[j * R:(j + 1) * R, b * L:(b + 1) * L] = limbs[j]
        big = jnp.dot(a_scratch[:], w_scratch[:],
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.DEFAULT)
        s = big[0:R] * LIMBS2[0][1] + big[R:2 * R] * LIMBS2[1][1]
        s = s * Q2_INV + lnmis_ref[g]
        best_ref[g] = jnp.max(s, axis=1, keepdims=True)
        bestoff_ref[g] = jax.lax.argmax(s, 1, jnp.int32)[:, None]


def _kernel_limb2_noW(G, codes_ref, delta_ref, lnmis_ref, win_ref,
                      best_ref, bestoff_ref, a_scratch, w_scratch):
    """W slab written once from tile 0 only (skips per-tile W build)."""
    L = codes_ref.shape[2]
    R = codes_ref.shape[1]
    win = win_ref[0].astype(jnp.int32)
    for b in range(N_BASE):
        w_scratch[b * L:(b + 1) * L, :] = (win == b).astype(jnp.bfloat16)
    for g in range(G):
        codes = codes_ref[g].astype(jnp.int32)
        d_int = (delta_ref[g] * Q2_SCALE).astype(jnp.int32)
        limbs = [((d_int >> s) & 255).astype(jnp.bfloat16)
                 for s, _ in LIMBS2]
        for b in range(N_BASE):
            m = codes == b
            for j in range(2):
                a_scratch[j * R:(j + 1) * R, b * L:(b + 1) * L] = jnp.where(
                    m, limbs[j], jnp.bfloat16(0))
        big = jnp.dot(a_scratch[:], w_scratch[:],
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.DEFAULT)
        s = big[0:R] * LIMBS2[0][1] + big[R:2 * R] * LIMBS2[1][1]
        s = s * Q2_INV + lnmis_ref[g]
        best_ref[g] = jnp.max(s, axis=1, keepdims=True)
        bestoff_ref[g] = jax.lax.argmax(s, 1, jnp.int32)[:, None]


def _kernel_limb2_nomax(G, codes_ref, delta_ref, lnmis_ref, win_ref,
                        best_ref, bestoff_ref, a_scratch, w_scratch):
    """Drops the argmax (keeps max; offset output = constant)."""
    L = codes_ref.shape[2]
    R = codes_ref.shape[1]
    for g in range(G):
        codes = codes_ref[g].astype(jnp.int32)
        win = win_ref[g].astype(jnp.int32)
        d_int = (delta_ref[g] * Q2_SCALE).astype(jnp.int32)
        limbs = [((d_int >> s) & 255).astype(jnp.bfloat16)
                 for s, _ in LIMBS2]
        for b in range(N_BASE):
            m = codes == b
            w_scratch[b * L:(b + 1) * L, :] = (win == b).astype(jnp.bfloat16)
            for j in range(2):
                a_scratch[j * R:(j + 1) * R, b * L:(b + 1) * L] = jnp.where(
                    m, limbs[j], jnp.bfloat16(0))
        big = jnp.dot(a_scratch[:], w_scratch[:],
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.DEFAULT)
        s = big[0:R] * LIMBS2[0][1] + big[R:2 * R] * LIMBS2[1][1]
        s = s * Q2_INV + lnmis_ref[g]
        best_ref[g] = jnp.max(s, axis=1, keepdims=True)
        bestoff_ref[g] = jnp.zeros((R, 1), jnp.int32)


def _kernel_limb2_nodot(G, codes_ref, delta_ref, lnmis_ref, win_ref,
                        best_ref, bestoff_ref, a_scratch, w_scratch):
    """Full slab build, dot replaced by a slab row-slice (no MXU)."""
    L = codes_ref.shape[2]
    R = codes_ref.shape[1]
    W = win_ref.shape[2]
    for g in range(G):
        codes = codes_ref[g].astype(jnp.int32)
        win = win_ref[g].astype(jnp.int32)
        d_int = (delta_ref[g] * Q2_SCALE).astype(jnp.int32)
        limbs = [((d_int >> s) & 255).astype(jnp.bfloat16)
                 for s, _ in LIMBS2]
        for b in range(N_BASE):
            m = codes == b
            w_scratch[b * L:(b + 1) * L, :] = (win == b).astype(jnp.bfloat16)
            for j in range(2):
                a_scratch[j * R:(j + 1) * R, b * L:(b + 1) * L] = jnp.where(
                    m, limbs[j], jnp.bfloat16(0))
        s = (a_scratch[0:R, 0:W].astype(jnp.float32)
             + w_scratch[0:R, :].astype(jnp.float32))
        s = s * Q2_INV + lnmis_ref[g]
        best_ref[g] = jnp.max(s, axis=1, keepdims=True)
        bestoff_ref[g] = jax.lax.argmax(s, 1, jnp.int32)[:, None]


# --- r5 variants: attack the ~2us per-grid-step fixed cost (r4 ablation
# showed per-step time flat from R=128..512 => grid/DMA orchestration,
# not body compute). Levers: fewer DMA streams per step (pack
# codes+delta into one i32 operand; pack both outputs into one buffer)
# and a whole-array-resident output block (constant index_map => Mosaic
# writes HBM once at the end instead of 2 output DMAs per step).

def _kernel_fused(G, R, packed_ref, lnmis_ref, win_ref,
                  out_ref, a_scratch, w_scratch):
    """packed [G,R,L] i32 = (d_int << 3) | code; out [G,R,2] f32 =
    [best | bitcast(i32 argmax)]."""
    L = packed_ref.shape[2]
    for g in range(G):
        packed = packed_ref[g]
        codes = packed & 7
        d_int = packed >> 3
        win = win_ref[g].astype(jnp.int32)
        limbs = [((d_int >> s) & 255).astype(jnp.bfloat16)
                 for s, _ in LIMBS2]
        for b in range(N_BASE):
            m = codes == b
            w_scratch[b * L:(b + 1) * L, :] = (win == b).astype(jnp.bfloat16)
            for j in range(2):
                a_scratch[j * R:(j + 1) * R, b * L:(b + 1) * L] = jnp.where(
                    m, limbs[j], jnp.bfloat16(0))
        big = jnp.dot(a_scratch[:], w_scratch[:],
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.DEFAULT)
        s = big[0:R] * LIMBS2[0][1] + big[R:2 * R] * LIMBS2[1][1]
        s = s * Q2_INV + lnmis_ref[g]
        best = jnp.max(s, axis=1, keepdims=True)
        off = jax.lax.argmax(s, 1, jnp.int32)[:, None]
        out_ref[g] = jnp.concatenate(
            [best, jax.lax.bitcast_convert_type(off, jnp.float32)], axis=1)


def build_fused(B, R, L, W, G, wholeout=False):
    if wholeout:
        out_spec = pl.BlockSpec((B, R, 2), lambda b: (0, 0, 0))

        def kern(packed_ref, lnmis_ref, win_ref, out_ref, a_scratch,
                 w_scratch):
            step = pl.program_id(0)
            L = packed_ref.shape[2]
            for g in range(G):
                packed = packed_ref[g]
                codes = packed & 7
                d_int = packed >> 3
                win = win_ref[g].astype(jnp.int32)
                limbs = [((d_int >> s) & 255).astype(jnp.bfloat16)
                         for s, _ in LIMBS2]
                for b in range(N_BASE):
                    m = codes == b
                    w_scratch[b * L:(b + 1) * L, :] = (win == b).astype(
                        jnp.bfloat16)
                    for j in range(2):
                        a_scratch[j * R:(j + 1) * R,
                                  b * L:(b + 1) * L] = jnp.where(
                            m, limbs[j], jnp.bfloat16(0))
                big = jnp.dot(a_scratch[:], w_scratch[:],
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.DEFAULT)
                s = big[0:R] * LIMBS2[0][1] + big[R:2 * R] * LIMBS2[1][1]
                s = s * Q2_INV + lnmis_ref[g]
                best = jnp.max(s, axis=1, keepdims=True)
                off = jax.lax.argmax(s, 1, jnp.int32)[:, None]
                out_ref[step * G + g] = jnp.concatenate(
                    [best, jax.lax.bitcast_convert_type(off, jnp.float32)],
                    axis=1)
    else:
        out_spec = pl.BlockSpec((G, R, 2), lambda b: (b, 0, 0))
        kern = functools.partial(_kernel_fused, G, R)

    @jax.jit
    def fn(codes, delta, lnmis, win_t):
        with jax.enable_x64(False):
            d_int = (delta * Q2_SCALE).astype(jnp.int32)
            packed = (d_int << 3) | codes.astype(jnp.int32)
            out = pl.pallas_call(
                kern,
                grid=(B // G,),
                in_specs=[
                    pl.BlockSpec((G, R, L), lambda b: (b, 0, 0)),
                    pl.BlockSpec((G, R, 1), lambda b: (b, 0, 0)),
                    pl.BlockSpec((G, L, W), lambda b: (b, 0, 0)),
                ],
                out_specs=[out_spec],
                out_shape=[jax.ShapeDtypeStruct((B, R, 2), jnp.float32)],
                scratch_shapes=[
                    pltpu.VMEM((2 * R, N_BASE * L), jnp.bfloat16),
                    pltpu.VMEM((N_BASE * L, W), jnp.bfloat16)],
            )(packed, lnmis[..., None], win_t.astype(jnp.int8))[0]
        return out[..., 0], jax.lax.bitcast_convert_type(
            out[..., 1], jnp.int32)

    return fn


def build_wholeout(B, R, L, W, G):
    """limb2 body, but both outputs are whole-array VMEM-resident blocks
    (constant index_map): no per-step output DMA."""

    def kern(codes_ref, delta_ref, lnmis_ref, win_ref,
             best_ref, bestoff_ref, a_scratch, w_scratch):
        step = pl.program_id(0)
        L = codes_ref.shape[2]
        for g in range(G):
            codes = codes_ref[g].astype(jnp.int32)
            win = win_ref[g].astype(jnp.int32)
            d_int = (delta_ref[g] * Q2_SCALE).astype(jnp.int32)
            limbs = [((d_int >> s) & 255).astype(jnp.bfloat16)
                     for s, _ in LIMBS2]
            for b in range(N_BASE):
                m = codes == b
                w_scratch[b * L:(b + 1) * L, :] = (win == b).astype(
                    jnp.bfloat16)
                for j in range(2):
                    a_scratch[j * R:(j + 1) * R,
                              b * L:(b + 1) * L] = jnp.where(
                        m, limbs[j], jnp.bfloat16(0))
            big = jnp.dot(a_scratch[:], w_scratch[:],
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.DEFAULT)
            s = big[0:R] * LIMBS2[0][1] + big[R:2 * R] * LIMBS2[1][1]
            s = s * Q2_INV + lnmis_ref[g]
            best_ref[step * G + g] = jnp.max(s, axis=1, keepdims=True)
            bestoff_ref[step * G + g] = jax.lax.argmax(
                s, 1, jnp.int32)[:, None]

    @jax.jit
    def fn(codes, delta, lnmis, win_t):
        with jax.enable_x64(False):
            out = pl.pallas_call(
                kern,
                grid=(B // G,),
                in_specs=[
                    pl.BlockSpec((G, R, L), lambda b: (b, 0, 0)),
                    pl.BlockSpec((G, R, L), lambda b: (b, 0, 0)),
                    pl.BlockSpec((G, R, 1), lambda b: (b, 0, 0)),
                    pl.BlockSpec((G, L, W), lambda b: (b, 0, 0)),
                ],
                out_specs=[
                    pl.BlockSpec((B, R, 1), lambda b: (0, 0, 0)),
                    pl.BlockSpec((B, R, 1), lambda b: (0, 0, 0)),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((B, R, 1), jnp.float32),
                    jax.ShapeDtypeStruct((B, R, 1), jnp.int32),
                ],
                scratch_shapes=[
                    pltpu.VMEM((2 * R, N_BASE * L), jnp.bfloat16),
                    pltpu.VMEM((N_BASE * L, W), jnp.bfloat16)],
            )(codes.astype(jnp.int8), delta, lnmis[..., None],
              win_t.astype(jnp.int8))
        return out[0][..., 0], out[1][..., 0]

    return fn


def build_packedin(B, R, L, W, G, fold_lnmis=False):
    """Host passes packed i32 (d_int<<3 | code) directly — no XLA
    prologue, 3 input streams (2 with fold_lnmis: lnmis rows bitcast
    into extra packed rows), one whole-array-resident packed output.
    Production analogue: realign_batch stages ONE packed buffer instead
    of codes+delta (cheaper host scatter too)."""
    lm_rows = -(-R // L) if fold_lnmis else 0
    Rp = R + lm_rows

    def kern(packed_ref, *rest):
        if fold_lnmis:
            (win_ref, out_ref, a_scratch, w_scratch) = rest
        else:
            (lnmis_ref, win_ref, out_ref, a_scratch, w_scratch) = rest
        step = pl.program_id(0)
        for g in range(G):
            full = packed_ref[g]
            packed = full[:R]
            codes = packed & 7
            d_int = packed >> 3
            if fold_lnmis:
                lm_flat = jax.lax.bitcast_convert_type(
                    full[R:], jnp.float32).reshape(lm_rows * L)
                lnm = lm_flat[:R][:, None]
            else:
                lnm = lnmis_ref[g]
            win = win_ref[g].astype(jnp.int32)
            limbs = [((d_int >> s) & 255).astype(jnp.bfloat16)
                     for s, _ in LIMBS2]
            for b in range(N_BASE):
                m = codes == b
                w_scratch[b * L:(b + 1) * L, :] = (win == b).astype(
                    jnp.bfloat16)
                for j in range(2):
                    a_scratch[j * R:(j + 1) * R,
                              b * L:(b + 1) * L] = jnp.where(
                        m, limbs[j], jnp.bfloat16(0))
            big = jnp.dot(a_scratch[:], w_scratch[:],
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.DEFAULT)
            s = big[0:R] * LIMBS2[0][1] + big[R:2 * R] * LIMBS2[1][1]
            s = s * Q2_INV + lnm
            best = jnp.max(s, axis=1, keepdims=True)
            off = jax.lax.argmax(s, 1, jnp.int32)[:, None]
            out_ref[step * G + g] = jnp.concatenate(
                [best, jax.lax.bitcast_convert_type(off, jnp.float32)],
                axis=1)

    in_specs = [pl.BlockSpec((G, Rp, L), lambda b: (b, 0, 0))]
    if not fold_lnmis:
        in_specs.append(pl.BlockSpec((G, R, 1), lambda b: (b, 0, 0)))
    in_specs.append(pl.BlockSpec((G, L, W), lambda b: (b, 0, 0)))

    def pcall(*ops):
        with jax.enable_x64(False):
            return pl.pallas_call(
                kern,
                grid=(B // G,),
                in_specs=in_specs,
                out_specs=[pl.BlockSpec((B, R, 2), lambda b: (0, 0, 0))],
                out_shape=[jax.ShapeDtypeStruct((B, R, 2), jnp.float32)],
                scratch_shapes=[
                    pltpu.VMEM((2 * R, N_BASE * L), jnp.bfloat16),
                    pltpu.VMEM((N_BASE * L, W), jnp.bfloat16)],
            )(*ops)[0]

    @jax.jit
    def fn(codes, delta, lnmis, win_t):
        # the pack runs OUTSIDE the timed chain in the benchmark
        # harness via fn_packed; this wrapper exists for correctness
        # checks from the standard operands
        with jax.enable_x64(False):
            d_int = (delta * Q2_SCALE).astype(jnp.int32)
            packed = (d_int << 3) | codes.astype(jnp.int32)
            if fold_lnmis:
                lm = jax.lax.bitcast_convert_type(lnmis, jnp.int32)
                pad = lm_rows * L - R
                lm = jnp.pad(lm, ((0, 0), (0, pad))).reshape(
                    B, lm_rows, L)
                packed = jnp.concatenate([packed, lm], axis=1)
                out = pcall(packed, win_t.astype(jnp.int8))
            else:
                out = pcall(packed, lnmis[..., None], win_t.astype(jnp.int8))
        return out[..., 0], jax.lax.bitcast_convert_type(
            out[..., 1], jnp.int32)

    @jax.jit
    def fn_packed(packed, lnmis, win8):
        if fold_lnmis:
            out = pcall(packed, win8)
        else:
            out = pcall(packed, lnmis[..., None], win8)
        return out[..., 0], jax.lax.bitcast_convert_type(
            out[..., 1], jnp.int32)

    fn.packed = fn_packed
    fn.fold_lnmis = fold_lnmis
    fn.lm_rows = lm_rows
    return fn


def build(variant, B, R, L, W, G):
    if variant.startswith("fusedwhole"):
        return build_fused(B, R, L, W, G, wholeout=True)
    if variant.startswith("fusedlm"):
        return build_packedin(B, R, L, W, G, fold_lnmis=True)
    if variant.startswith("fusedin"):
        return build_packedin(B, R, L, W, G)
    if variant.startswith("fused"):
        return build_fused(B, R, L, W, G)
    if variant.startswith("wholeout"):
        return build_wholeout(B, R, L, W, G)
    if variant == "hoist":
        kern = _kernel_hoist
        scratch = [pltpu.VMEM((R, N_BASE * L), jnp.bfloat16)] * 3 + [
            pltpu.VMEM((N_BASE * L, W), jnp.bfloat16)]
    elif variant == "bfcmp":
        kern = _kernel_bfcmp
        scratch = [pltpu.VMEM((3 * R, N_BASE * L), jnp.bfloat16),
                   pltpu.VMEM((N_BASE * L, W), jnp.bfloat16)]
    elif variant.startswith("stack"):
        kern = _kernel_stack
        scratch = [pltpu.VMEM((3 * R, N_BASE * L), jnp.bfloat16),
                   pltpu.VMEM((N_BASE * L, W), jnp.bfloat16)]
    elif variant.startswith("limb2k"):
        kern = _kernel_limb2k
        scratch = [pltpu.VMEM((R, 2 * N_BASE * L), jnp.bfloat16),
                   pltpu.VMEM((2 * N_BASE * L, W), jnp.bfloat16)]
    elif variant.startswith("limb2r"):
        kern = _kernel_limb2r
        scratch = [pltpu.VMEM((2 * R, N_BASE * L), jnp.bfloat16),
                   pltpu.VMEM((N_BASE * L, W), jnp.bfloat16)]
    elif variant.startswith("limb2"):
        kern = {"limb2-noA": _kernel_limb2_noA,
                "limb2-noW": _kernel_limb2_noW,
                "limb2-nomax": _kernel_limb2_nomax,
                "limb2-nodot": _kernel_limb2_nodot}.get(
                    variant.split("@")[0], _kernel_limb2)
        scratch = [pltpu.VMEM((2 * R, N_BASE * L), jnp.bfloat16),
                   pltpu.VMEM((N_BASE * L, W), jnp.bfloat16)]
    elif variant == "int8":
        kern = _kernel_int8
        scratch = [pltpu.VMEM((3 * R, N_BASE * L), jnp.int8),
                   pltpu.VMEM((N_BASE * L, W), jnp.int8)]
    else:
        raise ValueError(variant)

    @jax.jit
    def fn(codes, delta, lnmis, win_t):
        with jax.enable_x64(False):
            out = pl.pallas_call(
                functools.partial(kern, G),
                grid=(B // G,),
                in_specs=[
                    pl.BlockSpec((G, R, L), lambda b: (b, 0, 0)),
                    pl.BlockSpec((G, R, L), lambda b: (b, 0, 0)),
                    pl.BlockSpec((G, R, 1), lambda b: (b, 0, 0)),
                    pl.BlockSpec((G, L, W), lambda b: (b, 0, 0)),
                ],
                out_specs=[
                    pl.BlockSpec((G, R, 1), lambda b: (b, 0, 0)),
                    pl.BlockSpec((G, R, 1), lambda b: (b, 0, 0)),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((B, R, 1), jnp.float32),
                    jax.ShapeDtypeStruct((B, R, 1), jnp.int32),
                ],
                scratch_shapes=scratch,
            )(codes.astype(jnp.int8), delta, lnmis[..., None],
              win_t.astype(jnp.int8))
        return out[0][..., 0], out[1][..., 0]

    return fn


def main():
    from strelka_tpu.ops import pallas_readlik as pk
    from strelka_tpu.ops.readlik import quantized_qscore_luts

    variants = sys.argv[1:] or ["base", "hoist", "stack", "stackG8", "int8"]
    B, R, L, W = 512, 128, 128, 128
    # shape override (same total reads = B*R unless changed):
    B = int(os.environ.get("EXP_B", B))
    R = int(os.environ.get("EXP_R", R))
    rng = np.random.default_rng(0)
    dl, ml = quantized_qscore_luts()
    dl2, _ = _quant2_luts()
    q = rng.integers(2, 42, (B, R, L))
    codes_np = rng.integers(0, 5, (B, R, L)).astype(np.int8)
    delta_np = np.where(codes_np < 4, dl[q], 0).astype(np.float32)
    delta2_np = np.where(codes_np < 4, dl2[q], 0).astype(np.float32)
    lnmis_np = np.where(codes_np < 4, ml[q], 0).sum(2).astype(np.float32)
    win_np = rng.integers(0, 5, (B, L, W)).astype(np.int8)
    codes, delta, lnmis, win = (jnp.asarray(codes_np), jnp.asarray(delta_np),
                                jnp.asarray(lnmis_np), jnp.asarray(win_np))
    delta2 = jnp.asarray(delta2_np)
    sb, so = [np.asarray(x) for x in pk.exact_best_offsets(
        codes[:8], delta[:8], lnmis[:8], win[:8])]
    sb2, so2 = [np.asarray(x) for x in jax.jit(exact2_best_offsets)(
        codes[:8], delta2[:8], lnmis[:8], win[:8])]

    for name in variants:
        t0 = time.perf_counter()
        is2 = name.startswith(("limb2", "fused", "wholeout"))
        dvec = delta2 if is2 else delta
        oracle = (sb2, so2) if is2 else (sb, so)
        if name == "base":
            step = lambda c, d, m, w: pk.score_best_offsets(c, d, m, w)
        else:
            G = {"stackG8": 8, "stackG2": 2, "stackG1": 1,
                 "limb2G8": 8, "limb2G2": 2,
                 "fused": 2, "fusedwhole": 2, "wholeout": 2,
                 "fusedin": 2, "fusedlm": 2}.get(name, 4)
            if "@" in name:
                G = int(name.split("@")[1])
            step = build(name, B, R, L, W, G)
        try:
            ob, oo = step(codes, dvec, lnmis, win)
            ob8, oo8 = np.asarray(ob)[:8], np.asarray(oo)[:8]
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}")
            continue
        t_compile = time.perf_counter() - t0
        exact = (np.array_equal(ob8, oracle[0])
                 and np.array_equal(oo8, oracle[1]))

        if hasattr(step, "packed"):
            # production staging format: host passes packed i32 — the
            # pack is NOT part of the timed device step
            d_int_np = (np.asarray(dvec) * Q2_SCALE).astype(np.int32)
            packed_np = (d_int_np << 3) | codes_np.astype(np.int32)
            if step.fold_lnmis:
                lm = lnmis_np.view(np.int32)
                pad = step.lm_rows * L - R
                lm = np.pad(lm, ((0, 0), (0, pad))).reshape(
                    B, step.lm_rows, L)
                packed_np = np.concatenate([packed_np, lm], axis=1)
            packed_dev = jnp.asarray(packed_np)
            win8 = jnp.asarray(win_np)
            pfn = step.packed

            if step.fold_lnmis:
                def chain(n):
                    carry = win8
                    for _ in range(n):
                        o = pfn(packed_dev, lnmis, carry)
                        carry = carry + (o[0].max() * 0.0).astype(jnp.int8)
                    return carry
            else:
                def chain(n):
                    carry = lnmis
                    for _ in range(n):
                        o = pfn(packed_dev, carry, win8)
                        carry = carry + o[0] * 0.0
                    return carry
        else:
            def chain(n):
                carry = lnmis
                for _ in range(n):
                    o = step(codes, dvec, carry, win)
                    carry = carry + o[0] * 0.0
                return carry

        def timed(n):
            r = chain(n)
            np.asarray(r[:1])
            best = float("inf")
            for _ in range(6):
                t0 = time.perf_counter()
                r = chain(n)
                np.asarray(r[:1])
                best = min(best, time.perf_counter() - t0)
            return best

        ts, tl = timed(1), timed(11)
        dt = max(tl - ts, 1e-9) / 10
        print(f"{name}: step={dt*1e3:.3f}ms reads/s={B*R/dt/1e6:.1f}M "
              f"exact={exact} compile={t_compile:.0f}s")


if __name__ == "__main__" and "hap2" not in sys.argv:
    main()


def build_hap2(B2, R, L, W, H, G):
    """Hap-grouped variant: one tile scores R reads against H
    haplotypes' windows (win [G, L, H*W]); the A slabs are built once
    per locus instead of once per hap. Outputs [B2, R, H]."""
    HW = H * W

    def kern(codes_ref, delta_ref, lnmis_ref, win_ref,
             best_ref, bestoff_ref, a_scratch, w_scratch):
        for g in range(G):
            codes = codes_ref[g].astype(jnp.int32)
            win = win_ref[g].astype(jnp.int32)
            d_int = (delta_ref[g] * QUANT_SCALE).astype(jnp.int32)
            limbs = [((d_int >> s) & 255).astype(jnp.bfloat16)
                     for s, _ in LIMBS]
            for b in range(N_BASE):
                m = codes == b
                w_scratch[b * L:(b + 1) * L, :] = (win == b).astype(
                    jnp.bfloat16)
                for j in range(3):
                    a_scratch[j * R:(j + 1) * R,
                              b * L:(b + 1) * L] = jnp.where(
                        m, limbs[j], jnp.bfloat16(0))
            big = jnp.dot(a_scratch[:], w_scratch[:],
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.DEFAULT)  # [3R, HW]
            s = (big[0:R] * LIMBS[0][1] + big[R:2 * R] * LIMBS[1][1]) \
                + big[2 * R:3 * R] * LIMBS[2][1]
            s = s * QUANT_INV + lnmis_ref[g]
            s3 = s.reshape(R, H, W)
            best_ref[g] = jnp.max(s3, axis=2)
            bestoff_ref[g] = jnp.argmax(s3, axis=2).astype(jnp.int32)

    @jax.jit
    def fn(codes, delta, lnmis, win_t):
        with jax.enable_x64(False):
            out = pl.pallas_call(
                kern,
                grid=(B2 // G,),
                in_specs=[
                    pl.BlockSpec((G, R, L), lambda b: (b, 0, 0)),
                    pl.BlockSpec((G, R, L), lambda b: (b, 0, 0)),
                    pl.BlockSpec((G, R, 1), lambda b: (b, 0, 0)),
                    pl.BlockSpec((G, L, HW), lambda b: (b, 0, 0)),
                ],
                out_specs=[
                    pl.BlockSpec((G, R, H), lambda b: (b, 0, 0)),
                    pl.BlockSpec((G, R, H), lambda b: (b, 0, 0)),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((B2, R, H), jnp.float32),
                    jax.ShapeDtypeStruct((B2, R, H), jnp.int32),
                ],
                scratch_shapes=[
                    pltpu.VMEM((3 * R, N_BASE * L), jnp.bfloat16),
                    pltpu.VMEM((N_BASE * L, HW), jnp.bfloat16),
                ],
            )(codes.astype(jnp.int8), delta, lnmis[..., None],
              win_t.astype(jnp.int8))
        return out

    return fn


def main_hap2():
    from strelka_tpu.ops import pallas_readlik as pk
    from strelka_tpu.ops.readlik import quantized_qscore_luts
    B, R, L, W, H = 256, 128, 128, 128, 2   # 512 (locus, hap) pairs
    rng = np.random.default_rng(0)
    dl, ml = quantized_qscore_luts()
    q = rng.integers(2, 42, (B, R, L))
    codes_np = rng.integers(0, 5, (B, R, L)).astype(np.int8)
    delta_np = np.where(codes_np < 4, dl[q], 0).astype(np.float32)
    lnmis_np = np.where(codes_np < 4, ml[q], 0).sum(2).astype(np.float32)
    win_np = rng.integers(0, 5, (B, L, H * W)).astype(np.int8)
    codes, delta, lnmis, win = (jnp.asarray(codes_np),
                                jnp.asarray(delta_np),
                                jnp.asarray(lnmis_np),
                                jnp.asarray(win_np))
    step = build_hap2(B, R, L, W, H, 2)
    # correctness vs exact_best_offsets per hap segment
    eb0, eo0 = pk.exact_best_offsets(codes[:8], delta[:8], lnmis[:8],
                                     win[:8, :, :W])
    eb1, eo1 = pk.exact_best_offsets(codes[:8], delta[:8], lnmis[:8],
                                     win[:8, :, W:])
    ob, oo = step(codes, delta, lnmis, win)
    ob, oo = np.asarray(ob), np.asarray(oo)
    exact = (np.array_equal(ob[:8, :, 0], np.asarray(eb0))
             and np.array_equal(ob[:8, :, 1], np.asarray(eb1))
             and np.array_equal(oo[:8, :, 0], np.asarray(eo0))
             and np.array_equal(oo[:8, :, 1], np.asarray(eo1)))

    def chain(n):
        carry = lnmis
        for _ in range(n):
            o = step(codes, delta, carry, win)
            carry = carry + o[0][:, :, 0] * 0.0
        return carry

    def timed(n):
        r = chain(n)
        np.asarray(r[:1])
        best = float("inf")
        for _ in range(6):
            t0 = time.perf_counter()
            r = chain(n)
            np.asarray(r[:1])
            best = min(best, time.perf_counter() - t0)
        return best

    ts, tl = timed(1), timed(11)
    dt = max(tl - ts, 1e-9) / 10
    pairs = B * R * H
    print(f"hap2: step={dt*1e3:.3f}ms pair-scores/s={pairs/dt/1e6:.1f}M "
          f"exact={exact}")


if __name__ == "__main__" and "hap2" in sys.argv:
    main_hap2()
