"""Experiment: 3-pass bf16-split scoring kernel vs the f32-HIGHEST kernel.

The windows operand is a {0,1} one-hot (exactly bf16-representable),
so an f32-HIGHEST [R,4L]@[4L,W] matmul spends 6 MXU passes where 3
carry all the information: delta = hi + mid + lo (each bf16, split
exact because each residual has <=8 significant bits left). This
script checks, ON THE REAL CHIP, whether the 3-dot reconstruction is
bitwise equal to the HIGHEST kernel for both add orders, and times
both kernels with the chained-difference method (bench.py docstring).
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

N_BASE = 4


def _split3_kernel(order, codes_ref, delta_ref, lnmis_ref, win_ref,
                   best_ref, bestoff_ref, a_scratch, w_scratch):
    G = codes_ref.shape[0]
    L = codes_ref.shape[2]
    for g in range(G):
        codes = codes_ref[g].astype(jnp.int32)
        delta = delta_ref[g]
        win = win_ref[g].astype(jnp.int32)
        for b in range(N_BASE):
            a_slab = jnp.where(codes == b, delta, 0.0)
            a_scratch[:, b * L:(b + 1) * L] = a_slab
            w_slab = (win == b).astype(jnp.bfloat16)
            w_scratch[b * L:(b + 1) * L, :] = w_slab.T
        a = a_scratch[:]
        w = w_scratch[:]
        hi = a.astype(jnp.bfloat16)
        r1 = a - hi.astype(jnp.float32)
        mid = r1.astype(jnp.bfloat16)
        lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)

        def dot(x):
            # the engine sets jax_default_matmul_precision=highest
            # globally; bf16 x bf16 must explicitly ask for one pass
            return jnp.dot(x, w, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.DEFAULT)

        if order == "hml":
            s = (dot(hi) + dot(mid)) + dot(lo)
        else:
            s = (dot(lo) + dot(mid)) + dot(hi)
        s = s + lnmis_ref[g]
        best_ref[g] = jnp.max(s, axis=1, keepdims=True)
        bestoff_ref[g] = jax.lax.argmax(s, 1, jnp.int32)[:, None]


@functools.partial(jax.jit, static_argnames=("order",))
def split3_best_offsets(codes, delta, lnmis, win_codes, order="hml"):
    with jax.enable_x64(False):
        B, R, L = codes.shape
        W = win_codes.shape[1]
        codes = codes.astype(jnp.int8)
        win_codes = win_codes.astype(jnp.int8)
        lnmis2 = lnmis[..., None]
        G = 8
        while G > 1 and B % G:
            G //= 2
        out = pl.pallas_call(
            functools.partial(_split3_kernel, order),
            grid=(B // G,),
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
                pltpu.VMEM((N_BASE * L, W), jnp.bfloat16),
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * B * R * N_BASE * L * W * 3 // 6,
                bytes_accessed=B * (R * L * 5 + W * L + R * 8),
                transcendentals=0,
            ),
        )(codes, delta, lnmis2, win_codes)
    return out[0][..., 0], out[1][..., 0]


def main():
    from strelka_tpu.ops.pallas_readlik import score_best_offsets

    B, R, L, W = 512, 128, 128, 128
    rng = np.random.default_rng(0)
    # realistic deltas: ln(1-e)-ln(e/3) for q in 2..41 is ~1.5..10.6
    q = rng.integers(2, 42, (B, R, L))
    e = np.minimum(10.0 ** (-q / 10.0), 0.75)
    delta_np = (np.log1p(-e) - np.log(e / 3.0)).astype(np.float32)
    codes = jnp.asarray(rng.integers(0, 5, (B, R, L)), jnp.int8)
    delta = jnp.asarray(delta_np)
    lnmis = jnp.asarray(rng.normal(-100, 10, (B, R)).astype(np.float32))
    win = jnp.asarray(rng.integers(0, 5, (B, W, L)), jnp.int8)

    ref_best, ref_off = score_best_offsets(codes, delta, lnmis, win)
    ref_best = np.asarray(ref_best)
    ref_off = np.asarray(ref_off)

    for order in ("hml", "lmh"):
        b3, o3 = split3_best_offsets(codes, delta, lnmis, win, order=order)
        b3 = np.asarray(b3)
        o3 = np.asarray(o3)
        eq_b = (b3.view(np.int32) == ref_best.view(np.int32)).mean()
        eq_o = (o3 == ref_off).mean()
        md = float(np.abs(b3 - ref_best).max())
        print(f"order={order}: bitwise best={eq_b:.6f} off={eq_o:.6f} "
              f"maxdiff={md:.3e}")

    # timing: chained-difference
    def run_chain(step, n):
        carry = lnmis
        for _ in range(n):
            out = step(codes, delta, carry, win)
            carry = carry + out[0] * 0.0
        return carry

    def timed(step, n):
        r = run_chain(step, n)
        np.asarray(r[:1])
        best = float("inf")
        for _ in range(6):
            t0 = time.perf_counter()
            r = run_chain(step, n)
            np.asarray(r[:1])
            best = min(best, time.perf_counter() - t0)
        return best

    for name, step in (("highest6", score_best_offsets),
                       ("split3", lambda c, d, m, w:
                        split3_best_offsets(c, d, m, w, order="hml"))):
        ts = timed(step, 1)
        tl = timed(step, 11)
        dt = (tl - ts) / 10
        print(f"{name}: step={dt*1e3:.2f}ms reads/s={B*R/dt:.3e} "
              f"mxu_tflops={2*B*R*4*L*W/dt/1e12:.1f}")


if __name__ == "__main__":
    main()
