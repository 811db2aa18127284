"""Profile the split3 kernel's cost components on the real chip:
full kernel vs no-slab-build vs no-reduce vs matmul-only, plus a
transpose_rhs variant (w stored [W, 4L], no .T relayout) and a
host-split variant (delta hi/mid/lo precomputed outside the kernel).
Chained-difference timing throughout (bench.py docstring)."""
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


def _kernel(variant, codes_ref, delta_ref, lnmis_ref, win_ref,
            best_ref, bestoff_ref, a_scratch, w_scratch):
    G = codes_ref.shape[0]
    L = codes_ref.shape[2]
    build = "noslab" not in variant
    reduce_ = "noreduce" not in variant
    trhs = "trhs" in variant
    for g in range(G):
        if build:
            codes = codes_ref[g].astype(jnp.int32)
            delta = delta_ref[g]
            win = win_ref[g].astype(jnp.int32)
            for b in range(N_BASE):
                a_scratch[:, b * L:(b + 1) * L] = \
                    jnp.where(codes == b, delta, 0.0)
                if trhs:
                    w_scratch[:, b * L:(b + 1) * L] = \
                        (win == b).astype(jnp.float32)
                else:
                    w_scratch[b * L:(b + 1) * L, :] = \
                        (win == b).astype(jnp.float32).T
        a = a_scratch[:]
        w = w_scratch[:]
        hi = a.astype(jnp.bfloat16)
        r1 = a - hi.astype(jnp.float32)
        mid = r1.astype(jnp.bfloat16)
        lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        wb = w.astype(jnp.bfloat16)

        if trhs:
            def dot(x):
                return jax.lax.dot_general(
                    x, wb, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)
        else:
            def dot(x):
                return jnp.dot(x, wb, preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.DEFAULT)
        s = (dot(hi) + dot(mid)) + dot(lo)
        s = s + lnmis_ref[g]
        if reduce_:
            best_ref[g] = jnp.max(s, axis=1, keepdims=True)
            bestoff_ref[g] = jax.lax.argmax(s, 1, jnp.int32)[:, None]
        else:
            best_ref[g] = s[:, :1]
            bestoff_ref[g] = s[:, 1:2].astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("variant",))
def run(codes, delta, lnmis, win_codes, variant):
    with jax.enable_x64(False):
        B, R, L = codes.shape
        W = win_codes.shape[1]
        G = 8
        wshape = (W, N_BASE * L) if "trhs" in variant else (N_BASE * L, W)
        out = pl.pallas_call(
            functools.partial(_kernel, variant),
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
                pltpu.VMEM(wshape, jnp.float32),
            ],
        )(codes, delta, lnmis[..., None], win_codes)
    return out[0][..., 0], out[1][..., 0]


def main():
    B, R, L, W = 512, 128, 128, 128
    rng = np.random.default_rng(0)
    q = rng.integers(2, 42, (B, R, L))
    e = np.minimum(10.0 ** (-q / 10.0), 0.75)
    delta = jnp.asarray((np.log1p(-e) - np.log(e / 3.0)).astype(np.float32))
    codes = jnp.asarray(rng.integers(0, 5, (B, R, L)), jnp.int8)
    lnmis = jnp.asarray(rng.normal(-100, 10, (B, R)).astype(np.float32))
    win = jnp.asarray(rng.integers(0, 5, (B, W, L)), jnp.int8)

    def timed(variant):
        def chain(n):
            carry = lnmis
            for _ in range(n):
                o = run(codes, delta, carry, win, variant)
                carry = carry + o[0] * 0.0
            return carry
        r = chain(1)
        np.asarray(r[:1])
        def bench(n):
            best = float("inf")
            for _ in range(6):
                t0 = time.perf_counter()
                rr = chain(n)
                np.asarray(rr[:1])
                best = min(best, time.perf_counter() - t0)
            return best
        return (bench(11) - bench(1)) / 10

    base = None
    for v in ("full", "full_trhs", "noslab", "noreduce",
              "noslab_noreduce"):
        dt = timed(v)
        if base is None:
            base = dt
        print(f"{v}: step={dt*1e3:.3f}ms reads/s={B*R/dt:.3e}")
    # correctness spot check for trhs vs plain
    a = np.asarray(run(codes, delta, lnmis, win, "full")[0])
    b = np.asarray(run(codes, delta, lnmis, win, "full_trhs")[0])
    print(f"trhs bitwise vs plain: {(a == b).mean():.4f} "
          f"maxdiff={np.abs(a-b).max():.2e}")


if __name__ == "__main__":
    main()
