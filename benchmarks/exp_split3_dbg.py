"""Debug split3 mismatch: isolate whether the bf16 transpose write,
the in-kernel 3-way split, or the bf16 dot lowering breaks values."""
from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_BASE = 4


def _kernel(variant, codes_ref, delta_ref, lnmis_ref, win_ref,
            best_ref, a_scratch, w_scratch):
    G = codes_ref.shape[0]
    L = codes_ref.shape[2]
    for g in range(G):
        codes = codes_ref[g].astype(jnp.int32)
        delta = delta_ref[g]
        win = win_ref[g].astype(jnp.int32)
        for b in range(N_BASE):
            a_scratch[:, b * L:(b + 1) * L] = jnp.where(codes == b, delta, 0.0)
            w_scratch[b * L:(b + 1) * L, :] = \
                (win == b).astype(jnp.float32).T
        a = a_scratch[:]
        w = w_scratch[:]
        if variant == "highest":
            s = jnp.dot(a, w, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        elif variant == "split_nodot":
            # split and recombine WITHOUT matmul: checks split exactness
            hi = a.astype(jnp.bfloat16).astype(jnp.float32)
            r1 = a - hi
            mid = r1.astype(jnp.bfloat16).astype(jnp.float32)
            lo = (r1 - mid).astype(jnp.bfloat16).astype(jnp.float32)
            recon = (hi + mid) + lo
            s = jnp.dot(recon, w, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)

        if variant.startswith("chunk"):
            ck = int(variant.split("_")[1])
            hi = a.astype(jnp.bfloat16)
            r1 = a - hi.astype(jnp.float32)
            mid = r1.astype(jnp.bfloat16)
            lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
            wb = w.astype(jnp.bfloat16)
            K = a.shape[1]
            s = None
            for c0 in range(0, K, ck):
                sl = slice(c0, c0 + ck)
                def dotc(x):
                    return jnp.dot(x[:, sl], wb[sl, :],
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.DEFAULT)
                part = (dotc(hi) + dotc(mid)) + dotc(lo)
                s = part if s is None else s + part
        elif variant == "split3_cast":  # split3_cast: 3 bf16 dots, w cast at use (no bf16 store)
            hi = a.astype(jnp.bfloat16)
            r1 = a - hi.astype(jnp.float32)
            mid = r1.astype(jnp.bfloat16)
            lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
            wb = w.astype(jnp.bfloat16)

            def dot(x):
                return jnp.dot(x, wb, preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.DEFAULT)
            s = (dot(hi) + dot(mid)) + dot(lo)
        s = s + lnmis_ref[g]
        best_ref[g] = jnp.max(s, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("variant",))
def run(codes, delta, lnmis, win_codes, variant):
    with jax.enable_x64(False):
        B, R, L = codes.shape
        W = win_codes.shape[1]
        G = 4
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
            ],
            out_shape=[jax.ShapeDtypeStruct((B, R, 1), jnp.float32)],
            scratch_shapes=[
                pltpu.VMEM((R, N_BASE * L), jnp.float32),
                pltpu.VMEM((N_BASE * L, W), jnp.float32),
            ],
        )(codes, delta, lnmis[..., None], win_codes)
    return out[0][..., 0]


def main():
    B, R, L, W = 8, 128, 128, 128
    rng = np.random.default_rng(0)
    q = rng.integers(2, 42, (B, R, L))
    e = np.minimum(10.0 ** (-q / 10.0), 0.75)
    delta_np = (np.log1p(-e) - np.log(e / 3.0)).astype(np.float32)
    codes_np = rng.integers(0, 5, (B, R, L)).astype(np.int8)
    lnmis_np = rng.normal(-100, 10, (B, R)).astype(np.float32)
    win_np = rng.integers(0, 5, (B, W, L)).astype(np.int8)

    codes = jnp.asarray(codes_np)
    delta = jnp.asarray(delta_np)
    lnmis = jnp.asarray(lnmis_np)
    win = jnp.asarray(win_np)

    # f64 ground truth
    s64 = np.zeros((B, R, W))
    for b in range(B):
        match = codes_np[b][:, None, :] == win_np[b][None, :, :]  # R,W,L
        s64[b] = (np.where(match, delta_np[b][:, None, :].astype(np.float64),
                           0.0)).sum(-1)
    best64 = s64.max(-1) + lnmis_np

    ref = np.asarray(run(codes, delta, lnmis, win, "highest"))
    for v in ("split3_cast", "chunk_128", "chunk_256"):
        r = np.asarray(run(codes, delta, lnmis, win, v))
        print(f"{v}: vs_highest bitwise={(r == ref).mean():.4f} "
              f"maxdiff={np.abs(r - ref).max():.3e} "
              f"vs_f64 maxerr={np.abs(r - best64).max():.3e}")
    print(f"highest vs_f64 maxerr={np.abs(ref - best64).max():.3e}")


if __name__ == "__main__":
    main()
