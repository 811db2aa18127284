"""Interleaved kernel A/B: round-robin the variants N times and report
per-variant median-of-best to dodge the shared chip's multi-second busy
windows (single-shot ordering is worth +-2x; see r5 log).

Usage: python benchmarks/exp_interleave.py [rounds] [variant ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp


def main():
    import benchmarks.exp_exact_kernel as ek
    from strelka_tpu.ops import pallas_readlik as pk
    from strelka_tpu.ops.readlik import quantized_qscore_luts

    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    variants = sys.argv[2:] or ["limb2G2", "limb2r@16"]
    B, R, L, W = 512, 128, 128, 128
    B = int(os.environ.get("EXP_B", B))
    R = int(os.environ.get("EXP_R", R))
    rng = np.random.default_rng(0)
    dl2, _ = ek._quant2_luts()
    q = rng.integers(2, 42, (B, R, L))
    codes_np = rng.integers(0, 5, (B, R, L)).astype(np.int8)
    delta2_np = np.where(codes_np < 4, dl2[q], 0).astype(np.float32)
    _, ml = quantized_qscore_luts()
    lnmis_np = np.where(codes_np < 4, ml[q], 0).sum(2).astype(np.float32)
    win_np = rng.integers(0, 5, (B, L, W)).astype(np.int8)
    codes, delta2, lnmis, win = (jnp.asarray(codes_np), jnp.asarray(delta2_np),
                                 jnp.asarray(lnmis_np), jnp.asarray(win_np))

    steps = {}
    for name in variants:
        if name == "prod":
            steps[name] = lambda c, d, m, w: pk.score_best_offsets(c, d, m, w)
        else:
            G = 4
            if "@" in name:
                G = int(name.split("@")[1])
            elif name.endswith("G2"):
                G = 2
            elif name.endswith("G8"):
                G = 8
            steps[name] = ek.build(name, B, R, L, W, G)

    def timed(step, n):
        def chain(k):
            carry = lnmis
            for _ in range(k):
                o = step(codes, delta2, carry, win)
                carry = carry + o[0] * 0.0
            return carry
        r = chain(n)
        np.asarray(r[:1])
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            r = chain(n)
            np.asarray(r[:1])
            best = min(best, time.perf_counter() - t0)
        return best

    results = {name: [] for name in variants}
    for rd in range(rounds):
        for name in variants:
            ts = timed(steps[name], 1)
            tl = timed(steps[name], 11)
            dt = max(tl - ts, 1e-9) / 10
            results[name].append(dt)
            print(f"  r{rd} {name}: {dt*1e3:.3f}ms {B*R/dt/1e6:.0f}M",
                  flush=True)
    print("== summary (median / best over rounds) ==")
    for name in variants:
        med = float(np.median(results[name]))
        best = min(results[name])
        print(f"{name}: median {med*1e3:.3f}ms ({B*R/med/1e6:.0f}M) "
              f"best {best*1e3:.3f}ms ({B*R/best/1e6:.0f}M)")


if __name__ == "__main__":
    main()
