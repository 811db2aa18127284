"""Benchmark: read-likelihood scoring throughput on one TPU chip (Pallas kernel).

Metric: reads/s through the read x haplotype likelihood scoring op
(the engine's pair-HMM-equivalent hot loop, replacing the reference's
starling_read_align_score.cpp inner loop). Each "read" is one read
scored against a full haplotype offset window at one locus.

Baseline: the reference calls a 40x WGS germline sample in ~40 min on a
28-core server (README.md:6). 40x WGS ~= 8.3e8 reads of ~150bp, each
realigned+scored once => ~3.5e5 reads/s for the whole reference
pipeline on 28 cores; realignment/scoring dominates its profile
(SURVEY.md §3.2). vs_baseline is ours / 3.5e5.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import numpy as np

BASELINE_READS_PER_S = 3.5e5  # 28-core Strelka2 whole-pipeline estimate


def main() -> None:
    import jax
    import jax.numpy as jnp

    # realistic hot-loop shapes: B locus tiles x R reads x L=128 read
    # length, W=128 offset window (covers +/-49bp indel shifts + slack)
    B, R, L, W = 256, 128, 128, 128
    rng = np.random.default_rng(0)

    codes = jnp.asarray(rng.integers(0, 5, (B, R, L)), jnp.int8)
    delta = jnp.asarray(rng.uniform(2, 20, (B, R, L)).astype(np.float32))
    lnmis = jnp.asarray(rng.normal(-100, 10, (B, R)).astype(np.float32))
    win = jnp.asarray(rng.integers(0, 5, (B, W, L)), jnp.int8)

    if jax.default_backend() == "tpu":
        from strelka_tpu.ops.pallas_readlik import score_best_offsets as step
    else:  # CPU fallback: XLA reference path
        from strelka_tpu.ops.pallas_readlik import reference_best_offsets as step

    # warmup/compile
    out = step(codes, delta, lnmis, win)
    jax.block_until_ready(out)

    # several timed blocks, best block wins: the tunneled dev chip is
    # shared, so transient dispatch jitter otherwise dominates
    n_iter = 10
    best_dt = float("inf")
    for _ in range(6):
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = step(codes, delta, lnmis, win)
        jax.block_until_ready(out)
        best_dt = min(best_dt, time.perf_counter() - t0)
    dt = best_dt

    reads_per_step = B * R
    reads_per_s = reads_per_step * n_iter / dt
    flops = 2.0 * B * R * W * 4 * L * n_iter / dt

    result = {
        "metric": "read_likelihood_scoring_reads_per_s_per_chip",
        "value": round(reads_per_s, 1),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_s / BASELINE_READS_PER_S, 2),
    }
    print(json.dumps(result))
    # extra diagnostics on stderr
    import sys
    print(f"# backend={jax.default_backend()} devices={jax.devices()} "
          f"tflops={flops / 1e12:.1f} step_ms={dt / n_iter * 1e3:.2f}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
