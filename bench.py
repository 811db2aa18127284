"""Benchmark: read-likelihood scoring throughput on one TPU chip (Pallas kernel).

Metric: reads/s through the read x haplotype likelihood scoring op
(the engine's pair-HMM-equivalent hot loop, replacing the reference's
starling_read_align_score.cpp inner loop). Each "read" is one read
scored against a full haplotype offset window at one locus.

Measurement: the tunneled dev chip's block_until_ready returns before
device completion (async metadata future), so naive dispatch loops
overstate throughput by >10x. Instead, N kernel steps are chained
EAGERLY with a real device-side data dependency (step k's output
perturbs step k+1's lnmis input by 0.0; wrapping the chain in a jitted
fori_loop compiles pathologically slowly over the tunnel), completion
is forced by fetching one output element, and the per-step time is the
difference between a long and a short chain — cancelling the tunnel
RTT and dispatch overhead exactly.

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
    B, R, L, W = 512, 128, 128, 128
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        B = 64  # CPU fallback: keep the run short
    rng = np.random.default_rng(0)

    codes = jnp.asarray(rng.integers(0, 5, (B, R, L)), jnp.int8)
    delta = jnp.asarray(rng.uniform(2, 20, (B, R, L)).astype(np.float32))
    lnmis = jnp.asarray(rng.normal(-100, 10, (B, R)).astype(np.float32))
    win = jnp.asarray(rng.integers(0, 5, (B, L, W)), jnp.int8)

    if on_tpu:
        from strelka_tpu.ops.pallas_readlik import score_best_offsets as step
    else:  # CPU fallback: XLA reference path
        from strelka_tpu.ops.pallas_readlik import reference_best_offsets as step

    def run_chain(n_steps):
        # eager chaining: step k's output perturbs step k+1's lnmis
        # input by 0.0 — a real device-side data dependency, so the
        # steps execute sequentially, with one compile of the kernel
        # (fori_loop wrapping compiles too slowly over the tunnel)
        carry = lnmis
        for _ in range(n_steps):
            out = step(codes, delta, carry, win)
            o = out[0] if isinstance(out, tuple) else out
            carry = carry + o.astype(carry.dtype) * 0.0
        return carry

    N_SHORT, N_LONG = 1, 11

    def timed(n_steps):
        # warmup/compile, then best-of: the dev chip is shared
        r = run_chain(n_steps)
        np.asarray(r[:1])
        best = float("inf")
        for _ in range(8):
            t0 = time.perf_counter()
            r = run_chain(n_steps)
            np.asarray(r[:1])  # force true completion (one tiny fetch)
            best = min(best, time.perf_counter() - t0)
        return best

    # six short/long rounds interleaved: the shared dev chip has
    # multi-second busy windows from other tenants (measured swings of
    # 2-5x within one session); taking the best matched pair keeps the
    # difference method honest while dodging a window that would
    # otherwise taint the whole measurement. Rounds cost ~0.3s each
    # against the ~2min compile, so more minima are nearly free.
    # ...and SPREAD over ~a minute: tenant busy windows last seconds to
    # minutes, so back-to-back rounds all land in the same window
    t_short = timed(N_SHORT)
    t_long = timed(N_LONG)
    for _ in range(5):
        time.sleep(10)
        t_short = min(t_short, timed(N_SHORT))
        t_long = min(t_long, timed(N_LONG))
    dt_step = max(t_long - t_short, 1e-9) / (N_LONG - N_SHORT)

    reads_per_s = B * R / dt_step
    flops = 2.0 * B * R * W * 4 * L / dt_step

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
          f"tflops={flops / 1e12:.1f} step_ms={dt_step * 1e3:.2f} "
          f"t_short={t_short * 1e3:.1f}ms t_long={t_long * 1e3:.1f}ms",
          file=sys.stderr)


if __name__ == "__main__":
    main()
