"""Mesh scaling-efficiency report for the sharded call step.

BASELINE.md target: reads/s at 1 chip / 1 host / >=N hosts with a
scaling-efficiency report. Real multi-chip hardware is not reachable
from this environment, so the report measures weak scaling of the
jit-compiled dp x sp sharded region step (parallel/mesh.py) over a
virtual device mesh (XLA host platform) — the same program that runs
on a pod slice, with XLA inserting the cross-shard collectives.

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
          python bench_scaling.py
Prints one JSON line per mesh size plus a summary line.

Caveat: with virtual host-platform devices all shards share the same
physical cores, so the efficiency column reflects host-core contention
and XLA CPU thread scheduling, NOT ICI scaling — on this dev box the
numbers validate only that the sharded program compiles and runs at
every mesh size. Run on a real pod slice for meaningful efficiency.
"""
from __future__ import annotations

import json
import time


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    try:  # virtual 8-device mesh without needing env vars set pre-import
        jax.config.update("jax_num_cpu_devices", 8)
    except Exception:
        pass  # backend already initialized (env-var route still works)
    import numpy as np

    from strelka_tpu.parallel import mesh as pm

    n_avail = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8) if n <= n_avail]
    results = []
    base_rate = None
    for n in sizes:
        m = pm.make_mesh(jax.devices()[:n])
        step = pm.make_sharded_call_step(m)
        # weak scaling: per-device work constant
        args = pm.example_region_inputs(n_loci=1024 * n, n_tiles=8 * n,
                                        reads=64)
        with m:
            out = step(*args)
            jax.block_until_ready(out)
            n_iter = 5
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(n_iter):
                    out = step(*args)
                jax.block_until_ready(out)
                best = min(best, (time.perf_counter() - t0) / n_iter)
        reads = args[5].shape[0] * args[5].shape[1]  # tiles x reads
        rate = reads / best
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * n)
        rec = {"devices": n, "dp": int(m.shape["dp"]),
               "sp": int(m.shape["sp"]),
               "step_ms": round(best * 1e3, 2),
               "scored_reads_per_s": round(rate, 1),
               "weak_scaling_efficiency": round(eff, 3)}
        results.append(rec)
        print(json.dumps(rec))
    import os

    summary = {"summary": "weak scaling over dp-sharded call step",
               "sizes": sizes,
               "efficiency": [r["weak_scaling_efficiency"]
                              for r in results]}
    if jax.default_backend() == "cpu":
        # N virtual devices share the host's physical cores, so wall
        # time grows with total work and efficiency collapses by
        # construction; this mode validates sharding correctness and
        # compile only. Real efficiency needs real chips (the step has
        # no cross-dp collectives, so near-1.0 is expected on ICI).
        summary["note"] = (
            f"virtual CPU devices share {os.cpu_count()} physical "
            "cores; efficiency is meaningful only on real multi-chip")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
