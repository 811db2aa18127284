"""End-to-end device-occupancy artifact on the REAL TPU backend.

Runs the somatic demo twice (first run warms the compile cache; the
second is timed), tallies every scoring-kernel launch shape
(realign_batch.LAUNCH_STATS), then measures the true per-step device
time of each launched shape with the chained-difference method (the
tunnel's block_until_ready returns before device completion — see
bench.py) and reports

    occupancy = sum(launches x device_step_time) / end-to-end wall

— the honest "how idle is the chip in a real run" number VERDICT r2 #9
asks to track round over round, complementing bench_scaling.py's
dispatch-efficiency metric. Prints one JSON line per shape plus a
summary JSON line.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DEMO = "/root/reference/src/demo/data"


def run_demo(out):
    from strelka_tpu.workflow.somatic import run_somatic
    shutil.rmtree(out, ignore_errors=True)
    rc = run_somatic([
        "--reference", f"{DEMO}/demo20.fa",
        "--normal-align-file", f"{DEMO}/NA12892_demo20.bam",
        "--tumor-align-file", f"{DEMO}/NA12891_demo20.bam",
        "--output-dir", out, "--exome",
    ])
    assert rc == 0, rc


def step_time(B, R, L, W, n_long=9):
    """Per-launch device time via chained-difference timing."""
    import jax
    import jax.numpy as jnp

    from strelka_tpu.ops.pallas_readlik import score_best_offsets as step
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 5, (B, R, L)), jnp.int8)
    delta = jnp.asarray(rng.uniform(2, 20, (B, R, L)).astype(np.float32))
    lnmis = jnp.asarray(rng.normal(-100, 10, (B, R)).astype(np.float32))
    win = jnp.asarray(rng.integers(0, 5, (B, L, W)), jnp.int8)

    def chain(n):
        carry = lnmis
        for _ in range(n):
            o = step(codes, delta, carry, win)
            carry = carry + o[0] * 0.0
        return carry

    def timed(n):
        r = chain(n)
        np.asarray(r[:1])
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            r = chain(n)
            np.asarray(r[:1])
            best = min(best, time.perf_counter() - t0)
        return best

    return max(timed(n_long) - timed(1), 1e-9) / (n_long - 1)


def main():
    import jax

    from strelka_tpu.pipeline import realign_batch as rb

    backend = jax.default_backend()
    print(f"# backend={backend}", file=sys.stderr)
    run_demo("/tmp/occ_warm")          # compile-cache warm-up
    rb.LAUNCH_STATS = stats = {}
    t0 = time.perf_counter()
    run_demo("/tmp/occ_timed")
    wall = time.perf_counter() - t0
    rb.LAUNCH_STATS = None

    device_s = 0.0
    for (B, R, L, W), n in sorted(stats.items()):
        dt = step_time(B, R, L, W) if backend == "tpu" else float("nan")
        device_s += (dt if dt == dt else 0.0) * n
        print(json.dumps({"shape": [B, R, L, W], "launches": n,
                          "device_step_ms": round(dt * 1e3, 3)}))
    occ = device_s / wall if wall > 0 else 0.0
    print(json.dumps({
        "metric": "somatic_demo_device_occupancy",
        "backend": backend,
        "wall_s": round(wall, 2),
        "device_s_est": round(device_s, 4),
        "occupancy": round(occ, 6),
        "note": ("tunnel RTT dominates the demo wall; occupancy is the "
                 "round-over-round trend metric, not a throughput claim"),
    }))


if __name__ == "__main__":
    main()
