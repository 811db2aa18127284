"""Process-fan-out scaling-efficiency artifact (VERDICT r4 #8 /
BASELINE.md scaling target).

Measures end-to-end germline reads/s at --jobs 1 / 2 / 4 over the same
synthetic multi-contig workload on this host and reports parallel
efficiency (rate_N / (N * rate_1)). The process fan-out is the
engine's scale-out axis (segments are independent; the reference
scales the same way via pyflow task fan-out). Numbers measure THIS
host's cores — on the 2-core dev VM, jobs=4 is expected to saturate
near the jobs=2 rate; that saturation point is part of the honest
report. Writes SCALING_r05.json at the repo root.

Usage: python benchmarks/scaling_r05.py [--mb-per-contig 1] [--contigs 4]
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from benchmarks import synth  # noqa: E402
from strelka_tpu.io.bam import BamHeader, concat_batches  # noqa: E402
from strelka_tpu.io.bam_writer import write_bam  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb-per-contig", type=float, default=1.0)
    ap.add_argument("--contigs", type=int, default=4)
    ap.add_argument("--depth", type=int, default=40)
    ap.add_argument("--jobs", default="1,2,4")
    args = ap.parse_args()

    chunk = int(args.mb_per_contig * 1_000_000)
    names = [f"sc{i}" for i in range(args.contigs)]
    td = tempfile.mkdtemp()
    fa = os.path.join(td, "ref.fa")
    bam = os.path.join(td, "r.bam")
    n_reads = 0
    batches = []
    with open(fa, "w") as f:
        for ci in range(args.contigs):
            refs, batch, _ = synth.generate(
                L=chunk, depth=args.depth, snv_every=900, indel_every=900,
                ref_seed=300 + ci, seed=400 + ci)
            f.write(f">{names[ci]}\n")
            for i in range(0, len(refs), 70):
                f.write(refs[i:i + 70] + "\n")
            batch.tid = np.full(batch.n, ci, dtype=batch.tid.dtype)
            batches.append(batch)
            n_reads += batch.n
    allb = concat_batches(batches) if len(batches) > 1 else batches[0]
    write_bam(bam, BamHeader(text="", ref_names=names,
                             ref_lengths=[chunk] * args.contigs), allb)
    del batches, allb
    print(f"workload: {n_reads} reads over {args.contigs} x "
          f"{chunk / 1e6:.1f}Mb contigs", file=sys.stderr)

    import subprocess
    rows = []
    base_env = dict(os.environ)
    base_env["PYTHONPATH"] = (os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))) + ":"
        + base_env.get("PYTHONPATH", ""))
    for jobs in (int(x) for x in args.jobs.split(",")):
        out = os.path.join(td, f"out_j{jobs}")
        # warm (compile-cache) run is unnecessary: each worker process
        # pays one jit warmup; that cost is part of honest end-to-end
        # wall but amortized by using enough work per worker
        t0 = time.time()
        rc = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.config.update('jax_platforms','cpu');"
             "import sys; from strelka_tpu.workflow.germline import "
             "run_germline; sys.exit(run_germline(sys.argv[1:]))",
             "--reference", fa, "--align-file", bam, "--exome",
             "--platform", "cpu",  # workers must not init the tunneled
                                   # TPU backend: this artifact measures
                                   # HOST-core scaling
             "--output-dir", out, "--jobs", str(jobs)],
            env=base_env).returncode
        wall = time.time() - t0
        assert rc == 0, rc
        rows.append({"jobs": jobs, "wall_s": round(wall, 1),
                     "reads_per_s": round(n_reads / wall, 1)})
        print(rows[-1], file=sys.stderr)
        shutil.rmtree(out, ignore_errors=True)

    r1 = rows[0]["reads_per_s"]
    for r in rows:
        r["efficiency_vs_1"] = round(r["reads_per_s"] / (r["jobs"] * r1), 3)
    doc = {"workload_reads": n_reads,
           "contigs": args.contigs,
           "mb_per_contig": args.mb_per_contig,
           "host_cpus": os.cpu_count(),
           "rows": rows,
           "note": ("process fan-out over independent contig segments. "
                    "NOTE jobs=1 is not single-core: the native layers "
                    "(BGZF parallel inflate, threaded pileup fill) "
                    "already thread inside one process, so one worker "
                    "can saturate a small host and extra workers "
                    "oversubscribe — the fan-out axis pays off across "
                    "hosts/cores beyond the intra-process threading "
                    "scale. Chip-level rate is BENCH_r05.json; "
                    "ICI-mesh correctness is MULTICHIP_r05.json.")}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALING_r05.json")
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc))
    shutil.rmtree(td, ignore_errors=True)


if __name__ == "__main__":
    main()
