"""Profile the host-side germline call path on synthetic data.

Usage:
  python benchmarks/profile_host.py [--mode indel|snv|mixed] [--length N]
      [--depth D] [--profile] [--sens]

Runs call_region + emit_region on one synthetic region and reports
reads/s; with --profile prints the cProfile hotspots (generation and
jit-compile excluded by a warmup run on a small prefix).
"""
from __future__ import annotations

import argparse
import cProfile
import pstats
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

from strelka_tpu.io.fasta import FastaReference  # noqa: E402
from strelka_tpu.options import GermlineOptions  # noqa: E402
from strelka_tpu.pipeline import germline_caller as gc  # noqa: E402
from strelka_tpu.pipeline import gvcf  # noqa: E402

from benchmarks import synth  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="indel",
                    choices=["indel", "snv", "mixed", "somatic",
                             "somatic-indel"])
    ap.add_argument("--length", type=int, default=400_000)
    ap.add_argument("--depth", type=int, default=40)
    ap.add_argument("--profile", action="store_true")
    ap.add_argument("--sens", action="store_true", help="report indel recall")
    ap.add_argument("--repeat", type=int, default=1,
                    help="run N times, report each (later runs are "
                         "steady-state: tile arenas resident, jit warm)")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    somatic = args.mode in ("somatic", "somatic-indel")
    kw = dict(L=args.length, depth=args.depth)
    if args.mode == "indel":
        kw.update(indel_every=300)
    elif args.mode == "snv":
        kw.update(snv_every=300)
    elif args.mode == "somatic":
        kw.update(snv_every=900)
    elif args.mode == "somatic-indel":
        # germline SNVs + germline indels in both samples; the tumor
        # additionally carries VAF somatic indels (set below)
        kw.update(snv_every=900, indel_every=900)
    else:
        kw.update(snv_every=600, indel_every=600)

    print(f"generating {args.mode} region L={args.length} depth={args.depth}",
          file=sys.stderr)
    if somatic:
        # one reference + shared germline truth (ref_seed);
        # independent read sampling per sample, tumor at 2x depth
        tkw = dict(kw, depth=2 * args.depth)
        if args.mode == "somatic-indel":
            tkw.update(somatic_indel_every=1100, somatic_vaf=0.3)
        refs, normal, truth = synth.generate(**kw, seed=11, ref_seed=11)
        _, tumor, _ = synth.generate(**tkw, seed=12, ref_seed=11)
        batch = tumor  # reads/s counts tumor+normal below
    else:
        refs, batch, truth = synth.generate(**kw)

    import tempfile, os
    td = tempfile.mkdtemp()
    fa = os.path.join(td, "ref.fa")
    with open(fa, "w") as f:
        f.write(">syn\n" + refs + "\n")
    ref = FastaReference(fa)
    opt = GermlineOptions()

    # warmup on a small prefix to populate jit caches
    warm_kw = dict(kw)
    warm_kw["L"] = 40_000
    wrefs, wbatch, _ = synth.generate(**warm_kw)
    wfa = os.path.join(td, "wref.fa")
    with open(wfa, "w") as f:
        f.write(">syn\n" + wrefs + "\n")

    if somatic:
        from strelka_tpu.options import SomaticOptions
        from strelka_tpu.pipeline import somatic_caller as scall
        sopt = SomaticOptions()
        _, wtumor, _ = synth.generate(**dict(warm_kw, depth=2 * args.depth),
                                      seed=12, ref_seed=warm_kw.get(
                                          "seed", 7))
        scall.call_somatic_region(sopt, FastaReference(wfa), "syn", 0,
                                  40_000, wbatch, wtumor)
        n_reads = normal.n + tumor.n

        def run():
            res = scall.call_somatic_region(sopt, ref, "syn", 0,
                                            args.length, normal, tumor)
            return [f"{s.pos}" for s in res.snvs]
    else:
        gc.call_region(opt, FastaReference(wfa), "syn", 0, 40_000, [wbatch])
        n_reads = batch.n

        def run():
            res = gc.call_region(opt, ref, "syn", 0, args.length, [batch])
            g, v = gvcf.emit_region(opt, res, ["S"])
            return v

    for it in range(max(1, args.repeat)):
        t0 = time.perf_counter()
        if args.profile and it == max(1, args.repeat) - 1:
            pr = cProfile.Profile()
            pr.enable()
            vlines = run()
            pr.disable()
        else:
            vlines = run()
        dt = time.perf_counter() - t0
        print(f"reads={n_reads} wall={dt:.2f}s "
              f"reads/s={n_reads / dt:,.0f} variants={len(vlines)}")
    if args.sens and not somatic:
        called_indel = set()
        for l in vlines:
            f = l.split("\t")
            if len(f[3]) != len(f[4]):
                called_indel.add(int(f[1]))
        for kind in ("del", "ins"):
            t = truth[kind]
            tp = sum(1 for p in t if any(abs(p - c) <= 3 for c in called_indel))
            if t:
                print(f"{kind} recall: {tp}/{len(t)} = {tp / len(t):.3f}")
    if args.profile:
        st = pstats.Stats(pr)
        st.sort_stats("cumulative").print_stats(args.top)
        st.sort_stats("tottime").print_stats(args.top)


if __name__ == "__main__":
    main()
