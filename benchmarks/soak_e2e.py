"""End-to-end production soak: synthetic BAM -> germline CLI with
--jobs fan-out, a mid-run kill, and checkpointed resume.

Usage:
  PYTHONPATH=. python benchmarks/soak_e2e.py [--length 2000000]
      [--depth 40] [--jobs 2] [--no-kill]

Validates, at CLI granularity (the production surface):
  1. fan-out output == what a single process would produce (records)
  2. a worker killed mid-run resumes from the task-state file and the
     final merge is complete
  3. planted SNV/indel sensitivity on the merged output
and reports end-to-end reads/s (BAM decode -> gVCF write included).
"""
from __future__ import annotations

import argparse
import glob
import gzip
import os
import signal
import subprocess
import sys
import tempfile
import time

import numpy as np

from strelka_tpu.io.bam import BamHeader
from strelka_tpu.io.bam_writer import write_bam

from benchmarks import synth


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--length", type=int, default=2_000_000)
    ap.add_argument("--depth", type=int, default=40)
    ap.add_argument("--jobs", type=int, default=2)
    ap.add_argument("--no-kill", action="store_true")
    ap.add_argument("--samples", type=int, default=1,
                    help="joint multi-sample germline: N samples share "
                         "one planted truth, each with independently "
                         "sampled reads; the joint check requires every "
                         "shared PASS SNV to genotype as variant in all "
                         "sample columns")
    ap.add_argument("--somatic", action="store_true",
                    help="tumor/normal CLI soak: shared germline truth, "
                         "tumor at 2x depth with VAF-0.3 somatic SNVs")
    args = ap.parse_args()
    if args.somatic:
        return somatic_soak(args)

    td = tempfile.mkdtemp(prefix="soak_")
    print(f"workdir {td}", file=sys.stderr)
    t0 = time.time()
    kw = dict(L=args.length, depth=args.depth, snv_every=900,
              indel_every=900, ref_seed=7)
    bams = []
    n_reads = 0
    hdr = BamHeader(text="", ref_names=["soak1"],
                    ref_lengths=[args.length])
    for si in range(args.samples):
        refs, batch, truth = synth.generate(**kw, seed=7 + si)
        bam = os.path.join(td, f"sample{si}.bam")
        write_bam(bam, hdr, batch)
        bams.append(bam)
        n_reads += batch.n
    fa = os.path.join(td, "ref.fa")
    with open(fa, "w") as f:
        f.write(">soak1\n")
        for i in range(0, len(refs), 70):
            f.write(refs[i:i + 70] + "\n")
    print(f"generated {n_reads} reads x {args.samples} sample(s) "
          f"in {time.time() - t0:.0f}s", file=sys.stderr)

    out = os.path.join(td, "run")

    def cli(outdir):
        cmd = [sys.executable, "-m", "strelka_tpu.workflow.germline",
               "--reference", fa, "--output-dir", outdir, "--exome",
               "--platform", "cpu"]
        for b in bams:
            cmd += ["--align-file", b]
        return cmd

    # 1. timed fresh fan-out run (the headline number)
    t1 = time.time()
    r = subprocess.run(cli(out) + ["--jobs", str(args.jobs)])
    wall = time.time() - t1
    assert r.returncode == 0, "fan-out run failed"

    if not args.no_kill:
        # 2. interrupt/resume at task granularity: kill a fresh
        # single-worker run as soon as one segment fragment lands, then
        # rerun — the task-state file must skip completed segments and
        # the merged records must match run 1
        out2 = os.path.join(td, "resume")
        pr = subprocess.Popen(cli(out2) + ["--process-index", "0",
                                           "--process-count", "1"],
                              stderr=subprocess.DEVNULL)
        deadline = time.time() + 600
        while time.time() < deadline and pr.poll() is None:
            if glob.glob(os.path.join(out2, "workspace", "seg_*")):
                break
            time.sleep(0.05)
        if pr.poll() is None:
            pr.send_signal(signal.SIGKILL)
            pr.wait()
        ws2 = os.path.join(out2, "workspace")
        pre = len({f.split(".")[0] for f in
                   (os.listdir(ws2) if os.path.isdir(ws2) else [])
                   if f.startswith("seg_")})
        r2 = subprocess.run(cli(out2) + ["--jobs", str(args.jobs)],
                            capture_output=True)
        assert r2.returncode == 0, "resume run failed"
        resumed = b"resume" in r2.stderr or pre == 0

        def recs(p):
            with gzip.open(os.path.join(p, "variants.vcf.gz"), "rt") as f:
                return [l for l in f if not l.startswith("#")]

        assert recs(out) == recs(out2), "resume output != fresh output"
        print(f"resume check: killed with {pre} segment(s) done, rerun "
              f"matched fresh records ({'resumed' if resumed else 'redid'})",
              file=sys.stderr)

    # parse calls
    called_snv, called_indel = set(), set()
    pass_snv = set()
    n_var = 0
    with gzip.open(os.path.join(out, "variants.vcf.gz"), "rt") as f:
        for line in f:
            if line.startswith("#"):
                continue
            n_var += 1
            fields = line.split("\t")
            if fields[6] not in ("PASS", "NoPassedVariantGTs"):
                continue
            p = int(fields[1]) - 1
            if len(fields[3]) == 1 and all(len(a) == 1
                                           for a in fields[4].split(",")):
                called_snv.add(p)
                if fields[6] == "PASS":
                    pass_snv.add(p)
            else:
                called_indel.add(p + 1)

    def recall(tset, called, tol):
        tp = sum(1 for p in tset if any(abs(p - c) <= tol for c in called))
        return tp, len(tset)

    if args.samples > 1:
        # joint check: shared variants must genotype as variant in
        # every sample column
        n_all = n_joint = 0
        with gzip.open(os.path.join(out, "variants.vcf.gz"), "rt") as f:
            for line in f:
                if line.startswith("#"):
                    continue
                fields = line.rstrip("\n").split("\t")
                p = int(fields[1]) - 1
                if p in set(truth["snv"]) and fields[6] == "PASS":
                    n_all += 1
                    gts = [c.split(":")[0] for c in fields[9:]]
                    if all(g.replace("|", "/") in ("0/1", "1/0", "1/1")
                           for g in gts):
                        n_joint += 1
        print(f"joint: {n_joint}/{n_all} shared PASS SNVs variant in "
              f"all {args.samples} samples")
        assert n_joint >= 0.98 * max(n_all, 1)

    s_tp, s_n = recall(truth["snv"], called_snv, 0)
    d_tp, d_n = recall(truth["del"], called_indel, 3)
    i_tp, i_n = recall(truth["ins"], called_indel, 3)
    fp_snv = sum(1 for p in pass_snv if all(abs(p - q) > 0
                 for q in truth["snv"]))
    print(f"soak: reads={n_reads} wall={wall:.0f}s "
          f"reads/s={n_reads / wall:,.0f} (jobs={args.jobs}) "
          f"variants={n_var}")
    print(f"SNV recall {s_tp}/{s_n}  del {d_tp}/{d_n}  ins {i_tp}/{i_n}  "
          f"SNV FP {fp_snv}")
    ok = (s_tp >= 0.99 * s_n and d_tp >= 0.97 * d_n and i_tp >= 0.97 * i_n
          and fp_snv <= max(3, 0.01 * s_n))
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1




def somatic_soak(args):
    td = tempfile.mkdtemp(prefix="soaksom_")
    print(f"workdir {td}", file=sys.stderr)
    t0 = time.time()
    kw = dict(L=args.length, depth=args.depth, snv_every=1200,
              ref_seed=21)
    refs, normal, truth = synth.generate(**kw, seed=21)
    _, tumor, truth_t = synth.generate(
        **dict(kw, depth=2 * args.depth), seed=22,
        somatic_every=1200, somatic_vaf=0.3, somatic_indel_every=1500)
    fa = os.path.join(td, "ref.fa")
    with open(fa, "w") as f:
        f.write(">soak1\n")
        for i in range(0, len(refs), 70):
            f.write(refs[i:i + 70] + "\n")
    hdr = BamHeader(text="", ref_names=["soak1"],
                    ref_lengths=[args.length])
    nbam = os.path.join(td, "normal.bam")
    tbam = os.path.join(td, "tumor.bam")
    write_bam(nbam, hdr, normal)
    write_bam(tbam, hdr, tumor)
    n_reads = normal.n + tumor.n
    print(f"generated {n_reads} reads ({len(truth_t['som_snv'])} somatic "
          f"sites) in {time.time() - t0:.0f}s", file=sys.stderr)

    out = os.path.join(td, "run")
    t1 = time.time()
    r = subprocess.run(
        [sys.executable, "-m", "strelka_tpu.workflow.somatic",
         "--reference", fa, "--normal-align-file", nbam,
         "--tumor-align-file", tbam, "--output-dir", out, "--exome",
         "--platform", "cpu", "--jobs", str(args.jobs)])
    wall = time.time() - t1
    assert r.returncode == 0, "somatic fan-out run failed"

    called_pass, called_any = set(), set()
    with gzip.open(os.path.join(out, "somatic.snvs.vcf.gz"), "rt") as f:
        for line in f:
            if line.startswith("#"):
                continue
            fields = line.split("\t")
            p = int(fields[1]) - 1
            called_any.add(p)
            if fields[6] == "PASS":
                called_pass.add(p)
    ind_pass = set()
    with gzip.open(os.path.join(out, "somatic.indels.vcf.gz"), "rt") as f:
        for line in f:
            if line.startswith("#"):
                continue
            fields = line.split("\t")
            if fields[6] == "PASS":
                ind_pass.add(int(fields[1]) - 1)
    som_ind = set(truth_t["som_del"]) | set(truth_t["som_ins"])
    ind_tp = sum(1 for p in som_ind
                 if any(abs(p - c) <= 3 for c in ind_pass))
    ind_fp = sum(1 for c in ind_pass
                 if all(abs(p - c) > 3 for p in som_ind))
    som = set(truth_t["som_snv"])
    tp = len(som & called_pass)
    germline_leak = sum(1 for p in called_pass
                        if any(abs(p - q) <= 0 for q in truth["snv"]))
    fp = len(called_pass - som)
    print(f"somatic soak: reads={n_reads} wall={wall:.0f}s "
          f"reads/s={n_reads / wall:,.0f} (jobs={args.jobs})")
    print(f"somatic SNV recall {tp}/{len(som)}  PASS FP {fp} "
          f"(germline leaks {germline_leak})")
    print(f"somatic indel recall {ind_tp}/{len(som_ind)}  PASS FP {ind_fp}")
    ok = (tp >= 0.97 * len(som) and fp <= max(2, 0.01 * len(som))
          and ind_tp >= 0.95 * len(som_ind)
          and ind_fp <= max(2, 0.02 * len(som_ind)))
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
