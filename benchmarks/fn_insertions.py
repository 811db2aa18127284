"""Insertion false-negative analysis (VERDICT r4 #6).

SOAK_r04 showed insertion recall (99.5%) lagging deletions (99.93%)
and SNVs (99.96%). This script reproduces the soak's generator +
caller on CPU, classifies every missed insertion, and prints a
breakdown. Classes checked, in order:

  shifted      — an insertion WAS called, but left-shift normalization
                 moved it further than the soak's +-3bp match
                 tolerance (repeat context); the call is correct and
                 the reference would place it identically, so these
                 are soak-metric artifacts, not caller misses
  uncandidate  — no read-backed candidate passed the binomial signal
                 test (low local coverage or unlucky read sampling)
  unreported   — candidate existed but the locus genotyped hom-ref /
                 was not emitted
  hpol         — (annotation) the insertion sits in a homopolymer run
                 >= 6 at the site

Usage: python benchmarks/fn_insertions.py [--mb 6] [--depth 40]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from benchmarks import synth  # noqa: E402
from strelka_tpu.io.fasta import FastaReference, encode_bases  # noqa: E402
from strelka_tpu.options import GermlineOptions  # noqa: E402
from strelka_tpu.pipeline import germline_caller as gc  # noqa: E402
from strelka_tpu.pipeline import gvcf  # noqa: E402


def hpol_len(codes: np.ndarray, p: int) -> int:
    b = codes[p]
    i = p
    while i > 0 and codes[i - 1] == b:
        i -= 1
    j = p
    while j + 1 < len(codes) and codes[j + 1] == b:
        j += 1
    return j - i + 1


def left_shift_distance(codes: np.ndarray, p: int, ins: np.ndarray) -> int:
    """How far left-shift normalization moves an insertion placed
    after reference position p (soak truth records p; the caller emits
    the left-shifted placement)."""
    from strelka_tpu.pipeline.candidates import left_shift_indel
    new_pos, _, _ = left_shift_indel(p + 1, 0, ins, codes, 0)
    return (p + 1) - new_pos


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=6)
    ap.add_argument("--depth", type=int, default=40)
    ap.add_argument("--chunk-mb", type=int, default=2)
    args = ap.parse_args()

    chunk = args.chunk_mb * 1_000_000
    n_chunks = max(1, args.mb // args.chunk_mb)
    tol = 3
    classes = {"shifted": [], "uncandidate": [], "unreported": []}
    n_ins = n_tp = 0
    hpol_fn = 0

    for ci in range(n_chunks):
        refs, batch, truth = synth.generate(
            L=chunk, depth=args.depth, snv_every=900, indel_every=900,
            ref_seed=100 + ci, seed=200 + ci)
        codes = encode_bases(refs)
        import tempfile
        td = tempfile.mkdtemp()
        fa = os.path.join(td, "r.fa")
        with open(fa, "w") as f:
            f.write(">c\n")
            for i in range(0, len(refs), 70):
                f.write(refs[i:i + 70] + "\n")
        ref = FastaReference(fa)
        opt = GermlineOptions()
        # segment like the soak run (whole-chunk region here; segment
        # boundaries are a separate suspect tested by chunking)
        called = set()
        called_keys = []
        seg = 400_000
        for b0 in range(0, chunk, seg):
            res = gc.call_region(opt, ref, "c", b0,
                                 min(b0 + seg, chunk), [batch])
            _g, v = gvcf.emit_region(opt, res, ["S"])
            for line in v:
                fld = line.split("\t")
                if len(fld[3]) != len(fld[4].split(",")[0]):
                    called.add(int(fld[1]))
                    called_keys.append((int(fld[1]), fld[3], fld[4]))
        ins_truth = truth["ins"]
        n_ins += len(ins_truth)
        for p in ins_truth:
            if any(abs(p - c) <= tol for c in called):
                n_tp += 1
                continue
            # FN: classify
            ins_seq = None
            # regenerate the inserted bases the generator used
            # (synth keeps them in ins_set, keyed by position) — easier:
            # search the caller's candidate store? Instead check shift
            # with both possible 2-mers from neighbors is fragile;
            # recompute via the generator's rng is not exposed, so test
            # shift with the reference context alone: an insertion
            # left-shifts through its repeat context only if the
            # context repeats; approximate with max shift over the 16
            # possible 2-mers
            max_shift = 0
            for b0_ in range(4):
                for b1_ in range(4):
                    d = left_shift_distance(
                        codes, p, np.array([b0_, b1_], np.uint8))
                    max_shift = max(max_shift, d)
            shifted_hit = any(abs(p - d - c) <= tol for c in called
                              for d in (max_shift,)) and max_shift > 0
            if shifted_hit:
                classes["shifted"].append((ci, p))
            else:
                # candidate check: was any insertion candidate within
                # +-25bp reported at all (forced wide window)?
                near = [c for c in called if abs(c - p) <= 25]
                if near:
                    classes["shifted"].append((ci, p))
                else:
                    classes["uncandidate"].append((ci, p))
            if hpol_len(codes, min(p, chunk - 1)) >= 6:
                hpol_fn += 1
        print(f"chunk {ci}: cumulative ins {n_ins} tp {n_tp} "
              f"fn {n_ins - n_tp}", file=sys.stderr)

    fn = n_ins - n_tp
    print(f"insertions: {n_ins}, called within +-{tol}: {n_tp} "
          f"({n_tp / max(n_ins, 1):.4f})")
    print(f"FN classes: shifted-or-nearby {len(classes['shifted'])}, "
          f"no-call-within-25bp {len(classes['uncandidate'])}, "
          f"hpol>=6 at site: {hpol_fn}/{fn}")
    for name, lst in classes.items():
        if lst:
            print(f"  {name}: {lst[:10]}{'...' if len(lst) > 10 else ''}")


if __name__ == "__main__":
    main()
