"""Panel site-noise extraction -> noise VCF.

Reference: applications/strelkaNoiseExtractor (snoise_pos_processor.cpp)
+ snoiseWorkflow.py — scans panel BAMs and emits sites with non-reference
noise as a VCF with PNOISE/PNOISE2 fractions, consumed by the somatic
caller's --noise-vcf input.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from ..io.bam import read_alignments
from ..io.bgzf import BgzfWriter
from ..io.fasta import FastaReference, decode_bases
from ..pipeline import pileup as pl
from ..pipeline import reads as rd


def run_noise_extractor(argv=None) -> int:
    p = argparse.ArgumentParser(prog="strelka_tpu noise-extractor")
    p.add_argument("--reference", required=True)
    p.add_argument("--align-file", action="append", required=True,
                   dest="align_files", help="panel BAMs (one per sample)")
    p.add_argument("--output", required=True, help="noise VCF (.vcf.gz)")
    p.add_argument("--min-noise-count", type=int, default=1)
    p.add_argument("--min-mapping-quality", type=int, default=20)
    args = p.parse_args(argv)

    ref = FastaReference(args.reference)
    n_panel = len(args.align_files)

    lines = []
    for chrom in ref.contig_names:
        clen = ref.contig_length(chrom)
        rc = ref.load_contig(chrom)
        # per-site: number of panel samples with >=1 / >=2 nonref calls
        noise1 = np.zeros(clen, np.int32)
        noise2 = np.zeros(clen, np.int32)
        covered = np.zeros(clen, np.int32)
        for path in args.align_files:
            hdr, raw = read_alignments(path, ref)
            if chrom not in hdr.ref_names:
                continue
            tid = hdr.ref_names.index(chrom)
            b = raw.select(np.asarray(raw.tid == tid))
            keep, level = rd.filter_and_classify_reads(
                b, args.min_mapping_quality)
            bk = b.select(keep)
            ea = rd.expand_alignments(bk)
            pu = pl.build_pileup(bk, ea, level[keep], rc, 0, clen,
                                 min_qscore=17)
            counts = pu.used_counts()
            total = counts.sum(axis=1)
            ref_ok = rc < 4
            nonref = np.where(ref_ok,
                              total - counts[np.arange(clen),
                                             np.minimum(rc, 3)], 0)
            noise1 += (nonref >= 1).astype(np.int32)
            noise2 += (nonref >= 2).astype(np.int32)
            covered += (total > 0).astype(np.int32)
        sel = np.nonzero(noise1 >= args.min_noise_count)[0]
        for i in sel:
            pn = noise1[i] / n_panel
            pn2 = noise2[i] / n_panel
            lines.append(f"{chrom}\t{i + 1}\t.\t{decode_bases([rc[i]])}\t.\t.\t"
                         f"PASS\tPNOISE={pn:.3f};PNOISE2={pn2:.3f}")

    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    with BgzfWriter(args.output) as w:
        header = (
            "##fileformat=VCFv4.1\n"
            "##content=strelka_tpu site noise panel\n"
            '##INFO=<ID=PNOISE,Number=1,Type=Float,Description="Fraction of panel containing non-reference noise at this site">\n'
            '##INFO=<ID=PNOISE2,Number=1,Type=Float,Description="Fraction of panel containing more than one non-reference noise obs at this site">\n'
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        w.write(header.encode())
        w.write(("\n".join(lines) + "\n").encode() if lines else b"")
    print(f"noise extractor: {len(lines)} sites -> {args.output}",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(run_noise_extractor())
