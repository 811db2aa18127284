"""Germline workflow CLI.

Reference analog: configureStrelkaGermlineWorkflow.py + runWorkflow.py +
strelkaGermlineWorkflow.py (pyflow DAG). Here a single command drives
the batched engine over region shards; multi-host sharding lives in
strelka_tpu.parallel.

Usage:
  python -m strelka_tpu.workflow.germline \
      --reference ref.fa --align-file a.bam [--align-file b.bam ...] \
      --output-dir out [--region chrom[:beg-end]]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

from ..io.bam import read_bam
from ..io.bgzf import BgzfWriter
from ..io.fasta import FastaReference
from ..options import GermlineOptions
from ..pipeline import germline_caller, gvcf


def parse_region(text: str, ref: FastaReference):
    if ":" in text:
        chrom, rng = text.split(":")
        b, e = rng.replace(",", "").split("-")
        return chrom, int(b) - 1, int(e)
    return text, 0, ref.contig_length(text)


def run_germline(argv=None) -> int:
    p = argparse.ArgumentParser(prog="strelka_tpu germline")
    p.add_argument("--reference", required=True)
    p.add_argument("--align-file", action="append", required=True, dest="align_files")
    p.add_argument("--output-dir", required=True)
    p.add_argument("--region", action="append", default=None)
    p.add_argument("--indel-candidates", action="append", default=None)
    p.add_argument("--min-mapping-quality", type=int, default=20)
    p.add_argument("--max-region-size", type=int, default=1_000_000)
    p.add_argument("--estimate-sequence-error", action="store_true",
                   help="fit per-sample adaptive indel error models "
                        "before calling (EstimateSequenceError workflow)")
    p.add_argument("--error-count-target", type=int, default=25_000_000,
                   help="stop counting once this many context instances "
                        "are collected (dynamic early-stop)")
    args = p.parse_args(argv)

    t0 = time.time()
    opt = GermlineOptions(min_mapping_quality=args.min_mapping_quality)
    ref = FastaReference(args.reference)
    os.makedirs(args.output_dir, exist_ok=True)

    regions = ([parse_region(r, ref) for r in args.region] if args.region
               else [(c, 0, ref.contig_length(c)) for c in ref.contig_names])

    sample_names = []
    batches_per_chrom: dict[str, list] = {}
    headers = []
    for path in args.align_files:
        hdr, batch = read_bam(path)
        headers.append(hdr)
        name = os.path.basename(path).split(".")[0]
        sample_names.append(name)
        for tid, cname in enumerate(hdr.ref_names):
            batches_per_chrom.setdefault(cname, [None] * len(args.align_files))
    for si, path in enumerate(args.align_files):
        hdr, batch = read_bam(path)
        for tid, cname in enumerate(hdr.ref_names):
            import numpy as np
            sel = batch.tid == tid
            batches_per_chrom[cname][si] = batch.select(np.asarray(sel))

    n_samples = len(sample_names)

    # --- optional sequence error estimation pre-pass -------------------
    # (strelkaSequenceErrorEstimation.py: count until target reached,
    # merge, fit; static-model fallback when the fit is unacceptable)
    if args.estimate_sequence_error:
        import json as _json

        from ..models.error_fit import estimate_indel_error_model
        from ..pipeline import allele_counts as ac
        from ..pipeline import reads as rdm
        for si in range(n_samples):
            per_region = []
            total_instances = 0
            for chrom, beg, end in regions:
                b = batches_per_chrom.get(chrom, [None] * n_samples)[si]
                if b is None or b.n == 0:
                    continue
                keep, level = rdm.filter_and_classify_reads(
                    b, args.min_mapping_quality)
                bk = b.select(keep)
                ea = rdm.expand_alignments(bk)
                rc = ref.fetch(chrom, beg, end)
                cc = ac.collect_context_counts(bk, ea, level[keep], rc, beg,
                                               beg, end)
                per_region.append(cc)
                total_instances += sum(c.total_instances for c in cc.values())
                if total_instances >= args.error_count_target:
                    break  # dynamic early stop
            merged = ac.merge_context_counts(per_region)
            model, ok = estimate_indel_error_model(
                merged, sample_name=f"Sample{si:03d}")
            path = os.path.join(args.output_dir,
                                f"sequenceErrorModel.Sample{si:03d}.json")
            with open(path, "w") as f:
                _json.dump(model, f, indent=1)
            print(f"error model sample {si}: acceptable={ok} -> {path}",
                  file=sys.stderr)

    gvcf_paths = [os.path.join(args.output_dir,
                               f"genome.S{si+1}.vcf.gz") for si in range(n_samples)]
    var_path = os.path.join(args.output_dir, "variants.vcf.gz")
    gvcf_writers = [BgzfWriter(pth) for pth in gvcf_paths]
    var_writer = BgzfWriter(var_path)

    wrote_header = False
    total_stats: dict = {}
    for chrom, beg, end in regions:
        if not wrote_header:
            clen = ref.contig_length(chrom)
            for si in range(n_samples):
                gvcf_writers[si].write(gvcf.gvcf_header(
                    opt, chrom, clen, [sample_names[si]]).encode())
            var_writer.write(gvcf.gvcf_header(
                opt, chrom, clen, sample_names).encode())
            wrote_header = True
        for seg_beg in range(beg, end, args.max_region_size):
            seg_end = min(seg_beg + args.max_region_size, end)
            batches = batches_per_chrom.get(chrom)
            if batches is None:
                continue
            result = germline_caller.call_region(
                opt, ref, chrom, seg_beg, seg_end, batches,
                external_indel_vcfs=args.indel_candidates)
            glines, vlines = gvcf.emit_region(opt, result, sample_names)
            for si in range(n_samples):
                if glines[si]:
                    gvcf_writers[si].write(("\n".join(glines[si]) + "\n").encode())
            if vlines:
                var_writer.write(("\n".join(vlines) + "\n").encode())
            for k, v in result.stats.items():
                total_stats[k] = total_stats.get(k, 0) + v

    for w in gvcf_writers:
        w.close()
    var_writer.close()
    elapsed = time.time() - t0
    print(f"strelka_tpu germline done in {elapsed:.1f}s; "
          f"stats={total_stats}; outputs: {var_path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(run_germline())
