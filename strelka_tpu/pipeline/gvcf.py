"""gVCF / variants-VCF record assembly and serialization.

Reference: applications/starling/gvcf_writer.cpp (site record
:560-740, block record :750-815, indel record :816+), gvcf_header.cpp,
gvcf_block_site_record.hh (hom-ref block compression criteria), and
gvcf_compressor.hh. Host-side ordered text emission by design —
SURVEY.md §5 'keep emission on hosts'.
"""
from __future__ import annotations

import numpy as np

from ..io.fasta import decode_bases
from ..io.vcf import identity_header_lines
from ..models import digt
from ..options import GermlineOptions
from .germline_caller import IndelCall, RegionCallResult, snv_hpol


FORCE_PYTHON_BLOCKS = False  # test hook: disable native/blocks.cpp


def _round_half(x: float) -> int:
    """std::round / compat_round semantics: half away from zero (the
    values here are non-negative means/RMS; Python round() is banker's
    and differs on every .5)."""
    import math
    return int(math.floor(x + 0.5))


def _blockable(lo: int, hi: int, v: int, abs_tol: int,
               frac_tol: float) -> bool:
    """Exact port of gvcf_block_site_record.cpp check_block_tolerance
    over the running [lo, hi] extended by v: (min + tol) >= max/2
    with the abs/frac two-stage rule."""
    m = v if v < lo else lo
    h = v if v > hi else hi
    if (m + abs_tol) >= h / 2.0:
        return True
    ftol = int(m * frac_tol)  # floor for non-negative values
    if ftol <= abs_tol:
        return False
    return (m + ftol) >= h / 2.0


# reference FILTER enum order (gvcf_locus_info.hh
# GERMLINE_VARIANT_VCF_FILTERS::index_t; HighBaseFilt prints as
# HighDPFRatio)
_FILTER_ORDER = ("IndelConflict", "SiteConflict", "PloidyConflict",
                 "LowGQX", "PhasingConflict", "HighDPFRatio",
                 "HighDepth", "HighSNVSB", "HighSNVHPOL", "HighRefRep",
                 "LowDepth", "NoPassedVariantGTs", "NotGenotyped")


def _filter_str(fset) -> str:
    """FILTER/FT column string in the reference's enum order."""
    ordered = [f for f in _FILTER_ORDER if f in fset]
    ordered += [f for f in sorted(fset) if f not in _FILTER_ORDER]
    return ";".join(ordered) if ordered else "PASS"


class BlockState:
    """Hom-ref block accumulator (gvcf_block_site_record.hh).

    Sites join while every tracked value stays in the band
    [lo, max(lo+abs_tol, lo*(1+frac_tol))] of the block's running
    min/max — O(1) running accumulators instead of per-site lists."""

    __slots__ = ("start", "count", "ref_base", "gt", "filters",
                 "gqx_min", "gqx_max", "dp_min", "dp_max", "dp_sum",
                 "dpf_min", "dpf_max", "dpf_sum", "pl", "used_cov")

    def __init__(self):
        self.start = -1
        self.count = 0
        self.ref_base = "N"
        self.gt = "0/0"
        self.filters = "PASS"
        self.gqx_min = self.gqx_max = 0
        self.dp_min = self.dp_max = self.dp_sum = 0
        self.dpf_min = self.dpf_max = self.dpf_sum = 0
        self.pl = 2
        self.used_cov = False

    def can_join(self, gqx, dp, dpf, filters, abs_tol, frac_tol,
                 gt=None, pl=2, used_cov=None):
        """gvcf_block_site_record.cpp testCanSiteJoinSampleBlock:
        filters, genotype, ploidy, and coverage states must match; gqx,
        dpu, dpf must stay within check_block_tolerance."""
        if self.count == 0:
            return True
        if filters != self.filters:
            return False
        if gt is not None and gt != self.gt:
            return False
        if pl != self.pl:
            return False
        if used_cov is not None and used_cov != self.used_cov:
            return False
        return (_blockable(self.gqx_min, self.gqx_max, gqx,
                           abs_tol, frac_tol)
                and _blockable(self.dp_min, self.dp_max, dp,
                               abs_tol, frac_tol)
                and _blockable(self.dpf_min, self.dpf_max, dpf,
                               abs_tol, frac_tol))

    def add(self, pos, ref_base, gt, gqx, dp, dpf, filters, pl=2):
        if self.count == 0:
            self.start = pos
            self.ref_base = ref_base
            self.gt = gt
            self.filters = filters
            self.pl = pl
            self.used_cov = dp > 0
            self.gqx_min = self.gqx_max = gqx
            self.dp_min = self.dp_max = dp
            self.dpf_min = self.dpf_max = dpf
            self.dp_sum = self.dpf_sum = 0
        else:
            if gqx < self.gqx_min:
                self.gqx_min = gqx
            elif gqx > self.gqx_max:
                self.gqx_max = gqx
            if dp < self.dp_min:
                self.dp_min = dp
            elif dp > self.dp_max:
                self.dp_max = dp
            if dpf < self.dpf_min:
                self.dpf_min = dpf
            elif dpf > self.dpf_max:
                self.dpf_max = dpf
        self.count += 1
        self.dp_sum += dp
        self.dpf_sum += dpf

    @property
    def dp(self):  # minimal compat for continuous-mode flush
        return [self.dp_min] if self.count else []

    @property
    def gqx(self):
        return [self.gqx_min] if self.count else []

    @property
    def dpf(self):
        return [self.dpf_min] if self.count else []

    def flush(self, chrom, out, block_label):
        if self.count == 0:
            return
        info = "."
        if self.count > 1:
            info = f"END={self.start + self.count};{block_label}"
        line = (f"{chrom}\t{self.start + 1}\t.\t{self.ref_base}\t.\t.\t"
                f"{self.filters}\t{info}\tGT:GQX:DP:DPF:MIN_DP\t"
                f"{self.gt}:{self.gqx_min}:"
                f"{_round_half(self.dp_sum / self.count)}:"
                f"{_round_half(self.dpf_sum / self.count)}:{self.dp_min}")
        out.append(line)
        self.__init__()


def gvcf_header(opt: GermlineOptions, chrom: str, chrom_len: int,
                sample_names: list[str]) -> str:
    lines = [
        "##fileformat=VCFv4.1",
        *identity_header_lines(opt.cmdline, opt.reference_path),
        "##content=strelka_tpu germline small-variant calls",
        f"##contig=<ID={chrom},length={chrom_len}>",
        '##INFO=<ID=END,Number=1,Type=Integer,Description="End position of the region described in this record">',
        f'##INFO=<ID={opt.block_label},Number=0,Type=Flag,Description="Non-variant multi-site block">',
        '##INFO=<ID=SNVHPOL,Number=1,Type=Integer,Description="SNV contextual homopolymer length">',
        *(['##INFO=<ID=EVSF,Number=.,Type=Float,Description="Empirical variant scoring features.">']
          if opt.is_report_evs_features else []),
        '##INFO=<ID=CIGAR,Number=A,Type=String,Description="CIGAR alignment for each alternate indel allele">',
        '##INFO=<ID=RU,Number=A,Type=String,Description="Smallest repeating sequence unit extended or contracted in the indel allele relative to the reference">',
        '##INFO=<ID=REFREP,Number=A,Type=Integer,Description="Number of times RU is repeated in reference">',
        '##INFO=<ID=IDREP,Number=A,Type=Integer,Description="Number of times RU is repeated in indel allele">',
        '##INFO=<ID=MQ,Number=1,Type=Integer,Description="RMS of mapping quality">',
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">',
        '##FORMAT=<ID=GQ,Number=1,Type=Integer,Description="Genotype Quality">',
        '##FORMAT=<ID=GQX,Number=1,Type=Integer,Description="Empirically calibrated genotype quality score">',
        '##FORMAT=<ID=DP,Number=1,Type=Integer,Description="Filtered basecall depth used for site genotyping">',
        '##FORMAT=<ID=DPF,Number=1,Type=Integer,Description="Basecalls filtered from input prior to site genotyping">',
        '##FORMAT=<ID=MIN_DP,Number=1,Type=Integer,Description="Minimum filtered basecall depth within a non-variant block">',
        '##FORMAT=<ID=DPI,Number=1,Type=Integer,Description="Read depth associated with indel, taken from the site preceding the indel">',
        '##FORMAT=<ID=AD,Number=.,Type=Integer,Description="Allelic depths for the ref and alt alleles in the order listed">',
        '##FORMAT=<ID=ADF,Number=.,Type=Integer,Description="Allelic depths on the forward strand">',
        '##FORMAT=<ID=ADR,Number=.,Type=Integer,Description="Allelic depths on the reverse strand">',
        '##FORMAT=<ID=FT,Number=1,Type=String,Description="Sample filter">',
        '##FORMAT=<ID=PL,Number=G,Type=Integer,Description="Normalized, Phred-scaled likelihoods for genotypes">',
        '##FORMAT=<ID=SB,Number=1,Type=Float,Description="Sample site strand bias">',
        '##FILTER=<ID=LowGQX,Description="Locus GQX is below threshold or not present">',
        '##FILTER=<ID=HighSNVSB,Description="Sample SNV strand bias value (SB) exceeds threshold">',
        '##FILTER=<ID=HighDPFRatio,Description="The fraction of basecalls filtered out at a site is greater than 0.4">',
        '##FILTER=<ID=NoPassedVariantGTs,Description="No samples at this locus pass all sample filters and have a variant genotype">',
        '##FILTER=<ID=IndelConflict,Description="Indel genotypes from two or more loci conflict in at least one sample">',
        '##FILTER=<ID=HighDepth,Description="Locus depth is greater than 3x the mean chromosome depth">',
        f'##FILTER=<ID=LowDepth,Description="Locus depth is below {opt.gvcf_min_passed_call_depth}">',
        '##FILTER=<ID=NotGenotyped,Description="Locus contains forcedGT input alleles which could not be genotyped">',
        '##FILTER=<ID=PloidyConflict,Description="Genotype call from variant caller not consistent with chromosome ploidy">',
        '##FORMAT=<ID=PS,Number=1,Type=Integer,Description="Phase set identifier">',
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
        + "\t".join(sample_names),
    ]
    return "\n".join(lines) + "\n"


def _site_sample_filters(opt: GermlineOptions, gqx, sb, dp, dpf, is_variant,
                         chrom_depth: float | None = None,
                         ad_sum: int | None = None):
    f = []
    if gqx < (opt.gvcf_min_gqx if is_variant else opt.gvcf_min_homref_gqx):
        f.append("LowGQX")
    if is_variant and sb > opt.gvcf_max_snv_strand_bias:
        f.append("HighSNVSB")
    total = dp + dpf
    if total > 0 and dpf / total > 0.4:
        f.append("HighDPFRatio")
    if chrom_depth and total > opt.max_depth_factor * chrom_depth:
        f.append("HighDepth")
    # LowDepth: DP or confident AD sum below minPassedCallDepth
    # (ScoringModelManager::applyDepthFilter :234-249, applied to every
    # locus by variant_prefilter_stage)
    min_dp = opt.gvcf_min_passed_call_depth
    if dp < min_dp or (ad_sum if ad_sum is not None else dp) < min_dp:
        f.append("LowDepth")
    return f


def vcf_indel_strings(result: RegionCallResult, call: IndelCall):
    """(vcf_pos0, ref_str, alt_strs, cigars) for an indel locus
    (AlleleReportInfoUtil.cpp getSingleIndelAlleleVcfSummaryStrings +
    multi-allele common-ref extension). Reference bases come from the
    halo'd fetch window when available: an indel anchored at the
    segment begin or a deletion running past the segment end reaches
    outside [begin, end), and slicing the segment-only array would
    wrap (pos == begin) or silently truncate REF against the CIGAR."""
    if result.ref_halo is not None:
        ref = result.ref_halo
        begin = result.begin - result.halo_off
    else:
        ref = result.ref_codes
        begin = result.begin
    left = min(k.pos for k in call.keys) - 1
    right = max(k.right_pos for k in call.keys)
    ref_str = decode_bases(ref[max(left - begin, 0):right - begin])
    alts = []
    cigars = []
    for k in call.keys:
        pre = decode_bases(ref[max(left - begin, 0):k.pos - begin])
        post = decode_bases(ref[k.right_pos - begin:right - begin])
        alts.append(pre + k.insert_seq + post)
        parts = [f"{len(pre)}M"]
        if k.insert_length:
            parts.append(f"{k.insert_length}I")
        if k.delete_length:
            parts.append(f"{k.delete_length}D")
        if post:
            parts.append(f"{len(post)}M")
        cigars.append("".join(parts))
    return left, ref_str, alts, cigars


def _gt_string_indel(gt_index: int, ploidy: int, n_alleles: int) -> str:
    from ..models.indel_genotype import genotype_alleles
    ga = genotype_alleles(ploidy, n_alleles)
    a0, a1 = ga[gt_index]
    if ploidy == 1:
        return str(int(a0))
    return f"{int(a0)}/{int(a1)}"


# EVSF reporting (--report-evs-features): feature-vector emission for
# offline EVS training (gvcf_writer.cpp:515-527 ";EVSF=" with
# setprecision(5)). When no scoring model is loaded, features are
# reported in these default orders (the reference's development
# features are not tracked and are omitted from the list).
DEFAULT_GERMLINE_SNV_EVSF = (
    "SiteHomopolymerLength", "SampleStrandBias",
    "SamplePrimaryAltAlleleDepth", "VariantAlleleQuality",
    "SampleMeanDistanceFromReadEdge", "SamplePrimaryAltAlleleDepthFraction",
    "SampleRMSMappingQuality", "SampleUsedDepthFraction")
DEFAULT_GERMLINE_INDEL_EVSF = (
    "GenotypeCategory", "SampleIndelRepeatCount", "SampleIndelRepeatUnitSize",
    "SampleIndelAlleleBiasLower", "SampleIndelAlleleBias",
    "SampleProxyRMSMappingQuality", "RelativeTotalLocusDepth",
    "SamplePrimaryAltAlleleDepthFraction", "ConservativeGenotypeQuality",
    "InterruptedHomopolymerLength", "ContextCompressability",
    "IndelCategory", "SampleAlleleCountStrandBias")


class _FeatureList:
    """Stand-in for a Forest when only its feature-name order is needed."""

    def __init__(self, names):
        self.features = list(names)


_EVSF_SNV_DEFAULT = _FeatureList(DEFAULT_GERMLINE_SNV_EVSF)
_EVSF_INDEL_DEFAULT = _FeatureList(DEFAULT_GERMLINE_INDEL_EVSF)


def format_evsf(values) -> str:
    """%.5g matches the reference's default-float setprecision(5)."""
    return ",".join(f"{float(v):.5g}" for v in values)


def germline_snv_features(forest, sd, i, hpol, qual, alt_id, sb):
    """Feature vector by name for a germline/RNA SNV scoring model
    (germlineVariantEmpiricalScoringFeatures.hh /
    rnaVariantEmpiricalScoringFeatures.hh subset)."""
    counts = sd.used_counts[i]
    dp = int(counts.sum())
    alt_depth = int(counts[alt_id])
    vals = {
        "SiteHomopolymerLength": hpol,
        "SampleStrandBias": sb,
        "SamplePrimaryAltAlleleDepth": alt_depth,
        "VariantAlleleQuality": qual,
        "SampleMeanDistanceFromReadEdge": (
            float(sd.mean_edge_dist[i]) if sd.mean_edge_dist is not None else 0.0),
        "SamplePrimaryAltAlleleDepthFraction": alt_depth / max(dp, 1),
        "SampleRMSMappingQuality": float(
            np.sqrt(sd.pileup.mapq_sumsq[i] / max(sd.pileup.mapq_n[i], 1))),
        "SampleUsedDepthFraction": dp / max(dp + int(sd.dpf[i]), 1),
    }
    return np.array([vals.get(name, 0.0) for name in forest.features])


def emit_region(
    opt: GermlineOptions,
    result: RegionCallResult,
    sample_names: list[str],
    chrom_depth: float | None = None,
    snv_forest=None,
    indel_forest=None,
    nocompress_mask=None,
):
    """Returns (per-sample gvcf line lists, variants vcf line list)."""
    n_samples = len(result.samples)
    L = result.end - result.begin
    gvcf_lines: list[list[str]] = [[] for _ in range(n_samples)]
    var_lines: list[str] = []
    blocks = [BlockState() for _ in range(n_samples)]

    # --- read-backed phasing bookkeeping (VariantPhaser.hh:37-60):
    # count phase-informative het variants per (sample, phase set);
    # phased GT is emitted only when a block links >= 2 variants
    ps_counts: dict[tuple[int, int], int] = {}
    for (s, pos, base), hap in result.snv_hap_ids.items():
        ps = result.phase_set_of_pos.get(pos)
        if ps is not None:
            ps_counts[(s, ps)] = ps_counts.get((s, ps), 0) + 1
    for (s, key), hap in result.indel_hap_ids.items():
        ps = result.phase_set_of_pos.get(key.pos)
        if ps is not None:
            ps_counts[(s, ps)] = ps_counts.get((s, ps), 0) + 1

    def snv_phase(s, pos, alt_base, gt_pair):
        """(phased_gt_string, ps) or None for an 0/1 het site."""
        if not opt.enable_read_backed_phasing:
            return None
        hap = result.snv_hap_ids.get((s, pos, alt_base))
        ps = result.phase_set_of_pos.get(pos)
        if hap is None or ps is None or ps_counts.get((s, ps), 0) < 2:
            return None
        a, b = gt_pair
        if hap == 1:
            return f"{b}|{a}", ps
        return f"{a}|{b}", ps

    # precompute numpy views of snv results
    sv = []
    for s in range(n_samples):
        r = result.samples[s].snv
        sv.append({
            "q": np.asarray(r.snv_qphred), "ggt": np.asarray(r.genome_max_gt),
            "pgt": np.asarray(r.poly_max_gt), "gq": np.asarray(r.poly_max_gt_qphred),
            "gqg": np.asarray(r.genome_max_gt_qphred),
            "pl": np.asarray(r.phred_loghood), "sb": np.asarray(r.strand_bias),
        })

    # indel loci indexed by position, to interleave in order and to
    # suppress site records inside deletion spans (simplified
    # VariantOverlapResolver)
    indels_at = {}
    deleted_span = np.zeros(L, dtype=bool)
    # VariantOverlapResolver site modification inputs: qual/gqx caps and
    # per-sample ploidy reduction over variant-indel spans
    # (modifySiteOverlappingNonconflictingVariantIndel:390-442 + the
    # "change ploidy of overlapped sites" role)
    site_qual_cap = np.full(L, 10 ** 9, dtype=np.int64)
    site_gqx_cap = [np.full(L, 10 ** 9, dtype=np.int64)
                    for _ in range(n_samples)]
    site_ploidy_red = [np.zeros(L, dtype=np.int8) for _ in range(n_samples)]
    from ..models.indel_genotype import genotype_alleles as _ga
    for call in result.indels:
        indels_at.setdefault(call.pos, []).append(call)
        if not any(g > 0 for g in call.sample_gt):
            continue
        ga2 = _ga(2, len(call.keys) + 1)
        for ki, k in enumerate(call.keys):
            if k.delete_length == 0:
                continue
            b = max(k.pos - result.begin, 0)
            e = min(k.right_pos - result.begin, L)
            if e <= b:
                continue
            deleted_span[b:e] = True
            site_qual_cap[b:e] = np.minimum(site_qual_cap[b:e], call.qual)
            for s in range(n_samples):
                a0, a1 = ga2[call.sample_gt[s]]
                n_del_alleles = int(a0 == ki + 1) + int(a1 == ki + 1)
                if n_del_alleles:
                    site_gqx_cap[s][b:e] = np.minimum(
                        site_gqx_cap[s][b:e], call.sample_gqx[s])
                    site_ploidy_red[s][b:e] = np.maximum(
                        site_ploidy_red[s][b:e], n_del_alleles)

    ref = result.ref_codes
    hpol_ref = result.ref_halo if result.ref_halo is not None else ref
    hpol_off = result.halo_off if result.ref_halo is not None else 0
    ref_list = ref.tolist()
    ref_chars = "ACGTN"

    # ---- vectorized per-position precompute (replaces the reference's
    # per-position scalar extraction; everything becomes plain Python
    # ints via tolist() so the emission loop has no numpy dispatch) ----
    ref_ok = ref < 4
    pre = []
    any_variant_v = np.zeros(L, dtype=bool)
    for s in range(n_samples):
        d = sv[s]
        sd = result.samples[s]
        dp_v = sd.used_counts.sum(axis=1)
        dpf_v = sd.dpf.astype(np.int64)
        ggt_v = d["ggt"]
        pgt_v = d["pgt"]
        gq_v = d["gq"]
        gqx_v = np.where(ggt_v == pgt_v, np.minimum(d["gqg"], gq_v), 0)
        gqx_v = np.minimum(gqx_v, site_gqx_cap[s])
        variant_v = (pgt_v != ref.astype(np.int64)) & ref_ok
        any_variant_v |= variant_v
        total_v = dp_v + dpf_v
        ref_counts = sd.used_counts[np.arange(L), np.minimum(ref, 3)]
        nonref_v = np.where(ref_ok, dp_v - ref_counts, 0)
        nonref_ok_v = (dp_v == 0) | (nonref_v <= opt.gvcf_block_max_nonref * dp_v)
        # homref filter string codes
        low_v = gqx_v < opt.gvcf_min_homref_gqx
        hdpf_v = (total_v > 0) & (dpf_v > 0.4 * total_v)
        hdep_v = np.zeros(L, dtype=bool)
        if chrom_depth:
            hdep_v = total_v > opt.max_depth_factor * chrom_depth
        lowdep_v = dp_v < opt.gvcf_min_passed_call_depth
        fcode_v = low_v.astype(np.int8) + 2 * hdpf_v.astype(np.int8) \
            + 4 * hdep_v.astype(np.int8) + 8 * lowdep_v.astype(np.int8)
        ploidy_l = (result.ploidy[s].tolist() if result.ploidy is not None
                    else None)
        pre.append({
            "dp": dp_v.tolist(), "dpf": dpf_v.tolist(),
            "ggt": ggt_v.tolist(), "pgt": pgt_v.tolist(),
            "gq": gq_v.tolist(), "gqx": gqx_v.tolist(),
            "variant": variant_v.tolist(), "sb": d["sb"].tolist(),
            "nonref_ok": nonref_ok_v.tolist(), "fcode": fcode_v.tolist(),
            "ploidy": ploidy_l,
            "ploidy_red": site_ploidy_red[s].tolist(),
            # numpy views for the native block compressor
            "_np": (gqx_v.astype(np.int32), dp_v.astype(np.int32),
                    dpf_v.astype(np.int32), fcode_v,
                    nonref_ok_v.astype(np.uint8),
                    (result.ploidy[s].astype(np.int8)
                     if result.ploidy is not None else None)),
        })
    any_variant = any_variant_v.tolist()
    deleted_list = deleted_span.tolist()

    _FSTR_BASE = ["PASS", "LowGQX", "HighDPFRatio", "LowGQX;HighDPFRatio",
                  "HighDepth", "LowGQX;HighDepth", "HighDPFRatio;HighDepth",
                  "LowGQX;HighDPFRatio;HighDepth"]
    # bit 8 = LowDepth (appended last, enum order)
    _FSTR = _FSTR_BASE + [
        ("LowDepth" if f == "PASS" else f + ";LowDepth")
        for f in _FSTR_BASE]

    indel_positions = set(indels_at)
    chrom = result.chrom
    abs_tol = opt.block_abs_tol
    frac_tol = opt.block_frac_tol
    block_label = opt.block_label

    # native hom-ref block compression: whole runs between "events"
    # (variant sites and indel-emission positions) compress in one C++
    # pass per sample (native/blocks.cpp); the per-position BlockState
    # loop below stays as the fallback and semantic oracle
    from ..io import native as natio
    use_native_blocks = (not FORCE_PYTHON_BLOCKS and L > 0
                         and hasattr(natio.get_lib(), "block_compress_run"))
    if use_native_blocks:
        stop_mask = any_variant_v.copy()
        for p in indels_at:
            ie = p - 1 - result.begin
            if 0 <= ie < L:
                stop_mask[ie] = True
        stops = np.nonzero(stop_mask)[0]
        nb_arrs = [pre[s]["_np"] for s in range(n_samples)]
        nb_nocomp = (np.asarray(nocompress_mask, np.uint8)
                     if nocompress_mask is not None else None)
        nb_out = np.empty((L, 9), np.int64)
        _GT_STRS = ("0/0", "0", ".", "./.")

    # defensive: an indel whose leftmost changed base IS the segment
    # begin anchors at begin-1, which the loop below never reaches.
    # Segment assignment is anchor-based (begin <= k.pos - 1 < end) so
    # such calls shouldn't exist, but if one does, emitting it at the
    # segment head beats silently losing it.
    if result.begin in indel_positions:
        for call in indels_at[result.begin]:
            _emit_indel(opt, result, call, sample_names, gvcf_lines,
                        var_lines, blocks, indel_forest=indel_forest,
                        chrom_depth=chrom_depth)

    i = 0
    while i < L:
        pos = result.begin + i
        # indel records sort before the site at the same position + 1
        # (VCF indel pos is pos-1 of first changed base)
        if pos + 1 in indel_positions:
            for call in indels_at[pos + 1]:
                _emit_indel(opt, result, call, sample_names, gvcf_lines,
                            var_lines, blocks, indel_forest=indel_forest,
                            chrom_depth=chrom_depth)

        ref_gt = ref_list[i]
        ref_base = ref_chars[ref_gt]

        if use_native_blocks and not any_variant[i]:
            # hom-ref run [i, j): j = next variant/indel event after i
            k = int(np.searchsorted(stops, i, side="right"))
            j = int(stops[k]) if k < len(stops) else L
            for s in range(n_samples):
                gq_a, dp_a, dpf_a, fc_a, nr_a, pl_a = nb_arrs[s]
                n_rows = natio.block_compress_run(
                    gq_a, dp_a, dpf_a, fc_a, nr_a, pl_a, nb_nocomp,
                    i, j, abs_tol, frac_tol, nb_out)
                gl = gvcf_lines[s]
                for kind, st, cnt, gqx_min, dp_sum, dpf_sum, dp_min,                         fc, gtc in nb_out[:n_rows].tolist():
                    p1 = result.begin + st + 1
                    rb = ref_chars[ref_list[st]]
                    fstr = _FSTR[fc]
                    if kind == 1:
                        gl.append(
                            f"{chrom}\t{p1}\t.\t{rb}\t.\t.\t{fstr}\t.\t"
                            f"GT:GQX:DP:DPF:MIN_DP\t"
                            f"0/0:{gqx_min}:{dp_sum}:{dpf_sum}:{dp_min}")
                    else:
                        info = ("." if cnt == 1 else
                                f"END={result.begin + st + cnt};{block_label}")
                        gl.append(
                            f"{chrom}\t{p1}\t.\t{rb}\t.\t.\t{fstr}\t"
                            f"{info}\tGT:GQX:DP:DPF:MIN_DP\t"
                            f"{_GT_STRS[gtc]}:{gqx_min}:"
                            f"{_round_half(dp_sum / cnt)}:"
                            f"{_round_half(dpf_sum / cnt)}:"
                            f"{dp_min}")
            i = j
            continue

        if not any_variant[i]:
            # hom-ref path -> block compression per sample
            for s in range(n_samples):
                ps = pre[s]
                dp = ps["dp"][i]
                dpf = ps["dpf"][i]
                gqx = ps["gqx"][i]
                covered = dp + dpf > 0
                fstr = _FSTR[ps["fcode"][i]]
                if not ps["nonref_ok"][i] or (
                        nocompress_mask is not None and nocompress_mask[i]):
                    # emit single-site record outside blocks
                    # (gvcf_compressor nocompress-bed positions are
                    # always emitted individually)
                    blocks[s].flush(chrom, gvcf_lines[s], block_label)
                    gvcf_lines[s].append(
                        f"{chrom}\t{pos + 1}\t.\t{ref_base}\t.\t.\t{fstr}\t.\t"
                        f"GT:GQX:DP:DPF:MIN_DP\t0/0:{gqx}:{dp}:{dpf}:{dp}")
                    continue
                b = blocks[s]
                pl_s = int(ps["ploidy"][i]) if ps["ploidy"] is not None else 2
                if pl_s == 0:
                    gt = "."
                elif pl_s == 1:
                    gt = "0" if covered else "."
                else:
                    gt = "0/0" if covered else "./."
                if not b.can_join(gqx, dp, dpf, fstr, abs_tol, frac_tol,
                                  gt=gt, pl=pl_s, used_cov=dp > 0):
                    b.flush(chrom, gvcf_lines[s], block_label)
                b.add(pos, ref_base, gt, gqx, dp, dpf, fstr, pl=pl_s)
            i += 1
            continue

        # variant site record (rare path; gather per-sample scalars)
        per_sample = []
        for s in range(n_samples):
            ps = pre[s]
            per_sample.append((ps["dp"][i], ps["dpf"][i], ps["ggt"][i],
                               ps["pgt"][i], ps["gq"][i], ps["gqx"][i],
                               ps["variant"][i], ps["sb"][i]))
        alts = sorted({a for s in range(n_samples)
                       for a in digt.ALLELES[per_sample[s][3]]
                       if a != ref_gt and per_sample[s][6]})
        if not alts:
            i += 1
            continue
        alt_str = ",".join(decode_bases([a]) for a in alts)
        allele_map = {ref_gt: 0}
        for j, a in enumerate(alts):
            allele_map[a] = j + 1
        qual = max(int(sv[s]["q"][i]) for s in range(n_samples))
        qual = min(qual, int(site_qual_cap[i]))
        hpol = snv_hpol(hpol_ref, i + hpol_off)
        info = f"SNVHPOL={hpol}"
        mq_n = sum(int(result.samples[s].pileup.mapq_n[i]) for s in range(n_samples))
        mq_ss = sum(float(result.samples[s].pileup.mapq_sumsq[i]) for s in range(n_samples))
        if mq_n > 0:
            info += f";MQ={_round_half(float(np.sqrt(mq_ss / mq_n)))}"

        fmt = "GT:GQ:GQX:DP:DPF:AD:ADF:ADR:SB:FT:PL"
        sample_cols = []
        sample_filter_sets = []
        any_pass_variant = False
        any_phased = False
        evsf = ""
        phases = []
        for s in range(n_samples):
            dp, dpf, ggt, pgt, gq, gqx, variant, sb = per_sample[s]
            if s == 0 and variant and alts and opt.is_report_evs_features:
                # first sample's features (training runs are
                # single-sample; gvcf_writer.cpp:515-527)
                f0 = germline_snv_features(
                    snv_forest or _EVSF_SNV_DEFAULT, result.samples[0], i,
                    hpol, int(sv[0]["q"][i]), alts[0], sb)
                evsf = ";EVSF=" + format_evsf(f0)
            a_pair = digt.ALLELES[pgt]
            gt_idx = sorted(allele_map.get(a, 0) for a in a_pair)
            pl_s = (pre[s]["ploidy"][i] if pre[s]["ploidy"] is not None
                    else 2)
            # sites inside genotyped deletions lose the deleted allele's
            # ploidy (VariantOverlapResolver role 2)
            pl_s = max(pl_s - pre[s]["ploidy_red"][i], 0)
            if pl_s == 0:
                gt = "."
            elif pl_s == 1:
                gt = str(gt_idx[1])  # haploid single-allele call
            else:
                gt = f"{gt_idx[0]}/{gt_idx[1]}"
            phase = None
            if pl_s == 2 and variant and gt_idx[0] != gt_idx[1] and len(alts) == 1:
                phase = snv_phase(s, pos, alts[0], tuple(gt_idx))
            phases.append(phase)
            if phase is not None:
                gt = phase[0]
                any_phased = True
            counts = result.samples[s].used_counts[i]
            fcounts = result.samples[s].used_fwd_counts[i]
            ads = [int(counts[ref_gt])] + [int(counts[a]) for a in alts]
            adfs = [int(fcounts[ref_gt])] + [int(fcounts[a]) for a in alts]
            adrs = [ads[j] - adfs[j] for j in range(len(ads))]
            if snv_forest is not None and variant:
                # EVS replaces GQX and drives the LowGQX filter
                # (ScoringModelManager.hh classify_site semantics)
                feats = germline_snv_features(
                    snv_forest, result.samples[s], i,
                    snv_hpol(hpol_ref, i + hpol_off),
                    int(sv[s]["q"][i]), alts[0] if alts else 0, sb)
                evs = float(snv_forest.score_phred(feats[None])[0])
                gqx = int(round(evs))
                filters = ["LowGQX"] if evs < snv_forest.filter_cutoff else []
                if chrom_depth and dp + dpf > opt.max_depth_factor * chrom_depth:
                    filters.append("HighDepth")
                if dp < opt.gvcf_min_passed_call_depth or \
                        sum(ads) < opt.gvcf_min_passed_call_depth:
                    filters.append("LowDepth")
            else:
                filters = _site_sample_filters(opt, gqx, sb, dp, dpf, variant,
                                               chrom_depth, ad_sum=sum(ads))
            sample_filter_sets.append(set(filters))
            fstr = _filter_str(set(filters))
            if variant and not filters:
                any_pass_variant = True
            # PL for the 10-genotype digt space reduced to listed alleles
            pl_full = sv[s]["pl"][i]
            order = [ref_gt] + list(alts)
            pls = []
            for bj in range(len(order)):
                for aj in range(bj + 1):
                    pls.append(int(pl_full[digt.het_gt_of(order[aj], order[bj])]))
            col = (f"{gt}:{gq}:{gqx}:{dp}:{dpf}:{','.join(map(str, ads))}:"
                   f"{','.join(map(str, adfs))}:{','.join(map(str, adrs))}:"
                   f"{sb:.1f}:{fstr}:{','.join(map(str, pls))}")
            sample_cols.append(col)

        if any_phased:
            fmt += ":PS"
            sample_cols = [
                col + (f":{phases[s][1]}" if phases[s] is not None else ":.")
                for s, col in enumerate(sample_cols)]

        # FILTER merging (gvcf_writer.cpp getExtendedLocusFilters):
        # variants VCF = locus filters + the intersection of every
        # sample's filters + NoPassedVariantGTs when no variant sample
        # passes; each per-sample gVCF stream = locus + that sample's
        # filters (no NoPassedVariantGTs)
        inter = (set.intersection(*sample_filter_sets)
                 if sample_filter_sets else set())
        var_fset = set(inter)
        if not any_pass_variant:
            var_fset.add("NoPassedVariantGTs")
        pre_cols = (f"{result.chrom}\t{pos + 1}\t.\t{ref_base}\t"
                    f"{alt_str}\t{qual}")
        post_cols = f"{info}{evsf}\t{fmt}"
        line = (f"{pre_cols}\t{_filter_str(var_fset)}\t{post_cols}\t"
                + "\t".join(sample_cols))
        var_lines.append(line)
        for s in range(n_samples):
            blocks[s].flush(result.chrom, gvcf_lines[s], opt.block_label)
            gvcf_lines[s].append(
                f"{pre_cols}\t{_filter_str(sample_filter_sets[s])}\t"
                f"{post_cols}\t{sample_cols[s]}")
        i += 1

    for s in range(n_samples):
        blocks[s].flush(result.chrom, gvcf_lines[s], opt.block_label)
    return gvcf_lines, var_lines


def germline_indel_features(forest, result, call: IndelCall, s: int,
                            chrom_depth: float | None):
    """Feature vector by name for a germline indel scoring model
    (gvcf_locus_info.cpp computeEmpiricalScoringFeatures :586-632,
    getAlleleBiasFeatures :219-247)."""
    from math import log

    from scipy import stats as spstats

    from ..models.indel_genotype import genotype_alleles
    from ..utils.refcontext import (context_compressability,
                                    indel_interrupted_hpol)

    A = len(call.keys) + 1
    ploidy = call.sample_ploidy[s] if call.sample_ploidy is not None else 2
    ga = genotype_alleles(max(ploidy, 1), A)
    a0, a1 = (int(x) for x in ga[call.sample_gt[s]])
    primary_alt = a0 if a0 > 0 else (a1 if a1 > 0 else 1)
    rec = call.records[primary_alt - 1]
    key = call.keys[primary_alt - 1]

    ad = np.asarray(call.sample_ad[s], dtype=np.float64)
    adf = np.asarray(call.sample_adf[s], dtype=np.float64)
    adr = ad - adf
    conf_depth = float(ad.sum())

    # genotype category (getEVSGenotypeCode: HET=0, HOM=1, HETALT=2)
    if ploidy == 2 and a0 != a1:
        gt_cat = 2.0 if (a0 > 0 and a1 > 0) else 0.0
    else:
        gt_cat = 1.0

    fudge = 1e-30
    bias_lower = 0.0
    bias = 0.0
    if ploidy == 2 and a0 != a1:
        r0, r1 = float(ad[a0]), float(ad[a1])
        lo = float(spstats.binom.cdf(r0, r0 + r1, 0.5))
        hi = float(spstats.binom.cdf(r1, r0 + r1, 0.5))
        bias_lower = -log(lo + fudge)
        bias = -log(min(1.0, 2.0 * min(lo, hi)) + fudge)
    else:
        bias_lower = -log(fudge)
        bias = -log(fudge)

    # locus mapq RMS from the pileup at the record position
    sd = result.samples[s]
    i = call.pos - 1 - result.begin
    mq_n = int(sd.pileup.mapq_n[i]) if 0 <= i < len(sd.pileup.mapq_n) else 0
    mq_rms = (float(np.sqrt(sd.pileup.mapq_sumsq[i] / mq_n))
              if mq_n > 0 else 0.0)

    rel_depth = 1.0
    if chrom_depth and chrom_depth > 0:
        total_depth = sum(
            int(r.pileup.mapq_n[i]) if 0 <= i < len(r.pileup.mapq_n) else 0
            for r in result.samples)
        rel_depth = total_depth / chrom_depth

    alt_fwd = float(adf[primary_alt])
    alt_rev = float(adr[primary_alt])
    from ..models.continuous import strand_bias
    sb_raw = float(strand_bias(alt_fwd, alt_rev,
                               float(adf.sum()) - alt_fwd,
                               float(adr.sum()) - alt_rev))
    sb = float(np.clip(sb_raw, -99.0, 99.0))

    rc = (result.ref_halo if result.ref_halo is not None
          else result.ref_codes)
    off = result.halo_off if result.ref_halo is not None else 0
    b0 = call.pos - result.begin + off
    b1 = b0 + key.delete_length
    vals = {
        "GenotypeCategory": gt_cat,
        "SampleIndelRepeatCount": float(rec.indel_repeat_count),
        "SampleIndelRepeatUnitSize": float(len(rec.repeat_unit or "")),
        "SampleIndelAlleleBiasLower": bias_lower,
        "SampleIndelAlleleBias": bias,
        "SampleProxyRMSMappingQuality": mq_rms,
        "RelativeTotalLocusDepth": rel_depth,
        "SamplePrimaryAltAlleleDepthFraction":
            float(ad[primary_alt]) / max(conf_depth, 1.0),
        "ConservativeGenotypeQuality": float(call.sample_gqx[s]),
        "InterruptedHomopolymerLength":
            float(indel_interrupted_hpol(rc, b0, b1)),
        "ContextCompressability":
            float(context_compressability(rc, b0, b1, 5)),
        "IndelCategory":
            1.0 if (key.delete_length > 0 and not key.insert_seq) else 0.0,
        "SampleAlleleCountStrandBias": sb,
        # not in an active region (haplotype count ratios are not
        # tracked per locus yet)
        "NormalizedAltHaplotypeCountRatio": -1.0,
        # RNA indel feature set (rnaVariantEmpiricalScoringFeatures.hh)
        "SampleRefAlleleDepth": float(ad[0]),
        "SamplePrimaryAltAlleleDepth": float(ad[primary_alt]),
        "VariantAlleleQuality": float(call.qual),
        "SampleRefRepeatCount": float(rec.ref_repeat_count),
        "SampleIndelMeanDistanceFromReadEdge": (
            float(call.sample_edge_dist[s])
            if call.sample_edge_dist else 0.0),
    }
    return np.array([vals.get(name, 0.0) for name in forest.features])


def _emit_indel(opt, result, call: IndelCall, sample_names, gvcf_lines,
                var_lines, blocks, indel_forest=None,
                chrom_depth: float | None = None):
    n_samples = len(sample_names)
    pos0, ref_str, alts, cigars = vcf_indel_strings(result, call)
    A = len(call.keys) + 1
    rus, refreps, idreps = [], [], []
    for rec in call.records:
        ru = rec.repeat_unit if rec.repeat_unit and len(rec.repeat_unit) <= 20 else "."
        rus.append(ru)
        refreps.append(str(rec.ref_repeat_count))
        idreps.append(str(rec.indel_repeat_count))
    info = (f"CIGAR={','.join(cigars)};RU={','.join(rus)};"
            f"REFREP={','.join(refreps)};IDREP={','.join(idreps)}")
    fmt = "GT:GQ:GQX:DPI:AD:ADF:ADR:FT:PL"
    cols = []
    sample_filter_sets = []
    any_pass_variant = False
    evsf = ""
    for s in range(n_samples):
        ploidy = (call.sample_ploidy[s] if call.sample_ploidy is not None
                  else 2)
        if ploidy == 0:
            gt = "."
        else:
            gt = _gt_string_indel(call.sample_gt[s], max(ploidy, 1), A)
        gqx = call.sample_gqx[s]
        filters = []
        is_var_gt = (ploidy > 0 and
                     any(int(a) > 0 for a in
                         _gt_string_indel(call.sample_gt[s], max(ploidy, 1),
                                          A).replace("|", "/").split("/")
                         if a != "."))
        if s == 0 and is_var_gt and opt.is_report_evs_features:
            f0 = germline_indel_features(
                indel_forest or _EVSF_INDEL_DEFAULT, result, call, 0,
                chrom_depth)
            evsf = ";EVSF=" + format_evsf(f0)
        if indel_forest is not None and is_var_gt:
            # EVS replaces GQX and drives the LowGQX filter
            # (ScoringModelManager classify_indel semantics)
            feats = germline_indel_features(indel_forest, result, call, s,
                                            chrom_depth)
            evs = float(indel_forest.score_phred(feats[None])[0])
            gqx = int(round(evs))
            if evs < indel_forest.filter_cutoff:
                filters.append("LowGQX")
        elif gqx < opt.gvcf_min_gqx:
            filters.append("LowGQX")
        # LowDepth on DPI or AD sum (applyDepthFilter :252-265)
        if call.sample_dpi[s] < opt.gvcf_min_passed_call_depth or \
                sum(call.sample_ad[s]) < opt.gvcf_min_passed_call_depth:
            filters.append("LowDepth")
        sample_filter_sets.append(set(filters))
        fstr = _filter_str(set(filters))
        is_var = any(int(a) > 0 for a in gt.replace("|", "/").split("/"))
        if is_var and not filters:
            any_pass_variant = True
        cols.append(
            f"{gt}:{call.sample_gq[s]}:{gqx}:{call.sample_dpi[s]}:"
            f"{','.join(map(str, call.sample_ad[s]))}:"
            f"{','.join(map(str, call.sample_adf[s]))}:"
            f"{','.join(map(str, call.sample_adr[s]))}:{fstr}:"
            f"{','.join(map(str, call.sample_pl[s]))}")
    # FILTER merging (getExtendedLocusFilters): IndelConflict is a
    # locus-level filter; variants VCF adds the per-sample filter
    # intersection + NoPassedVariantGTs; per-sample gVCF adds that
    # sample's filters
    locus_fset = {"IndelConflict"} if call.is_conflict else set()
    inter = (set.intersection(*sample_filter_sets)
             if sample_filter_sets else set())
    var_fset = locus_fset | inter
    if not any_pass_variant:
        var_fset.add("NoPassedVariantGTs")
    pre_cols = (f"{result.chrom}\t{pos0 + 1}\t.\t{ref_str}\t"
                f"{','.join(alts)}\t{call.qual}")
    post_cols = f"{info}{evsf}\t{fmt}"
    line = (f"{pre_cols}\t{_filter_str(var_fset)}\t{post_cols}\t"
            + "\t".join(cols))
    var_lines.append(line)
    for s in range(n_samples):
        blocks[s].flush(result.chrom, gvcf_lines[s], opt.block_label)
        gvcf_lines[s].append(
            f"{pre_cols}\t{_filter_str(locus_fset | sample_filter_sets[s])}"
            f"\t{post_cols}\t{cols[s]}")
