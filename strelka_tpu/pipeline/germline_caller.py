"""End-to-end germline calling over a region.

TPU-native replacement for the reference's per-position streaming
germline pipeline (reference: applications/starling/
starling_pos_processor.cpp process_pos_snp_digt:620,
process_pos_indel_digt:1610 and starling_run.cpp region loop).

Execution model: the whole region is processed as a few batched array
programs —
  1. read ingestion -> expanded alignment tables  (host numpy)
  2. pileup scatter -> [pos, depth] tiles          (host numpy)
  3. SNV genotyping over all positions             (jax, device)
  4. candidate indel loci -> read x haplotype scoring (jax, device)
  5. indel genotyping                              (jax, device)
  6. record assembly                               (host)
"""
from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from ..io import bam as bamio
from ..io.fasta import FastaReference, decode_bases
from ..models import digt, error_model, indel_genotype as ig, snv_digt
from ..options import GermlineOptions
from . import candidates as cand
from . import pileup as pl
from . import reads as rd
from . import realign


@dataclass
class SampleSiteData:
    """Per-sample site-level call results over [begin, end)."""
    pileup: pl.PileupRegion
    snv: snv_digt.SnvCallResult
    used_counts: np.ndarray       # [L, 4]
    used_fwd_counts: np.ndarray   # [L, 4]
    dpf: np.ndarray               # [L] filtered basecalls
    mean_edge_dist: np.ndarray | None = None  # [L] mean min-dist from read edge
    # per-position ploidy state (starling_pos_processor.cpp:644-651):
    # group_ploidy = max(0, region ploidy + spanning-deletion
    # adjustment); caller_ploidy = 2 where group_ploidy == 0 else
    # group_ploidy (genotyping ploidy); homalt_del marks sites inside
    # hom-alt genotyped deletions (GT "." / GQX undefined);
    # ploidy_conflict marks covered sites in no-ploid regions
    group_ploidy: np.ndarray | None = None    # [L] int8
    caller_ploidy: np.ndarray | None = None   # [L] int8, 1 or 2
    homalt_del: np.ndarray | None = None      # [L] bool
    ploidy_conflict: np.ndarray | None = None  # [L] bool


@dataclass
class IndelCall:
    """One genotyped indel locus (single- or multi-allele)."""
    pos: int                      # leftmost indel pos
    keys: list[cand.IndelKey]
    records: list[cand.IndelRecord]
    # per-sample results
    sample_gt: list[int]          # triangular genotype index
    sample_gq: list[int]
    sample_gqx: list[int]
    sample_pl: list[np.ndarray]
    sample_ad: list[np.ndarray]   # [A] confident allele depths
    sample_adf: list[np.ndarray]
    sample_adr: list[np.ndarray]
    sample_dpi: list[int]
    sample_ploidy: list = None
    # per-sample mean distance-from-closest-read-edge over confident
    # primary-alt-supporting reads, capped at 20 per read
    # (AlleleReportInfoUtil.cpp:354-359; RNA EVS feature)
    sample_edge_dist: list = None
    qual: int = 0
    # more orthogonal alleles overlapped this locus than could be
    # jointly genotyped (the reference emits such loci separately and
    # marks them all IndelConflict, VariantOverlapResolver.cpp:446-459;
    # we genotype the top-2 and mark the merged record)
    is_conflict: bool = False
    # forced-GT allele that cannot be genotyped (complex/swap allele,
    # IndelBuffer.cpp:115-129 doNotGenotype): the record is emitted
    # with the NotGenotyped filter, 'MQ=.' and all-dot sample columns
    # (variant_prefilter_stage.cpp:83-91, gvcf_writer.cpp:907-922,
    # :1025-1054) and never genotyped
    not_genotyped: bool = False


@dataclass
class RegionCallResult:
    chrom: str
    begin: int
    end: int
    ref_codes: np.ndarray
    samples: list[SampleSiteData]
    indels: list[IndelCall]
    stats: dict = field(default_factory=dict)
    # read-backed phasing: (sample, pos, base) -> hap_id for SNVs,
    # (sample, IndelKey) -> hap_id for indels; pos -> phase-set id
    snv_hap_ids: dict = field(default_factory=dict)
    indel_hap_ids: dict = field(default_factory=dict)
    phase_set_of_pos: dict = field(default_factory=dict)
    # per-sample per-position ploidy (0/1/2) over the report range
    ploidy: np.ndarray | None = None
    # (keep_indices, realigned kept batch) per sample when the caller
    # was asked to collect them (realigned-BAM output)
    realigned: list | None = None
    # halo'd reference window + report-range offset within it, for
    # context metrics (hpol/STR) that must see across segment edges
    ref_halo: np.ndarray | None = None
    halo_off: int = 0


def snv_hpol(ref_codes: np.ndarray, pos: int) -> int:
    """Contextual homopolymer length at a site (SNVHPOL info field;
    exact port of blt_common/ref_context.cpp get_snp_hpol_size: 1 +
    the adjacent up/downstream runs, summed when both flanks repeat
    the same base — the site's own base is ignored)."""
    n = len(ref_codes)
    up_repeat = 4
    up = 0
    i = pos - 1
    if i >= 0:
        up_repeat = int(ref_codes[i])
        if up_repeat != 4:
            while i >= 0 and ref_codes[i] == up_repeat:
                up += 1
                i -= 1
    dn_repeat = 4
    dn = 0
    i = pos + 1
    if i < n:
        dn_repeat = int(ref_codes[i])
        if dn_repeat != 4:
            while i < n and ref_codes[i] == dn_repeat:
                dn += 1
                i += 1
    return 1 + (up + dn if up_repeat == dn_repeat else max(up, dn))


def build_sample_pileup(
    opt: GermlineOptions,
    batch: bamio.ReadBatch,
    ea: rd.ExpandedAlignments,
    level: np.ndarray,
    ref_codes: np.ndarray,
    ref_offset: int,
    begin: int,
    end: int,
    candidate_snv_mask=None,
    exempt_snv_keys: np.ndarray | None = None,
):
    """Pileup + per-position counts (no genotyping).

    ref_codes covers the halo'd fetch window starting at ref_offset;
    the pileup/report range is [begin, end). Returns a SampleSiteData
    with snv=None; genotype_sample_snvs fills it in (the split lets
    indel genotyping run first, whose genotyped deletions modify the
    site-genotyping ploidy — starling_pos_processor.hh:70-74 indel
    before snp order + pos_basecall_buffer decrementSpanningIndelPloidy)."""
    pu = None
    native_fwd = None
    if batch.n:
        # native single-pass pileup (exact match to the Python path)
        from ..io.native import pileup_native
        # depth padded to the SNV chunk bucket so full 32k chunks are
        # zero-copy row slices of the tile (no staging copies)
        res = pileup_native(
            batch, level, ref_codes, ref_offset, begin, end,
            min_qscore=opt.min_qscore,
            mm_flank=opt.max_win_mismatch_flank_size,
            mm_max=opt.max_win_mismatch,
            exempt_keys=exempt_snv_keys,
            depth_pad=snv_digt.SNV_TILE_D_PAD)
        if res is not None:
            pu, native_fwd = res
    if pu is None:
        mmf = nbm = None
        if batch.n:
            mmf, _t2, nbm = rd.mismatch_density_filter(
                batch, ea, ref_codes, ref_offset,
                opt.max_win_mismatch_flank_size, opt.max_win_mismatch,
                candidate_snv_mask=candidate_snv_mask,
                with_neighbor=True)
        pu = pl.build_pileup(batch, ea, level, ref_codes, begin, end,
                             min_qscore=opt.min_qscore, mm_filter=mmf,
                             depth_pad=snv_digt.SNV_TILE_D_PAD,
                             neighbor_mm=nbm)
    rc = ref_codes[begin - ref_offset:end - ref_offset]
    # unused lanes keep their raw base/qual values: every consumer in
    # the SNV model masks on tile.mask, and one_hot of out-of-range
    # codes is a zero row — skipping the two [L, D] np.where copies
    # saves the dominant allocation of this function
    tile = snv_digt.SnvPileupTile(
        base_id=pu.base_id,
        qual=pu.qual,
        is_fwd=pu.is_fwd,
        mask=pu.used,
        ref_gt=rc.astype(np.int32),
    )

    counts = pu.used_counts()
    if native_fwd is not None:
        fwd_counts = native_fwd
    else:
        fwd_counts = np.zeros_like(counts)
        li, di = np.nonzero(pu.used & pu.is_fwd)
        np.add.at(fwd_counts, (li, pu.base_id[li, di]), 1)
    dpf = (pu.valid & ~pu.used).sum(axis=1).astype(np.int32)
    # mean min-distance from read edge over used calls (EVS feature
    # SampleMeanDistanceFromReadEdge); the native pileup accumulates
    # the sum in its fill pass
    used_n = counts.sum(axis=1)
    if pu.edge_dist_sum is not None:
        mean_dist = np.where(used_n > 0,
                             pu.edge_dist_sum / np.maximum(used_n, 1), 0.0)
    else:
        rlens = np.diff(batch.seq_off) if batch.n else np.zeros(0, np.int64)
        ridx = np.maximum(pu.read_idx, 0)
        rl_t = rlens[ridx] if batch.n else np.zeros_like(ridx)
        dist_t = np.minimum(pu.read_off,
                            np.maximum(rl_t - 1 - pu.read_off, 0))
        with np.errstate(invalid="ignore"):
            mean_dist = np.where(
                used_n > 0,
                (dist_t * pu.used).sum(axis=1) / np.maximum(used_n, 1), 0.0)
    sd = SampleSiteData(pileup=pu, snv=None, used_counts=counts,
                        used_fwd_counts=fwd_counts, dpf=dpf,
                        mean_edge_dist=mean_dist)
    sd._tile = tile  # carried to genotype_sample_snvs
    return sd


def genotype_sample_snvs(opt: GermlineOptions, sd: SampleSiteData,
                         haploid_mask: np.ndarray | None = None) -> None:
    """SNV genotyping over a built pileup; fills sd.snv in place."""
    dep = None
    if opt.bsnp_ssd_no_mismatch > 0 or opt.bsnp_ssd_one_mismatch > 0:
        # dependent basecall-error adjustment (adjust_joint_eprob,
        # default-on in the reference germline caller)
        pu = sd.pileup
        dep = snv_digt.dependent_eprob_deltas(
            np.asarray(pu.base_id, dtype=np.int8)
            if pu.base_id.dtype != np.int8 else pu.base_id,
            pu.qual, pu.used, pu.is_fwd, pu.neighbor_mm,
            opt.bsnp_ssd_no_mismatch, opt.bsnp_ssd_one_mismatch)
    snv = snv_digt.call_snv_tile_chunked(
        sd._tile, theta=opt.bsnp_diploid_theta,
        is_haploid=(jnp.asarray(haploid_mask)
                    if haploid_mask is not None and haploid_mask.any()
                    else None),
        het_vf_extension=opt.het_variant_frequency_extension,
        het_vf_increment=opt.max_het_variant_frequency_increment,
        dep=dep)
    sd.snv = snv
    del sd._tile


def call_sample_sites(
    opt: GermlineOptions,
    batch: bamio.ReadBatch,
    ea: rd.ExpandedAlignments,
    level: np.ndarray,
    ref_codes: np.ndarray,
    ref_offset: int,
    begin: int,
    end: int,
    candidate_snv_mask=None,
    haploid_mask: np.ndarray | None = None,
    exempt_snv_keys: np.ndarray | None = None,
) -> SampleSiteData:
    """Pileup + SNV genotyping in one step (no indel interaction)."""
    sd = build_sample_pileup(opt, batch, ea, level, ref_codes, ref_offset,
                             begin, end, candidate_snv_mask=candidate_snv_mask,
                             exempt_snv_keys=exempt_snv_keys)
    genotype_sample_snvs(opt, sd, haploid_mask=haploid_mask)
    return sd


def call_region(
    opt: GermlineOptions,
    ref: FastaReference,
    chrom: str,
    begin: int,
    end: int,
    batches: list[bamio.ReadBatch],
    external_indel_vcfs: list[str] | None = None,
    forced_gt_vcfs: list[str] | None = None,
    ploidy_vcf: str | None = None,
    collect_realigned: bool = False,
    indel_error_model_files: list[str] | None = None,
) -> RegionCallResult:
    """Joint germline calling for N samples over one region."""
    n_samples = len(batches)
    halo = opt.max_indel_size + 250  # supplementalRegionBorderSize semantics
    fetch_begin = max(0, begin - halo)
    fetch_end = min(ref.contig_length(chrom), end + halo)
    ref_codes = ref.fetch(chrom, fetch_begin, fetch_end)

    em = error_model.IndelErrorModel(
        n_samples, model_files=indel_error_model_files)

    samples = []
    eas, levels, kept, keep_indices = [], [], [], []
    split_maps = []  # (parent_row, seg_no, pre-split kept batch) or None
    store = cand.IndelObservationStore(n_samples)
    for s, raw in enumerate(batches):
        keep, level = rd.filter_and_classify_reads(raw, opt.min_mapping_quality)
        keep_indices.append(np.nonzero(keep)[0])
        batch = raw.select(keep)
        level = level[keep]
        # spliced (N-CIGAR) reads decompose into exon segments that
        # buffer/realign/pile up independently (starling_read_segment)
        sbatch, slevel, parent_row, seg_no = rd.split_spliced_reads(
            batch, level)
        if sbatch is not batch:
            split_maps.append((parent_row, seg_no, batch))
            batch, level = sbatch, slevel
        else:
            split_maps.append(None)
        ea = rd.expand_alignments(batch)
        kept.append(batch)
        eas.append(ea)
        levels.append(level)
        cand.extract_read_indels(batch, ea, level, ref_codes, fetch_begin,
                                 store, s, opt.max_indel_size)

    # active-region haplotype discovery: indels/SNVs confirmed by
    # haplotyping gate candidacy (IndelBuffer isHaplotypingEnabled path)
    from . import active_region as arp
    candidate_snvs: set[tuple[int, int]] = set()  # (pos, base)
    snv_hap_ids: dict[tuple[int, int, int], int] = {}  # (sample,pos,base)->hap
    indel_hap_ids: dict[tuple[int, cand.IndelKey], int] = {}
    anchors = arp.anchor_mask(ref_codes)
    region_sets = []
    cand_masks = []
    for s in range(n_samples):
        counts_ev, depth_ev = arp.variant_evidence(
            kept[s], eas[s], levels[s], ref_codes, fetch_begin, fetch_end)
        region_sets.append(arp.find_active_regions(
            counts_ev, depth_ev, anchors, ref_codes, fetch_begin))
        cand_masks.append(arp.candidate_variant_mask(
            counts_ev, depth_ev, ref_codes))
    # synchronize regions across samples (union of overlapping spans)
    from ..utils.ranges import RegionTracker
    tracker = RegionTracker()
    for regions in region_sets:
        for r in regions:
            tracker.add(r.begin, r.end)
    sync_regions = [arp.ActiveRegion(b, e) for b, e in tracker.intervals()]
    phase_set_of_pos: dict[int, int] = {}
    for region in sync_regions:
        for s in range(n_samples):
            dv = arp.process_active_region(
                kept[s], eas[s], levels[s], ref_codes, fetch_begin, region,
                cand_mask=cand_masks[s])
            if dv.bypassed:
                # doNotUseHaplotyping (ActiveRegionProcessor.cpp:266-292):
                # indels in a failed region skip the haplotyping gate and
                # go through normal binomial candidacy
                for key, rec in store.records.items():
                    if region.begin <= key.pos < region.end:
                        rec.discovered_in_active_region = True
                continue
            for key, hap in dv.indels:
                rec = store._get(key)
                rec.discovered_in_active_region = True
                indel_hap_ids[(s, key)] = hap
            for pos, base, hap in dv.snvs:
                candidate_snvs.add((pos, base))
                snv_hap_ids[(s, pos, base)] = hap
        for p in range(region.begin, region.end):
            phase_set_of_pos[p] = region.begin + 1  # PS = 1-based start

    # external candidate indels (e.g. Manta VCF) + forced-GT alleles
    ng_forced: list[cand.IndelKey] = []

    def _add_vcf_indels(paths, is_forced):
        from ..io.vcf import read_vcf
        for path in paths:
            for recvcf in read_vcf(path, region=(chrom, fetch_begin, fetch_end)):
                for alt in recvcf.alts:
                    if len(recvcf.ref) >= 1 and len(alt) >= 1 and alt[0] == recvcf.ref[0]:
                        dlen = len(recvcf.ref) - 1
                        ins = alt[1:] if len(alt) > 1 else ""
                        if dlen > 0 and ins:
                            # complex (swap) allele: never genotyped
                            # (IndelBuffer.cpp:115-129 doNotGenotype);
                            # forced ones still produce a NotGenotyped
                            # record
                            if is_forced:
                                ng_forced.append(
                                    cand.IndelKey(recvcf.pos + 1, dlen, ins))
                            continue
                        if max(dlen, len(ins)) <= opt.max_indel_size and (dlen or ins):
                            store.add_external(
                                cand.IndelKey(recvcf.pos + 1, dlen, ins),
                                is_forced=is_forced)

    if external_indel_vcfs:
        _add_vcf_indels(external_indel_vcfs, False)
    if forced_gt_vcfs:
        _add_vcf_indels(forced_gt_vcfs, True)

    # ploidy regions (reference: ploidy_util.hh — VCF records with END
    # + per-sample CN; CN=1 -> haploid priors, CN=0 -> no-call)
    L_report = end - begin
    ploidy_arr = np.full((n_samples, L_report), 2, dtype=np.int8)
    if ploidy_vcf:
        from ..io.vcf import read_vcf
        for v in read_vcf(ploidy_vcf):
            if v.chrom != chrom:
                continue
            vend = v.pos + len(v.ref)
            for kv in v.info.split(";"):
                if kv.startswith("END="):
                    vend = int(kv[4:])
            fmt = v.format.split(":") if v.format else []
            cn_idx = fmt.index("CN") if "CN" in fmt else -1
            for s in range(min(n_samples, len(v.samples))):
                cn = 2
                if cn_idx >= 0:
                    try:
                        cn = int(v.samples[s].split(":")[cn_idx])
                    except (ValueError, IndexError):
                        continue
                b = max(v.pos - begin, 0)
                e = min(vend - begin, L_report)
                if e > b and cn in (0, 1):
                    ploidy_arr[s, b:e] = cn

    # MMDF exemption for haplotype-confirmed SNVs
    # (create_mismatch_filter_map's candidateSnvBuffer check)
    exempt_keys = np.array([p * 4 + b for p, b in candidate_snvs],
                           dtype=np.int64) if candidate_snvs else None

    def snv_exempt_mask(ref_pos, base):
        if exempt_keys is None:
            return np.zeros(len(ref_pos), dtype=bool)
        return np.isin(np.asarray(ref_pos, dtype=np.int64) * 4
                       + np.asarray(base, dtype=np.int64), exempt_keys)

    # candidacy over pooled observations
    ests = [cand.estimated_depth(kept[s], eas[s], levels[s], fetch_begin, fetch_end)
            for s in range(n_samples)]
    est_sum = ests[0]
    for e in ests[1:]:
        est_sum = np.maximum(est_sum, e)
    # germline caller gates indel candidacy on active-region discovery
    # (IndelBuffer.cpp:222 isHaplotypingEnabled path)
    candidacy = cand.evaluate_candidacy(
        store, est_sum, fetch_begin, em, ref_codes, fetch_begin,
        alpha=opt.indel_candidate_signal_test_alpha,
        require_active_region_discovery=True)

    # segment assignment by the VCF anchor position (k.pos - 1): the
    # record, its DPI lookup (depth at the site preceding the indel),
    # and its emission slot all live in the anchor's segment — keying
    # by k.pos instead silently dropped indels whose first changed
    # base equals a segment begin and read out-of-tile DPI
    cand_keys = sorted(k for k, ok in candidacy.items() if ok
                       and begin <= k.pos - 1 < end)

    # group overlapping candidate indels into loci (orthogonal allele
    # groups, OrthogonalVariantAlleleCandidateGroupUtil simplified:
    # alleles whose ref spans intersect form one locus, capped at 2 alts)
    loci: list[list[cand.IndelKey]] = []
    for k in cand_keys:
        if loci and k.pos <= max(x.right_pos for x in loci[-1]) + 1 \
                and k.pos - min(x.pos for x in loci[-1]) < 50:
            loci[-1].append(k)
        else:
            loci.append([k])

    # trim each locus group to its top-2 supported alleles
    groups_trimmed = []
    for group in loci:
        group = sorted(group, key=lambda k: (
            -max(len(store.records[k].samples[s].tier1_reads)
                 for s in range(n_samples)), k))[:2]
        groups_trimmed.append(sorted(group))

    # forced-output alleles displaced by the top-2 trim still must be
    # emitted: each becomes its own single-allele locus scored against
    # the displacing alleles as a CONTRAST group whose read scores are
    # maxed down into ref (forced-output pathway,
    # starling_pos_processor.cpp:1826-1966, contrastGroup =
    # topVariantAlleleGroup; AlleleGroupGenotype.cpp:236-247)
    forced_groups: list[tuple[list[cand.IndelKey], int]] = []
    for gi, group in enumerate(loci):
        trimmed = groups_trimmed[gi]
        for k in group:
            if k not in trimmed and store.records[k].is_forced_output:
                forced_groups.append(([k] + list(trimmed), len(trimmed)))

    # batched read x haplotype scoring across all loci per sample
    # (fixed-shape buckets; one kernel launch per bucket); forced
    # contrast groups ride the same batched launches
    from . import realign_batch as rb
    scored_groups = groups_trimmed + [fk for fk, _ in forced_groups]
    sample_scores = [
        rb.score_loci_batched(kept[s], eas[s], levels[s], ref_codes,
                              fetch_begin, scored_groups,
                              selection="overlap",
                              min_bp_flank=opt.default_min_read_bp_flank)
        for s in range(n_samples)]

    # Reference ALT ordering for multi-alt loci
    # (selectTopOrthogonalAllelesInAllSamples,
    # OrthogonalVariantAlleleCandidateGroupUtil.cpp:286-391): rank each
    # group's kept alleles by per-sample summed naive posteriors
    # (ploidy-aware topSize, referenceRank adjustment), aggregate
    # (ploidy - rank) votes across samples, and reorder — ALT column /
    # genotype-index order then matches the reference instead of the
    # read-count trim order. Score columns and the breakpoint gate are
    # permuted/rekeyed to the new first allele.
    for gi, group in enumerate(groups_trimmed):
        if len(group) < 2:
            continue
        cps = []
        lhood_list = []
        for s in range(n_samples):
            sc = sample_scores[s].get(gi)
            lhood_list.append(None if sc is None or
                              not len(sc.allele_lhoods)
                              else sc.allele_lhoods)
            pl_s = int(ploidy_arr[s, min(max(group[0].pos - begin, 0),
                                         L_report - 1)])
            cps.append(2 if pl_s == 0 else max(pl_s, 1))
        new_order = rank_locus_alleles(lhood_list, cps, len(group))
        if new_order == list(range(len(group))):
            continue
        groups_trimmed[gi] = [group[ai] for ai in new_order]
        scored_groups[gi] = groups_trimmed[gi]
        perm = np.array([0] + [1 + ai for ai in new_order])
        import dataclasses
        for s in range(n_samples):
            sc = sample_scores[s].get(gi)
            if sc is None:
                continue
            sc = dataclasses.replace(
                sc, allele_lhoods=sc.allele_lhoods[:, perm],
                best_offsets=(sc.best_offsets[:, perm]
                              if sc.best_offsets is not None else None))
            sample_scores[s][gi] = rb.recompute_bp_gate(
                sc, groups_trimmed[gi][0],
                opt.default_min_read_bp_flank)

    # apply realignments (finishRealignment semantics): reads that
    # confidently support an indel haplotype get the indel embedded in
    # their alignment; site calling then runs on the realigned pileup
    from . import realign_apply as ra
    n_realigned_total = 0
    for s in range(n_samples):
        new_batch, n_re = ra.apply_realignments(
            kept[s], sample_scores[s], scored_groups,
            unroll_clips=not opt.retain_optimal_soft_clipping,
            ref_codes=ref_codes, ref_offset=fetch_begin)
        if n_re:
            kept[s] = new_batch
            eas[s] = rd.expand_alignments(new_batch)
            n_realigned_total += n_re

    # open breakpoint (BP_LEFT/BP_RIGHT) candidates from oversized read
    # indels: reads whose breakpoint haplotype wins get soft-clipped at
    # the junction before the pileup
    bp_cands = cand.evaluate_breakpoint_candidacy(
        store, est_sum, fetch_begin, em,
        alpha=opt.indel_candidate_signal_test_alpha)
    if bp_cands:
        for s in range(n_samples):
            bp_loci = [(pos, side, realign.score_breakpoint_locus(
                kept[s], eas[s], levels[s], ref_codes, fetch_begin,
                pos, side, seq)) for pos, side, seq in bp_cands]
            new_batch, n_bp = ra.apply_breakpoint_clips(kept[s], bp_loci)
            if n_bp:
                kept[s] = new_batch
                eas[s] = rd.expand_alignments(new_batch)
                n_realigned_total += n_bp

    # per-sample pileups over the report range (post-realignment,
    # matching the reference's align -> pileup stage order)
    for s in range(n_samples):
        samples.append(build_sample_pileup(
            opt, kept[s], eas[s], levels[s], ref_codes, fetch_begin,
            begin, end, candidate_snv_mask=snv_exempt_mask,
            exempt_snv_keys=exempt_keys))

    # indel genotyping runs BEFORE site genotyping (the reference
    # processes indels first at each position,
    # starling_pos_processor.hh:70-74) because genotyped deletion
    # alleles reduce the site-genotyping ploidy over their span
    # (updateDiploidIndelLocusWithSampleInfo ->
    # pos_basecall_buffer::decrementSpanningIndelPloidy)
    # batched genotype pre-pass: apply the breakpoint gate, then run
    # the per-locus lhood/confidence/support math for ALL (sample,
    # locus) pairs sharing (ploidy, allele count) in one vectorized
    # call (ig.batch_genotype_lhoods — bitwise identical to the
    # in-loop formulation, tests/test_indel_batch_gt.py)
    pre_gt_map: dict[tuple[int, int], object] = {}
    _buckets: dict[tuple[int, int], list] = {}
    for gi, group in enumerate(groups_trimmed):
        A_loc = len(group) + 1
        for s in range(n_samples):
            sc = sample_scores[s].get(gi)
            if sc is None:
                continue
            gated = realign.apply_genotyping_mask(sc)
            if gated is None:
                pre_gt_map[(s, gi)] = "EMPTY"
                continue
            pl_s = int(ploidy_arr[s, min(max(group[0].pos - begin, 0),
                                         L_report - 1)])
            cp = max(pl_s, 1)
            # power-of-two read-count sub-buckets bound padding waste
            # (one deep locus must not inflate Rpad for every locus)
            rb_key = 1 << max(int(len(gated.allele_lhoods)) - 1, 0)                 .bit_length()
            _buckets.setdefault((cp, A_loc, rb_key), []).append(
                (s, gi, gated))
    for (cp, A_loc, _rb), items in _buckets.items():
        entries = [(np.asarray(sc.allele_lhoods, np.float64),
                    sc.read_len, sc.n_nonambig,
                    [k.insert_length for k in groups_trimmed[gi]],
                    [k.delete_length for k in groups_trimmed[gi]])
                   for s, gi, sc in items]
        res = ig.batch_genotype_lhoods(entries, cp, A_loc,
                                       opt.default_min_read_bp_flank)
        for (s, gi, sc), (lh_b, conf_b, sup_b) in zip(items, res):
            pre_gt_map[(s, gi)] = (sc, lh_b, conf_b, sup_b)

    indel_calls: list[IndelCall] = []
    for gi, group in enumerate(groups_trimmed):
        call = genotype_indel_locus(
            opt, group, [store.records[k] for k in group], kept, eas, levels,
            ref_codes, fetch_begin, samples, begin, n_samples,
            sample_ploidy=[int(ploidy_arr[s, min(max(group[0].pos - begin, 0),
                                                 L_report - 1)])
                           for s in range(n_samples)],
            precomputed_scores=[sample_scores[s].get(gi)
                                for s in range(n_samples)],
            pre_gt=[pre_gt_map.get((s, gi)) for s in range(n_samples)])
        if call is not None:
            if len(loci[gi]) > len(group):
                call.is_conflict = True
            indel_calls.append(call)

    # displaced forced alleles: single-allele loci; the trailing
    # contrast columns of their score matrices are maxed into ref
    # inside genotype_indel_locus (n_contrast)
    for fi, (fkeys, n_contrast) in enumerate(forced_groups):
        gi = len(groups_trimmed) + fi
        call = genotype_indel_locus(
            opt, fkeys[:1], [store.records[fkeys[0]]], kept, eas, levels,
            ref_codes, fetch_begin, samples, begin, n_samples,
            sample_ploidy=[int(ploidy_arr[s, min(max(fkeys[0].pos - begin,
                                                     0), L_report - 1)])
                           for s in range(n_samples)],
            precomputed_scores=[sample_scores[s].get(gi)
                                for s in range(n_samples)],
            n_contrast=n_contrast)
        if call is not None:
            indel_calls.append(call)

    # forced complex (swap) alleles: NotGenotyped records with all-dot
    # sample columns; zero GTs keep them out of the site-modification
    # and spanning-deletion ploidy machinery below
    for key in ng_forced:
        if not (begin <= key.pos <= end):
            continue
        zero = np.zeros(2, dtype=np.int32)  # A = 1 alt + ref
        indel_calls.append(IndelCall(
            pos=key.pos, keys=[key],
            records=[cand.IndelRecord(key=key, samples=[],
                                      is_external=True,
                                      is_forced_output=True)],
            sample_gt=[0] * n_samples, sample_gq=[0] * n_samples,
            sample_gqx=[0] * n_samples,
            sample_pl=[np.zeros(3, np.int64)] * n_samples,
            sample_ad=[zero] * n_samples, sample_adf=[zero] * n_samples,
            sample_adr=[zero] * n_samples, sample_dpi=[0] * n_samples,
            sample_ploidy=[2] * n_samples,
            sample_edge_dist=[0.0] * n_samples,
            not_genotyped=True))
    if ng_forced:
        indel_calls.sort(key=lambda c: c.pos)

    # spanning-deletion ploidy modification: each deletion allele
    # occurrence in a sample's max GT decrements ploidy over
    # [key.pos, key.right_pos) (starling_pos_processor.cpp:1213-1243)
    from ..models.indel_genotype import genotype_alleles as _galleles
    ploidy_adj = np.zeros((n_samples, L_report), dtype=np.int16)
    for call in indel_calls:
        A = len(call.keys) + 1
        for s in range(n_samples):
            pl_s = max(call.sample_ploidy[s], 1) if call.sample_ploidy else 2
            ga = _galleles(pl_s, A)
            for ai in ga[call.sample_gt[s]][:pl_s]:
                ai = int(ai)
                if ai == 0:
                    continue
                k = call.keys[ai - 1]
                if k.delete_length == 0:
                    continue
                b = max(k.pos - begin, 0)
                e = min(k.right_pos - begin, L_report)
                if e > b:
                    ploidy_adj[s, b:e] -= 1

    group_ploidy = np.maximum(
        ploidy_arr.astype(np.int16) + ploidy_adj, 0).astype(np.int8)
    caller_ploidy = np.where(group_ploidy == 0, 2, group_ploidy).astype(np.int8)
    homalt_del = (group_ploidy == 0) & (ploidy_adj < 0)

    # site genotyping with the deletion-adjusted ploidy
    for s in range(n_samples):
        sd = samples[s]
        genotype_sample_snvs(opt, sd, haploid_mask=(caller_ploidy[s] == 1))
        dp_v = sd.used_counts.sum(axis=1)
        sd.group_ploidy = group_ploidy[s]
        sd.caller_ploidy = caller_ploidy[s]
        sd.homalt_del = homalt_del[s]
        # covered sites in a no-ploid region that is NOT a hom-alt
        # deletion span conflict with the declared ploidy
        # (updateSnvLocusWithSampleInfo:366-373)
        sd.ploidy_conflict = ((dp_v > 0) & (group_ploidy[s] == 0)
                              & ~homalt_del[s])

    return RegionCallResult(
        chrom=chrom, begin=begin, end=end,
        ref_codes=ref_codes[begin - fetch_begin:end - fetch_begin],
        ref_halo=ref_codes, halo_off=begin - fetch_begin,
        samples=samples, indels=indel_calls,
        stats={"n_candidate_indels": len(cand_keys),
               "n_indel_records": len(store.records),
               "n_breakpoint_obs": len(store.breakpoints),
               "n_realigned_reads": n_realigned_total},
        snv_hap_ids=snv_hap_ids, indel_hap_ids=indel_hap_ids,
        phase_set_of_pos=phase_set_of_pos,
        ploidy=ploidy_arr,
        realigned=([(keep_indices[s],
                     kept[s] if split_maps[s] is None else
                     rd.reassemble_spliced(kept[s], split_maps[s][0],
                                           split_maps[s][1],
                                           split_maps[s][2]))
                    for s in range(n_samples)]
                   if collect_realigned else None),
    )


def indel_edge_distances(lrp, rrp, rl):
    """Per-read distance of an indel from the closest read edge at its
    scored with-indel placement, capped at 20.

    lrp: read offset of the first base at/after the indel; rrp: same
    plus the insertion length; rl: read lengths. Mirrors
    starling_read_align_score_indels.cpp:977-1018 (readPos = lowest
    read offset covering [pos-1, right_pos+1), revReadPos its
    reverse-strand twin, distance defaults to the full read length
    when neither side is in range) + the cap at
    AlleleReportInfoUtil.cpp:356."""
    d1 = lrp - 1
    d2 = rl - 1 - rrp
    dist = np.asarray(rl, np.int64).copy()
    dist = np.where(d1 >= 0, np.minimum(dist, d1), dist)
    dist = np.where(d2 >= 0, np.minimum(dist, d2), dist)
    return np.minimum(dist, 20)


def rank_locus_alleles(allele_lhoods_per_sample, caller_ploidies,
                       n_alt) -> list[int]:
    """Reference ALT ordering for a multi-alt locus
    (selectTopOrthogonalAllelesInAllSamples,
    OrthogonalVariantAlleleCandidateGroupUtil.cpp:286-391): per sample,
    rank the FULL allele list (ref first) by summed naive per-read
    posteriors; take alts in rank order with topSize = ploidy minus one
    when the reference ranks inside the top-ploidy; aggregate
    (ploidy - rank) votes over samples and sort descending (ties by
    first-seen order). Single-sample loci keep the sample's own rank
    order (the reference skips the aggregate re-rank there).

    allele_lhoods_per_sample: [n_samples] of [R, 1+n_alt] f64 arrays
    (None for uncovered samples). Returns the new alt index order."""
    agg = np.zeros(n_alt)
    first_seen = np.full(n_alt, 1 << 30)
    seen_n = 0
    sample0_order = None
    n_samples = len(allele_lhoods_per_sample)
    for s in range(n_samples):
        al = allele_lhoods_per_sample[s]
        if al is None or not len(al):
            continue
        cp = caller_ploidies[s]
        al = np.asarray(al, np.float64)
        alm = al - al.max(axis=1, keepdims=True)
        p = np.exp(alm)
        sup = (p / p.sum(axis=1, keepdims=True)).sum(axis=0)
        order = np.argsort(-sup, kind="stable")
        ref_rank = int(np.nonzero(order == 0)[0][0])
        top_size = cp - (1 if ref_rank < cp else 0)
        alts_ranked = [int(i) - 1 for i in order if i != 0]
        if sample0_order is None:
            sample0_order = alts_ranked
        for idx, ai in enumerate(alts_ranked[:max(top_size, 0)]):
            agg[ai] += cp - idx
            if first_seen[ai] == 1 << 30:
                first_seen[ai] = seen_n
                seen_n += 1
    if n_samples == 1 and sample0_order is not None:
        return sample0_order
    return sorted(range(n_alt),
                  key=lambda ai: (-agg[ai], first_seen[ai], ai))


def genotype_indel_locus(opt, keys, recs, kept, eas, levels, ref_codes,
                         ref_offset, samples, region_begin, n_samples,
                         sample_ploidy=None, precomputed_scores=None,
                         n_contrast: int = 0, pre_gt=None):
    """Genotype one multi-sample indel locus from read x hap scores.

    n_contrast > 0: the score matrices carry that many trailing
    contrast-allele columns beyond the locus alleles; their per-read
    scores are maxed down into the ref column before genotyping
    (AlleleGroupGenotype.cpp:236-247, the <*> reduction used by the
    forced-output pathway).

    pre_gt: optional per-sample list from the batched pre-pass
    (ig.batch_genotype_lhoods via call_region): each entry is None
    (compute here), the sentinel "EMPTY" (reads gated to nothing), or
    (gated_scores, lh, conf, sup) — bitwise identical to the in-here
    computation (tests/test_indel_batch_gt.py), just hoisted out of
    the per-locus loop."""
    A = len(keys) + 1
    info = ig.AlleleInfo(
        insert_len=np.array([k.insert_length for k in keys]),
        delete_len=np.array([k.delete_length for k in keys]),
    )
    # STR context of the PER-SAMPLE top-ranked allele drives that
    # sample's prior (repeatingPatternSize/patternRepeatCount from
    # alleleGroup.data(topAlleleIndexInSample),
    # starling_pos_processor.cpp:1408-1416); repeat info is computed
    # up front for every allele so any of them can key the theta table
    for rec in recs:
        if not rec.repeat_unit:
            cand.set_repeat_info(rec, ref_codes, ref_offset, decode_bases)
    default_ploidy = 1 if opt.is_haploid else 2
    if sample_ploidy is None:
        sample_ploidy = [default_ploidy] * n_samples

    call = IndelCall(pos=min(k.pos for k in keys), keys=keys, records=recs,
                     sample_gt=[], sample_gq=[], sample_gqx=[], sample_pl=[],
                     sample_ad=[], sample_adf=[], sample_adr=[],
                     sample_dpi=[], sample_ploidy=list(sample_ploidy),
                     sample_edge_dist=[])
    any_variant = False
    homref_lnp = 0.0  # sum over samples of ln P(hom-ref | genome prior)
    for s in range(n_samples):
        ploidy = max(sample_ploidy[s], 1)  # ploidy-0: emit as haploid no-call
        pre = pre_gt[s] if pre_gt is not None else None
        lh_pre = conf_pre = sup_pre = None
        if pre == "EMPTY":
            scores = None
        elif pre is not None:
            scores, lh_pre, conf_pre, sup_pre = pre
        elif precomputed_scores is not None:
            scores = precomputed_scores[s]
        else:
            scores = realign.score_locus(kept[s], eas[s], levels[s],
                                         ref_codes, ref_offset, list(keys))
        if pre is None and scores is not None:
            # breakpoint-overlap gate: only sufficiently-overlapping
            # reads receive ReadPathScores for genotyping
            scores = realign.apply_genotyping_mask(scores)
        if n_contrast and scores is not None and len(scores.allele_lhoods):
            import dataclasses
            al = scores.allele_lhoods
            keep = al.shape[1] - n_contrast
            red = al[:, :keep].copy()
            red[:, 0] = np.maximum(red[:, 0], al[:, keep:].max(axis=1))
            scores = dataclasses.replace(scores, allele_lhoods=red)
        # per-sample top variant allele: summed naive per-read allele
        # posteriors over the gated read set, top alt by support
        # (rankOrthogonalAllelesInSample,
        # OrthogonalVariantAlleleCandidateGroupUtil.cpp:210-258 — raw
        # lhoods, no mapping-status integration; the reference's
        # read_path_lnp maps hold only reads that passed the same
        # overlap gate). Samples with no scored reads default to
        # allele 0 (selectTopOrthogonalAllelesInAllSamples:380-390)
        top_s = 0
        if A > 2 and scores is not None and len(scores.allele_lhoods):
            if sup_pre is not None:
                sup = sup_pre
            else:
                al = scores.allele_lhoods - scores.allele_lhoods.max(
                    axis=1, keepdims=True)
                p = np.exp(al)
                sup = (p / p.sum(axis=1, keepdims=True)).sum(axis=0)
            top_s = int(np.argmax(sup[1:]))
        prior_rec = recs[top_s]
        priors = ig.context_priors_for(prior_rec.repeat_unit_length,
                                       prior_rec.ref_repeat_count)
        tri_g = ig.ag_genotype_priors_to_triangular(
            priors.diploid if ploidy == 2 else priors.haploid, A, ploidy,
            top=top_s)
        tri_p = ig.ag_genotype_priors_to_triangular(
            priors.diploid_poly if ploidy == 2 else priors.haploid_poly,
            A, ploidy, top=top_s)
        edge_mean = 0.0
        if scores is None:
            lh = np.zeros(ig.genotype_count(ploidy, A))
            ad = np.zeros(A, np.int32)
            adf = np.zeros(A, np.int32)
            adr = np.zeros(A, np.int32)
        elif lh_pre is not None:
            lh = lh_pre
            conf = conf_pre
            ad = conf.sum(axis=0).astype(np.int32)
            adf = (conf & scores.is_fwd[:, None]).sum(axis=0) \
                .astype(np.int32)
            adr = ad - adf
        else:
            glh = ig.genotype_log_lhoods(
                scores.allele_lhoods,
                np.ones(len(scores.read_rows), bool),
                scores.read_len, scores.n_nonambig, info,
                ploidy, opt.default_min_read_bp_flank)
            lh = np.asarray(glh)
            # confident supporting read counts (updateSupportingReadStats)
            integ = scores.allele_lhoods + ig.CORRECT_MAPPING_LOG_PRIOR
            rb = scores.n_nonambig[:, None] * ig.LN_RANDOM_BASE_MATCH
            al = np.logaddexp(integ, rb)
            al = al - al.max(axis=1, keepdims=True)
            p = np.exp(al)
            p /= p.sum(axis=1, keepdims=True)
            conf = p >= 0.51  # readConfidentSupportThreshold
            ad = conf.sum(axis=0).astype(np.int32)
            adf = (conf & scores.is_fwd[:, None]).sum(axis=0) \
                .astype(np.int32)
            adr = ad - adf

        pg, max_g, q_ref_g, q_max_g = ig.genotype_posteriors(lh, tri_g)
        pp, max_p, q_ref_p, q_max_p = ig.genotype_posteriors(lh, tri_p)
        if scores is not None and scores.best_offsets is not None:
            # mean distance of the genotype's primary alt indel from
            # the closest read edge over its confident supporting
            # reads, capped at 20 per read: readPos = lowest read
            # offset covering [pos-1, right_pos+1) on the max
            # with-indel placement, revReadPos its reverse-strand twin
            # (AlleleReportInfoUtil.cpp:354-359 +
            # starling_read_align_score_indels.cpp:977-1018)
            ga0 = ig.genotype_alleles(ploidy, A)
            ia0, ia1 = (int(x) for x in ga0[max_p])
            primary = ia0 if ia0 > 0 else (ia1 if ia1 > 0 else 1)
            keyp = keys[primary - 1]
            sel = conf[:, primary]
            if sel.any():
                lrp = (keyp.pos - scores.win_begin
                       - scores.best_offsets[sel, primary])
                edge_mean = float(indel_edge_distances(
                    lrp, lrp + keyp.insert_length,
                    scores.read_len[sel]).mean())
        gq = q_max_p
        gqx = min(q_max_g, q_max_p) if max_g == max_p else 0
        pl_arr = np.minimum(np.round(-10 * (lh - lh.max()) / np.log(10)), 999)
        call.sample_gt.append(max_p)
        call.sample_gq.append(int(gq))
        call.sample_gqx.append(int(gqx))
        call.sample_pl.append(pl_arr.astype(np.int32))
        call.sample_ad.append(ad)
        call.sample_adf.append(adf)
        call.sample_adr.append(adr)
        dpi_pos = call.pos - 1 - region_begin
        dpi = int(samples[s].pileup.depth[dpi_pos]) if 0 <= dpi_pos < len(samples[s].pileup.depth) else 0
        call.sample_dpi.append(dpi + int(samples[s].dpf[dpi_pos]) if 0 <= dpi_pos < len(samples[s].dpf) else dpi)
        call.sample_edge_dist.append(edge_mean)
        ga = ig.genotype_alleles(ploidy, A)
        if (ga[max_p] > 0).any():
            any_variant = True
        # QUAL accumulates ln of the genome-prior hom-ref posterior
        # over samples (starling_pos_processor.cpp:1500-1501 + :1774
        # ln_error_prob_to_qphred(homRefLogProb))
        homref_lnp += float(np.log(max(pg[0], np.finfo(np.float64).tiny)))
    import math
    call.qual = int(math.floor(-10.0 * homref_lnp / math.log(10.0) + 0.5))
    if not any_variant and not any(r.is_forced_output for r in recs):
        return None
    return call
