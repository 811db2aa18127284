"""Active region detection and haplotype discovery.

Reference: starling_common/ActiveRegionDetector.{hh,cpp},
ActiveRegionReadBuffer.{hh,cpp} (evidence weights: mismatch +1 at pos,
indel +4 at flanking/deleted positions, soft-clip +4; candidate test
isCandidateVariant :258-269), ReferenceRepeatFinder.cpp (anchor = not
inside any STR with unit <=50 spanning >= max(2*unit, 3)),
SampleActiveRegionDetector::updateEndPosition (region state machine,
ActiveRegionDetector.cpp:337-410), ActiveRegionProcessor.{hh,cpp}
(haplotype generation by counting, min support 3, top-ploidy selection;
assembly fallback for low-spanning regions).

TPU-native redesign: evidence/depth/anchor tracks are computed for the
whole region in vectorized numpy passes; only the sparse
candidate-or-anchor positions go through the (exact) region state
machine; haplotype counting uses the expanded per-base tables.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..io.bam import ReadBatch
from ..io.fasta import decode_bases, encode_bases
from ..ops.aligner import align_global
from ..utils import cigar as cg
from . import reads as rd
from .candidates import IndelKey

MISMATCH_WEIGHT = 1
INDEL_WEIGHT = 4
MIN_NUM_VARIANTS_PER_POSITION = 9
MIN_ALT_FRACTION = 0.2
MIN_ALT_FRACTION_LOW_DEPTH = 0.35
MAX_DISTANCE_BETWEEN_TWO_VARIANTS = 13
MIN_NUM_VARIANTS_PER_REGION = 2
MAX_REPEAT_UNIT_LENGTH = 50
MIN_REPEAT_SPAN = 3
MIN_FRAC_READS_COVERING_REGION = 0.65  # ActiveRegionProcessor.hh:53
MIN_HAPLOTYPE_COUNT = 3
MAX_REF_SPAN_FOR_ASSEMBLY = 250
MAX_MISMATCHES_TO_BUFFER = 10  # MaxNumMismatchesToAddToIndelBuffer


def anchor_mask(ref_codes: np.ndarray, use_native: bool = True) -> np.ndarray:
    """[L] bool: position is a valid active-region anchor (not inside
    an STR). Vectorized ReferenceRepeatFinder.updateRepeatSpan; the
    native path (native/activeregion.cpp anchor_spans) is exact."""
    if use_native:
        from ..io.native import anchor_mask_native
        res = anchor_mask_native(ref_codes)
        if res is not None:
            return res
    L = len(ref_codes)
    anchor = np.ones(L, dtype=bool)
    for u in range(1, MAX_REPEAT_UNIT_LENGTH + 1):
        if u >= L:
            break
        match = np.zeros(L, dtype=bool)
        match[u:] = (ref_codes[u:] == ref_codes[:-u]) & (ref_codes[:-u] != 4)
        # repeat span ending at pos: u + run_length_of_match_ending_at_pos
        run = np.zeros(L, dtype=np.int64)
        idx = np.arange(L)
        # run-length via cumulative count reset at non-match
        cums = np.cumsum(match)
        last_false = np.maximum.accumulate(np.where(~match, idx, -1))
        run = np.where(match, idx - last_false, 0)
        span = u + run
        in_repeat = (span >= 2 * u) & (span >= MIN_REPEAT_SPAN) & (run > 0)
        if not in_repeat.any():
            continue
        # positions [pos-span+1, pos] are non-anchor for each repeat pos;
        # equivalently mark a run [start, end] for maximal repeats
        rep_idx = np.nonzero(in_repeat)[0]
        starts = rep_idx - span[rep_idx] + 1
        diff = (np.bincount(np.maximum(starts, 0), minlength=L + 1)
                - np.bincount(rep_idx + 1, minlength=L + 1))
        covered = np.cumsum(diff[:L]) > 0
        anchor &= ~covered
    return anchor


def variant_evidence(batch: ReadBatch, ea: rd.ExpandedAlignments,
                     map_level: np.ndarray, ref_codes: np.ndarray,
                     region_begin: int, region_end: int,
                     use_native: bool = True):
    """(variant_count, depth) per position
    (ActiveRegionReadBuffer insert* weights; every addVariantCount
    call also increments the position depth, hh:263-268).

    Evidence: mismatches +1 (char comparison — N read bases against a
    called reference base DO count); non-edge insertions +4 at pos-1
    and pos; non-edge deletions +4 at each deleted base and pos-1;
    soft clips +4 at the clip position (insertSoftClipSegment)."""
    if use_native and batch.n:
        from ..io.native import ar_evidence_native
        res = ar_evidence_native(batch, map_level, ref_codes,
                                 region_begin, region_end)
        if res is not None:
            return res
    L = region_end - region_begin
    counts = np.zeros(L, dtype=np.int64)
    depth = np.zeros(L, dtype=np.int64)
    usable = np.isin(map_level, (rd.MapLevel.TIER1, rd.MapLevel.TIER2))

    msel = usable[ea.match_read] & (ea.match_refpos >= region_begin) & \
        (ea.match_refpos < region_end)
    mp = ea.match_refpos[msel] - region_begin
    np.add.at(depth, mp, 1)
    base = np.minimum(
        batch.seq[batch.seq_off[ea.match_read[msel]] + ea.match_readoff[msel]],
        4)
    refb = np.minimum(ref_codes[mp], 4)
    mm = base != refb
    np.add.at(counts, mp[mm], MISMATCH_WEIGHT)

    # insertions: +4 (and +1 depth) at pos-1 and pos
    isel = usable[ea.ins_read] & ~ea.ins_is_edge
    for off in (-1, 0):
        p = ea.ins_refpos[isel] + off - region_begin
        ok = (p >= 0) & (p < L)
        np.add.at(counts, p[ok], INDEL_WEIGHT)
        np.add.at(depth, p[ok], 1)
    # deletions: +4 (and +1 depth) at each deleted base and pos-1
    dsel = usable[ea.del_read] & ~ea.del_is_edge
    p = ea.del_refpos[dsel] - region_begin
    ok = (p >= 0) & (p < L)
    np.add.at(counts, p[ok], INDEL_WEIGHT)
    np.add.at(depth, p[ok], 1)
    desel = usable[ea.devent_read] & ~ea.devent_is_edge
    p = ea.devent_refpos[desel] - 1 - region_begin
    ok = (p >= 0) & (p < L)
    np.add.at(counts, p[ok], INDEL_WEIGHT)
    np.add.at(depth, p[ok], 1)

    # soft clips: +4 (and +1 depth) at ref_head_pos-1 (leading) /
    # ref_head_pos (trailing)
    first = batch.cig_off[:-1]
    last = batch.cig_off[1:] - 1
    has = np.diff(batch.cig_off) > 0
    rows = np.nonzero(has & usable)[0]
    lead = rows[batch.cig_ops[first[rows]] == cg.SOFT_CLIP]
    trail = rows[batch.cig_ops[last[rows]] == cg.SOFT_CLIP]
    for sel, off_arr in ((lead, batch.pos[lead] - 1),
                        (trail, ea.ref_end[trail])):
        p = off_arr - region_begin
        ok = (p >= 0) & (p < L)
        np.add.at(counts, p[ok], INDEL_WEIGHT)
        np.add.at(depth, p[ok], 1)
    return counts, depth


@dataclass
class ActiveRegion:
    begin: int
    end: int  # half-open


def find_active_regions(counts, depth, anchors, ref_codes,
                        region_begin: int,
                        use_native: bool = True) -> list[ActiveRegion]:
    """The region state machine over sparse candidate/anchor positions
    (SampleActiveRegionDetector::updateEndPosition exact port; the
    native path in native/activeregion.cpp is the same machine)."""
    if use_native:
        from ..io.native import find_active_regions_native
        res = find_active_regions_native(counts, depth, anchors,
                                         ref_codes, region_begin)
        if res is not None:
            return [ActiveRegion(int(b), int(e))
                    for b, e in zip(res[0], res[1])]
    L = len(counts)
    is_cand = (ref_codes[:L] != 4) & (
        ((counts >= MIN_NUM_VARIANTS_PER_POSITION)
         & (counts >= MIN_ALT_FRACTION * depth))
        | (counts >= MIN_ALT_FRACTION_LOW_DEPTH * np.maximum(depth, 1)))
    # zero-depth positions can't open a region (handled in loop)
    is_anchor = anchors[:L] & ~is_cand

    regions: list[ActiveRegion] = []
    start_pos = region_begin
    prev_anchor = region_begin
    anchor_after_prev_variant = region_begin
    prev_variant_pos = region_begin - 10_000
    num_variants = 0

    interesting = np.nonzero(is_cand | is_anchor)[0]
    for i in interesting:
        pos = region_begin + int(i)
        cand = bool(is_cand[i])
        if cand and depth[i] == 0 and num_variants == 0:
            cand = False
            if not is_anchor[i]:
                continue
        anchor = bool(is_anchor[i]) and not cand
        dist = pos - prev_variant_pos
        if dist > MAX_DISTANCE_BETWEEN_TWO_VARIANTS and anchor_after_prev_variant is not None:
            if num_variants >= MIN_NUM_VARIANTS_PER_REGION:
                regions.append(ActiveRegion(start_pos, anchor_after_prev_variant + 1))
            num_variants = 0
        if anchor:
            if num_variants == 0:
                start_pos = pos
            if anchor_after_prev_variant is None:
                anchor_after_prev_variant = pos
            prev_anchor = pos
        if cand:
            if num_variants == 0:
                start_pos = prev_anchor
            num_variants += 1
            prev_variant_pos = pos
            anchor_after_prev_variant = None
    if num_variants >= MIN_NUM_VARIANTS_PER_REGION:
        end = anchor_after_prev_variant if anchor_after_prev_variant is not None \
            else region_begin + L - 1
        regions.append(ActiveRegion(start_pos, end + 1))
    return regions


@dataclass
class DiscoveredVariants:
    """Primitive variants discovered from selected haplotypes."""
    indels: list[tuple[IndelKey, int]] = field(default_factory=list)  # (key, hap_id)
    snvs: list[tuple[int, int, int]] = field(default_factory=list)    # (pos, base, hap_id)


def _region_scan_ctx(batch: ReadBatch, ea: rd.ExpandedAlignments,
                     map_level: np.ndarray):
    """Cached (usable mask, max aligned span): regions are processed in
    the hundreds per batch, so the O(reads) mask and span reduction must
    not be recomputed per region."""
    ctx = getattr(ea, "_region_scan_ctx", None)
    if ctx is None or ctx[0] is not map_level:
        usable = np.isin(map_level, (rd.MapLevel.TIER1, rd.MapLevel.TIER2))
        max_span = int((ea.ref_end - batch.pos).max()) if batch.n else 0
        ctx = (map_level, usable, max(max_span, 1))
        ea._region_scan_ctx = ctx
    return ctx[1], ctx[2]


def read_segments_for_region(batch: ReadBatch, ea: rd.ExpandedAlignments,
                             map_level: np.ndarray, begin: int, end: int):
    """Read segments fully covering [begin, end) in haplotype space,
    as raw base-code bytes (base-code byte order == ACGT lexicographic
    order, so downstream tie-breaks match string semantics).

    Uses the aligned per-base table: the segment runs from the read
    offset aligned at begin to the offset aligned at end-1 (inclusive),
    naturally including inserted bases between them.
    """
    usable, max_span = _region_scan_ctx(batch, ea, map_level)
    # batch.pos ascends and ref_begin >= pos, ref_end <= pos + max_span:
    # only reads with pos in (begin - max_span, begin] can span the
    # region, so the O(reads) comparisons run on that window only.
    lo = int(np.searchsorted(batch.pos, begin - max_span, side="left"))
    hi = int(np.searchsorted(batch.pos, begin, side="right"))
    w = slice(lo, hi)
    spanning = lo + np.nonzero(usable[w] & (ea.ref_begin[w] <= begin) &
                               (ea.ref_end[w] >= end))[0]
    # match rows are contiguous and ascending in read index (the
    # expansion emits reads in order), so each read's rows are a slice.
    # The probe array must match the table dtype exactly or numpy casts
    # the whole multi-million-row table per call.
    probe = spanning.astype(ea.match_read.dtype, copy=False)
    row_lo = np.searchsorted(ea.match_read, probe, side="left")
    row_hi = np.searchsorted(ea.match_read, probe, side="right")
    if (len(spanning) and ea.match_refpos.dtype == np.int32
            and ea.match_readoff.dtype == np.int32
            and ea.match_refpos.flags.c_contiguous
            and ea.match_readoff.flags.c_contiguous
            and batch.seq.flags.c_contiguous
            and batch.seq_off.dtype == np.int64):
        from ..io.native import region_segments_native
        res = region_segments_native(
            ea.match_refpos, ea.match_readoff, row_lo, row_hi, spanning,
            batch.seq, batch.seq_off, begin, end)
        if res is not None:
            o0s, o1s, valid = res
            segs = [(int(r),
                     batch.seq[batch.seq_off[r] + o0:
                               batch.seq_off[r] + o1 + 1].tobytes())
                    for r, o0, o1 in zip(spanning[valid], o0s[valid],
                                         o1s[valid])]
            return segs, len(spanning)
    segs = []
    for r, lo, hi in zip(spanning, row_lo, row_hi):
        rp = ea.match_refpos[lo:hi]
        ro = ea.match_readoff[lo:hi]
        m0 = rp == begin
        m1 = rp == end - 1
        if not (m0.any() and m1.any()):
            continue  # deletion covers a boundary base
        o0 = int(ro[m0][0])
        o1 = int(ro[m1][-1])
        seq = batch.get_seq(r)[o0:o1 + 1]
        if (seq >= 4).any():
            continue
        segs.append((int(r), seq.tobytes()))
    return segs, len(spanning)


def decompose_haplotype(hap: bytes, ref_seg: np.ndarray, region_begin: int,
                        hap_id: int, out: DiscoveredVariants) -> None:
    """Align one haplotype (base-code bytes) to the region's reference
    and emit primitive variants
    (ActiveRegionProcessor::processSelectedHaplotypes)."""
    q = np.frombuffer(hap, dtype=np.uint8)
    score, ops, lens = align_global(q, ref_seg)
    del score
    rpos = region_begin
    qpos = 0
    n_mismatch = 0
    for o, ln in zip(ops, lens):
        if o == cg.MATCH:
            for k in range(ln):
                if q[qpos + k] != ref_seg[rpos + k - region_begin]:
                    out.snvs.append((rpos + k, int(q[qpos + k]), hap_id))
                    n_mismatch += 1
            rpos += ln
            qpos += ln
        elif o == cg.INSERT:
            out.indels.append(
                (IndelKey(rpos, 0, decode_bases(q[qpos:qpos + ln])),
                 hap_id))
            qpos += ln
        elif o == cg.DELETE:
            out.indels.append((IndelKey(rpos, int(ln), ""), hap_id))
            rpos += ln
    del n_mismatch


def process_active_region(
    batch: ReadBatch,
    ea: rd.ExpandedAlignments,
    map_level: np.ndarray,
    ref_codes: np.ndarray,
    ref_offset: int,
    region: ActiveRegion,
    ploidy: int = 2,
) -> DiscoveredVariants:
    """Haplotype generation by read counting + haplotype->ref
    decomposition. (Assembly fallback for low-spanning regions is
    handled by the caller via pipeline/assembly.py.)"""
    out = DiscoveredVariants()
    segs, n_spanning = read_segments_for_region(
        batch, ea, map_level, region.begin, region.end)
    ref_seg = ref_codes[region.begin - ref_offset:region.end - ref_offset]
    ref_bytes = np.ascontiguousarray(ref_seg, dtype=np.uint8).tobytes()

    ranked: list[tuple[int, bytes]]
    if segs and len(segs) >= MIN_FRAC_READS_COVERING_REGION * n_spanning:
        # generateHaplotypesWithCounting
        counts: dict[bytes, int] = {}
        for _, s in segs:
            counts[s] = counts.get(s, 0) + 1
        ranked = sorted(((c, h) for h, c in counts.items()
                         if h != ref_bytes),
                        key=lambda x: (-x[0], x[1]))
    elif region.end - region.begin <= MAX_REF_SPAN_FOR_ASSEMBLY:
        # generateHaplotypesWithAssembly: contigs from all overlapping
        # read subsequences
        from .assembly import assemble_region
        usable, max_span = _region_scan_ctx(batch, ea, map_level)
        lo = int(np.searchsorted(batch.pos, region.begin - max_span, "left"))
        hi = int(np.searchsorted(batch.pos, region.end, "right"))
        w = slice(lo, hi)
        overl = lo + np.nonzero(usable[w] & (ea.ref_begin[w] < region.end) &
                                (ea.ref_end[w] > region.begin))[0]
        read_seqs = []
        for r in overl[:1000]:
            s = batch.get_seq(r)
            if (s < 4).all():
                read_seqs.append(decode_bases(s))
        contigs = assemble_region(read_seqs)
        ranked = [(c, h) for h, c in
                  ((encode_bases(contig).tobytes(), cnt)
                   for contig, cnt in contigs)
                  if h != ref_bytes]
        # assembled contigs extend past the region; trim by alignment is
        # handled naturally in decompose (global alignment to region ref
        # only works for region-sized haplotypes), so keep contigs whose
        # length is close to the region span
        span = region.end - region.begin
        ranked = [(c, h) for c, h in ranked if abs(len(h) - span) <= 60]
    else:
        return out

    hap_id = 0
    for c, h in ranked[:ploidy]:
        if c < MIN_HAPLOTYPE_COUNT:
            continue
        hap_id += 1
        decompose_haplotype(h, ref_seg, region.begin, hap_id, out)
    return out
