"""Dense pileup tile construction from expanded alignments.

TPU-native replacement for the reference's per-position basecall
buffers (reference: blt_common/snp_pos_info.hh pos_basecall_buffer,
starling_pos_processor_base.cpp pileup_read_segment:1129-1424, and
PileupCleaner.hh). Instead of streaming per-base inserts into mutable
ring buffers, a whole region's basecalls are scattered into padded
[positions, depth] tensors in one vectorized pass; "pileup cleaning"
becomes a mask.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..io import bam as bamio
from ..utils.qscore import error_prob_to_qphred, qphred_to_error_prob
from . import reads as rd


def mapq_adjusted_qscore(qual: np.ndarray, mapq: np.ndarray) -> np.ndarray:
    """Basecall quality blended with mapping quality.

    reference: blt_util/qscore.hh phred_to_mapped_error_prob
    (e = (1-me)*be + me*0.75) applied when mapq<=80 with mapq floored
    at 5 (starling_pos_processor_base.cpp:1179-1182).
    """
    adj_mapq = np.maximum(mapq, 5)
    be = qphred_to_error_prob(qual)
    me = qphred_to_error_prob(adj_mapq)
    mapped = error_prob_to_qphred((1.0 - me) * be + me * 0.75)
    return np.where(adj_mapq <= 80, mapped, qual).astype(np.int32)


@dataclass
class PileupRegion:
    """Dense pileup over [begin, end) with per-call and per-pos data.

    Depth-axis layout is insertion-ordered per position; `used` marks
    tier1-unfiltered calls (the reference's "cleaned pileup").
    """
    begin: int
    end: int
    depth: np.ndarray        # [L] total inserted (tier1 mapped) calls
    base_id: np.ndarray      # [L, D]
    qual: np.ndarray         # [L, D] mapq-adjusted phred
    raw_qual: np.ndarray     # [L, D] original basecall phred
    is_fwd: np.ndarray       # [L, D]
    read_idx: np.ndarray     # [L, D] row in source batch
    read_off: np.ndarray     # [L, D] offset within read
    valid: np.ndarray        # [L, D] lane holds a call
    used: np.ndarray         # [L, D] passes tier1 filters
    tier2_used: np.ndarray   # [L, D] passes tier2 filters
    # per-position counters
    spandel: np.ndarray      # [L] spanning-deletion reads
    submapped: np.ndarray    # [L] submapped reads overlapping
    mapq_n: np.ndarray       # [L] count of mapq observations
    mapq_sumsq: np.ndarray   # [L] sum of squared mapq (for RMS)
    mapq_zero: np.ndarray    # [L] count of mapq==0
    _used_counts: np.ndarray | None = None  # cached [L, 4]
    # [L, D] call has a windowed mismatch besides its own position
    # (mismatch_count_ns > 0, starling_read_util.cpp:211; feeds the
    # dependent-eprob adjustment). None when MMDF was not computed.
    neighbor_mm: np.ndarray | None = None
    # [L] sum of min-distance-from-read-edge over used calls (filled
    # by the native pileup; None -> compute from tiles)
    edge_dist_sum: np.ndarray | None = None

    @property
    def max_depth(self) -> int:
        return self.base_id.shape[1]

    def used_counts(self):
        """[L, 4] used basecall counts per allele (snp_pos_info tallies)."""
        if self._used_counts is not None:
            return self._used_counts
        L, _ = self.base_id.shape
        counts = np.zeros((L, 4), dtype=np.int32)
        li, di = np.nonzero(self.used)
        np.add.at(counts, (li, self.base_id[li, di]), 1)
        self._used_counts = counts
        return counts


def build_pileup_counts(
    batch: bamio.ReadBatch,
    ea: rd.ExpandedAlignments,
    map_level: np.ndarray,
    region_begin: int,
    region_end: int,
    min_qscore: int,
    mm_filter: np.ndarray | None = None,
    mapq_adjust: bool = True,
):
    """Counts-only pileup (no depth axis) for arbitrarily deep data
    (the continuous-VF caller's input; avoids dense [L, D] tiles at
    several-thousand-fold coverage).

    Returns dict with used_counts [L,4], used_fwd_counts [L,4],
    dpf [L], depth [L].
    """
    L = region_end - region_begin
    in_region = (ea.match_refpos >= region_begin) & (ea.match_refpos < region_end)
    usable = (ea.match_readoff >= ea.read_begin[ea.match_read]) & \
             (ea.match_readoff < ea.read_end[ea.match_read])
    lvl = map_level[ea.match_read]
    mapped12 = (lvl == rd.MapLevel.TIER1) | (lvl == rd.MapLevel.TIER2)
    sel = in_region & usable & mapped12
    r = ea.match_read[sel]
    p = (ea.match_refpos[sel] - region_begin).astype(np.int64)
    gidx = batch.seq_off[r] + ea.match_readoff[sel]
    base = batch.seq[gidx].astype(np.int64)
    rawq = batch.qual[gidx].astype(np.int32)
    fwd = (batch.flag[r] & bamio.FLAG_REVERSE) == 0
    filt = (base == 4) | (rawq < min_qscore)
    if mm_filter is not None:
        filt |= mm_filter[gidx]
    used = ~filt & (map_level[r] == rd.MapLevel.TIER1)

    counts = np.zeros((L, 4), np.int64)
    fwd_counts = np.zeros((L, 4), np.int64)
    np.add.at(counts, (p[used], base[used]), 1)
    uf = used & fwd
    np.add.at(fwd_counts, (p[uf], base[uf]), 1)
    depth = np.zeros(L, np.int64)
    np.add.at(depth, p, 1)
    dpf = depth - counts.sum(axis=1)
    return {"used_counts": counts, "used_fwd_counts": fwd_counts,
            "dpf": dpf, "depth": depth}


def build_pileup(
    batch: bamio.ReadBatch,
    ea: rd.ExpandedAlignments,
    map_level: np.ndarray,
    ref_codes: np.ndarray,
    region_begin: int,
    region_end: int,
    min_qscore: int,
    mm_filter: np.ndarray | None = None,
    tier2_mm_filter: np.ndarray | None = None,
    mapq_adjust: bool = True,
    depth_pad: int = 8,
    neighbor_mm: np.ndarray | None = None,
) -> PileupRegion:
    """One vectorized pass: scatter all aligned basecalls into a dense
    [L, D] tile plus per-position counters."""
    L = region_end - region_begin

    in_region = (ea.match_refpos >= region_begin) & (ea.match_refpos < region_end)
    usable = (ea.match_readoff >= ea.read_begin[ea.match_read]) & \
             (ea.match_readoff < ea.read_end[ea.match_read])
    lvl = map_level[ea.match_read]
    mapped12 = (lvl == rd.MapLevel.TIER1) | (lvl == rd.MapLevel.TIER2)

    sel = in_region & usable & mapped12
    r = ea.match_read[sel]
    p = (ea.match_refpos[sel] - region_begin).astype(np.int64)
    o = ea.match_readoff[sel]
    gidx = batch.seq_off[r] + o
    base = batch.seq[gidx].astype(np.int32)
    rawq = batch.qual[gidx].astype(np.int32)
    mapq = batch.mapq[r].astype(np.int32)
    fwd = (batch.flag[r] & bamio.FLAG_REVERSE) == 0

    q = mapq_adjusted_qscore(rawq, mapq) if mapq_adjust else rawq

    # filters (pileup_read_segment:1317-1345)
    is_any = base == 4
    call_filter = is_any | (rawq < min_qscore)
    if mm_filter is not None:
        mmf = mm_filter[gidx]
        call_filter = call_filter | mmf
    # tier2 filter: with no tier2 MMDF configured it mirrors the full
    # tier1 filter incl. MMDF (pileup_read_segment:1325-1335)
    if tier2_mm_filter is not None:
        t2_filter = is_any | (rawq < min_qscore) | tier2_mm_filter[gidx]
    else:
        t2_filter = call_filter

    # depth slot per (position, insertion order): stable sort by pos
    order = np.argsort(p, kind="stable")
    p_s = p[order]
    slot = np.arange(len(p_s)) - np.searchsorted(p_s, p_s, side="left")
    depth = np.zeros(L, dtype=np.int32)
    if len(p_s):
        np.add.at(depth, p_s, 1)
    D = max(int(depth.max()) if L else 0, 1)
    D = ((D + depth_pad - 1) // depth_pad) * depth_pad

    def tile(dtype):
        return np.zeros((L, D), dtype=dtype)  # calloc: cheaper than full

    base_t = tile(np.int32)
    nbmm_t = tile(bool) if neighbor_mm is not None else None
    qual_t = tile(np.int32)
    rawq_t = tile(np.int32)
    fwd_t = tile(bool)
    ridx_t = tile(np.int64)
    roff_t = tile(np.int64)
    valid_t = tile(bool)
    used_t = tile(bool)
    t2used_t = tile(bool)
    ridx_t -= 1  # invalid-lane sentinel

    used_counts = np.zeros((L, 4), dtype=np.int32)
    if len(p_s):
        rows, cols = p_s, slot
        src = order
        base_t[rows, cols] = base[src]
        if nbmm_t is not None:
            nbmm_t[rows, cols] = neighbor_mm[gidx][src]
        qual_t[rows, cols] = q[src]
        rawq_t[rows, cols] = rawq[src]
        fwd_t[rows, cols] = fwd[src]
        ridx_t[rows, cols] = r[src]
        roff_t[rows, cols] = o[src]
        valid_t[rows, cols] = True
        is_t1 = map_level[r[src]] == rd.MapLevel.TIER1
        used_flags = is_t1 & ~call_filter[src]
        used_t[rows, cols] = used_flags
        t2used_t[rows, cols] = ~t2_filter[src]
        # tally used counts at scatter time (avoids a [L, D] nonzero)
        np.add.at(used_counts, (rows[used_flags], base[src][used_flags]), 1)

    # spanning deletions: non-edge deleted ref bases from tier1/2 reads
    spandel = np.zeros(L, dtype=np.int32)
    dsel = (ea.del_refpos >= region_begin) & (ea.del_refpos < region_end) & \
           (~ea.del_is_edge) & np.isin(map_level[ea.del_read],
                                       (rd.MapLevel.TIER1, rd.MapLevel.TIER2))
    np.add.at(spandel, ea.del_refpos[dsel] - region_begin, 1)

    # submapped reads' aligned bases
    submapped = np.zeros(L, dtype=np.int32)
    ssel = in_region & usable & (map_level[ea.match_read] == rd.MapLevel.SUB_MAPPED)
    np.add.at(submapped, ea.match_refpos[ssel] - region_begin, 1)

    # mapq stats over all (incl. submapped) aligned bases
    mapq_n = np.zeros(L, dtype=np.int32)
    mapq_sumsq = np.zeros(L, dtype=np.float64)
    mapq_zero = np.zeros(L, dtype=np.int32)
    asel = in_region & usable & (map_level[ea.match_read] != rd.MapLevel.UNMAPPED)
    ap = ea.match_refpos[asel] - region_begin
    amq = batch.mapq[ea.match_read[asel]].astype(np.float64)
    np.add.at(mapq_n, ap, 1)
    np.add.at(mapq_sumsq, ap, amq * amq)
    np.add.at(mapq_zero, ap, (amq == 0).astype(np.int32))

    return PileupRegion(
        begin=region_begin, end=region_end, depth=depth,
        base_id=base_t, qual=qual_t, raw_qual=rawq_t, is_fwd=fwd_t,
        read_idx=ridx_t, read_off=roff_t, valid=valid_t, used=used_t,
        tier2_used=t2used_t, neighbor_mm=nbmm_t,
        spandel=spandel, submapped=submapped,
        mapq_n=mapq_n, mapq_sumsq=mapq_sumsq, mapq_zero=mapq_zero,
        _used_counts=used_counts,
    )
