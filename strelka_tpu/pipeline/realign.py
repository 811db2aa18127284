"""Read realignment scoring: per-read allele likelihoods at indel loci.

TPU-native replacement for the reference's realignment machinery
(reference: starling_read_align.cpp realignAndScoreRead:2026,
candidate_alignment_search:859, scoreCandidateAlignments:1536,
starling_read_align_score_indels.cpp ReadPathScores extraction).

Instead of per-read recursive enumeration of indel on/off toggles,
each candidate-indel locus gets a haplotype set {ref, ref+indel...};
overlapping reads are padded into a tile and scored gaplessly against
every haplotype over an offset window with the batched correlation op
(ops/readlik.py). The per-read max over offsets reproduces the
reference's max-over-candidate-alignments semantics with a superset
path space.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..io.bam import FLAG_REVERSE, ReadBatch
from ..ops import readlik
from . import reads as rd
from .candidates import IndelKey


@dataclass
class LocusReadScores:
    """Per-read allele log-likelihoods at one locus (the batch analog
    of the reference's per-read ReadPathScores map, IndelData.hh:64)."""
    read_rows: np.ndarray      # [R] row index into source batch
    allele_lhoods: np.ndarray  # [R, A] col 0 = ref
    read_len: np.ndarray       # [R]
    n_nonambig: np.ndarray     # [R]
    is_fwd: np.ndarray         # [R]


def apply_indel_to_window(ref_window: np.ndarray, window_begin: int,
                          key: IndelKey, encode) -> np.ndarray:
    """Haplotype codes: window with one indel applied."""
    p = key.pos - window_begin
    left = ref_window[:p]
    right = ref_window[p + key.delete_length:]
    ins = encode(key.insert_seq) if key.insert_seq else np.empty(0, np.uint8)
    return np.concatenate([left, ins, right])


def select_overlapping_reads(ea: rd.ExpandedAlignments, map_level: np.ndarray,
                             key_pos: int, right_pos: int,
                             tiers=(rd.MapLevel.TIER1,)) -> np.ndarray:
    """Reads whose aligned span brackets the indel (these are the reads
    that receive ReadPathScores in the reference)."""
    span = (ea.ref_begin < key_pos) & (ea.ref_end > right_pos)
    # insertions at pos: read must span the insertion point
    point = (ea.ref_begin < key_pos) & (ea.ref_end >= key_pos + 1)
    ok = np.where(right_pos > key_pos, span, point)
    ok &= np.isin(map_level, tiers)
    return np.nonzero(ok)[0]


def score_locus(
    batch: ReadBatch,
    ea: rd.ExpandedAlignments,
    map_level: np.ndarray,
    ref_codes: np.ndarray,
    ref_offset: int,
    alt_keys: list[IndelKey],
    window_flank: int = 70,
    max_reads: int = 512,
    tiers=(rd.MapLevel.TIER1,),
) -> LocusReadScores | None:
    """Score all spanning reads against {ref} + alt haplotypes."""
    from ..io.fasta import encode_bases

    key0 = alt_keys[0]
    locus_begin = min(k.pos for k in alt_keys)
    locus_end = max(k.right_pos for k in alt_keys)
    rows = select_overlapping_reads(ea, map_level, key0.pos, key0.right_pos,
                                    tiers=tiers)
    if len(rows) == 0:
        return None
    if len(rows) > max_reads:
        rows = rows[:max_reads]

    read_lens = np.diff(batch.seq_off)[rows].astype(np.int64)
    L = int(read_lens.max())
    R = len(rows)

    # window must cover any read placement: reads start at ref_begin -
    # (leading clip); give window_flank + max read len margin
    win_begin = locus_begin - (L + window_flank)
    win_end = locus_end + (L + window_flank)
    win_begin = max(win_begin, ref_offset)
    win_end = min(win_end, ref_offset + len(ref_codes))
    ref_window = ref_codes[win_begin - ref_offset:win_end - ref_offset]

    # haplotype set: ref + each alt
    haps = [ref_window]
    for k in alt_keys:
        haps.append(apply_indel_to_window(ref_window, win_begin, k, encode_bases))
    Lh = max(len(h) for h in haps)
    hap_codes = np.full((len(haps), Lh), 4, dtype=np.uint8)
    for i, h in enumerate(haps):
        hap_codes[i, :len(h)] = h

    # read tile
    seqs = np.full((R, L), 4, dtype=np.uint8)
    quals = np.zeros((R, L), dtype=np.int32)
    mask = np.zeros((R, L), dtype=bool)
    for i, r in enumerate(rows):
        s = batch.get_seq(r)
        q = batch.get_qual(r)
        seqs[i, :len(s)] = s
        quals[i, :len(q)] = q
        mask[i, :len(s)] = True
    tile = readlik.build_read_tile(seqs, quals, mask)
    hap_onehot = readlik.build_hap_onehot(hap_codes)

    lhoods, _best_off = readlik.score_reads_vs_haps(tile, hap_onehot)
    lhoods = np.asarray(lhoods, dtype=np.float64)

    return LocusReadScores(
        read_rows=rows,
        allele_lhoods=lhoods,
        read_len=read_lens,
        n_nonambig=np.asarray(tile.n_valid),
        is_fwd=(batch.flag[rows] & FLAG_REVERSE) == 0,
    )
