"""Application of realignment results to read alignments.

Reference: starling_read_align.cpp finishRealignment:1411 + the
realigned pileup semantics (pileup_read_segment uses rseg.realignment
when set). After locus scoring, reads whose best haplotype carries an
indel get their aligned-portion CIGAR rewritten to include that indel
(soft-clips preserved); the pileup is then rebuilt from the realigned
batch, so bases downstream of insertions/deletions contribute at their
corrected reference positions.
"""
from __future__ import annotations

import numpy as np

from ..io.bam import ReadBatch
from ..utils import cigar as cg
from .candidates import IndelKey


def _aligned_span(batch: ReadBatch, r: int):
    """(clip_left, clip_right, ref_start) for read r's input alignment.
    Returns None when the alignment contains internal indels already
    matching the realignment machinery's span (those reads are left
    unchanged: their input alignment already encodes the indel)."""
    ops, lens = batch.get_cigar(r)
    clip_left = clip_right = 0
    i = 0
    while i < len(ops) and ops[i] in (cg.SOFT_CLIP, cg.HARD_CLIP):
        if ops[i] == cg.SOFT_CLIP:
            clip_left += int(lens[i])
        i += 1
    j = len(ops) - 1
    while j >= 0 and ops[j] in (cg.SOFT_CLIP, cg.HARD_CLIP):
        if ops[j] == cg.SOFT_CLIP:
            clip_right += int(lens[j])
        j -= 1
    interior = ops[i:j + 1]
    has_indel = any(o in (cg.INSERT, cg.DELETE) for o in interior)
    return clip_left, clip_right, has_indel


def realign_read_to_indel(batch: ReadBatch, r: int, key: IndelKey):
    """New (pos, ops, lens) embedding `key` into read r's alignment,
    anchoring the longer flank (the higher-confidence side).

    Returns None if the read doesn't cleanly bracket the indel.
    """
    clip_left, clip_right, has_indel = _aligned_span(batch, r)
    if has_indel:
        return None  # input alignment already carries indels
    read_len = batch.read_len(r)
    aligned_len = read_len - clip_left - clip_right
    if aligned_len <= 0:
        return None
    pos = int(batch.pos[r])

    # choose anchor side by flank length relative to the indel
    left_flank = key.pos - pos
    if left_flank <= 0 or left_flank >= aligned_len:
        return None
    right_flank = aligned_len - left_flank

    ops_out = []
    lens_out = []
    if clip_left:
        ops_out.append(cg.SOFT_CLIP)
        lens_out.append(clip_left)
    if key.is_insertion:
        ins = key.insert_length
        if right_flank <= ins:
            return None
        ops_out += [cg.MATCH, cg.INSERT, cg.MATCH]
        lens_out += [left_flank, ins, right_flank - ins]
        new_pos = pos
        del right_flank
    else:
        ops_out += [cg.MATCH, cg.DELETE, cg.MATCH]
        lens_out += [left_flank, key.delete_length, aligned_len - left_flank]
        new_pos = pos
    if clip_right:
        ops_out.append(cg.SOFT_CLIP)
        lens_out.append(clip_right)
    return new_pos, np.array(ops_out, dtype=np.int8), np.array(lens_out, dtype=np.int32)


def apply_realignments(
    batch: ReadBatch,
    locus_scores: dict,
    loci: list[list[IndelKey]],
    min_lhood_gain: float = 2.0,
) -> tuple[ReadBatch, int]:
    """Rewrite alignments of reads that confidently support an indel
    haplotype (lhood gain over ref >= min_lhood_gain nats) and whose
    input alignment doesn't already encode an indel.

    Returns (new batch, n_realigned). The batch is copied lazily.
    """
    new_cigars: dict[int, tuple[int, np.ndarray, np.ndarray]] = {}
    for li, scores in locus_scores.items():
        keys = loci[li]
        lh = scores.allele_lhoods
        best_alt = np.argmax(lh[:, 1:], axis=1)
        gain = lh[np.arange(len(lh)), 1 + best_alt] - lh[:, 0]
        for i in np.nonzero(gain >= min_lhood_gain)[0]:
            r = int(scores.read_rows[i])
            if r in new_cigars:
                continue
            res = realign_read_to_indel(batch, r, keys[int(best_alt[i])])
            if res is not None:
                new_cigars[r] = res
    if not new_cigars:
        return batch, 0

    # rebuild cigar arrays with updated entries
    op_parts, len_parts, cig_off = [], [], [0]
    pos = batch.pos.copy()
    for r in range(batch.n):
        if r in new_cigars:
            p, o, l = new_cigars[r]
            pos[r] = p
        else:
            o, l = batch.get_cigar(r)
        op_parts.append(o)
        len_parts.append(l)
        cig_off.append(cig_off[-1] + len(o))
    out = ReadBatch(
        n=batch.n, names=batch.names, tid=batch.tid, pos=pos,
        mapq=batch.mapq, flag=batch.flag, mate_tid=batch.mate_tid,
        mate_pos=batch.mate_pos, tlen=batch.tlen, seq=batch.seq,
        qual=batch.qual, seq_off=batch.seq_off,
        cig_ops=np.concatenate(op_parts) if op_parts else batch.cig_ops,
        cig_lens=np.concatenate(len_parts) if len_parts else batch.cig_lens,
        cig_off=np.array(cig_off, dtype=np.int64),
    )
    return out, len(new_cigars)
