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
    """(clip_left, clip_right, has_complex_interior) for read r.

    has_complex_interior is True when the interior of the alignment
    already contains indels or splice skips — such reads are left
    unchanged (their input alignment already encodes structure the
    simple rewrite below would destroy)."""
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
    has_complex = any(o in (cg.INSERT, cg.DELETE, cg.SKIP) for o in interior)
    return clip_left, clip_right, has_complex


def realign_read_to_indel(batch: ReadBatch, r: int, key: IndelKey):
    """New (pos, ops, lens) embedding `key` into read r's alignment.

    The read start stays anchored (left-anchored placement); only
    primitive insertions/deletions are handled. Returns None if the
    read doesn't cleanly bracket the indel, the key is a complex
    (swap) allele, or the input alignment already carries structure.
    """
    if not key.is_primitive:
        return None  # swaps (del+ins) are not rewritten
    clip_left, clip_right, has_complex = _aligned_span(batch, r)
    if has_complex:
        return None
    read_len = batch.read_len(r)
    aligned_len = read_len - clip_left - clip_right
    if aligned_len <= 0:
        return None
    pos = int(batch.pos[r])

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

    # rebuild cigar arrays: untouched runs stay as bulk slices of the
    # original arrays (O(k) segments for k realigned reads)
    pos = batch.pos.copy()
    touched = sorted(new_cigars)
    op_parts, len_parts = [], []
    new_nseg = np.diff(batch.cig_off).copy()
    prev = 0
    for r in touched:
        if r > prev:
            op_parts.append(batch.cig_ops[batch.cig_off[prev]:batch.cig_off[r]])
            len_parts.append(batch.cig_lens[batch.cig_off[prev]:batch.cig_off[r]])
        p, o, l = new_cigars[r]
        pos[r] = p
        op_parts.append(o)
        len_parts.append(l)
        new_nseg[r] = len(o)
        prev = r + 1
    if prev < batch.n:
        op_parts.append(batch.cig_ops[batch.cig_off[prev]:])
        len_parts.append(batch.cig_lens[batch.cig_off[prev]:])
    cig_off = np.concatenate([[0], np.cumsum(new_nseg)]).astype(np.int64)
    out = ReadBatch(
        n=batch.n, names=batch.names, tid=batch.tid, pos=pos,
        mapq=batch.mapq, flag=batch.flag, mate_tid=batch.mate_tid,
        mate_pos=batch.mate_pos, tlen=batch.tlen, seq=batch.seq,
        qual=batch.qual, seq_off=batch.seq_off,
        cig_ops=np.concatenate(op_parts),
        cig_lens=np.concatenate(len_parts),
        cig_off=cig_off,
    )
    return out, len(new_cigars)
