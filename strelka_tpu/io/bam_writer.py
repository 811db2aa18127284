"""BAM writing (realigned-BAM output).

Reference: htsapi/bam_dumper.hh — writes the realigned reads back out
as BAM for inspection (--realigned-bam workflow option). Serializes a
ReadBatch (optionally with updated positions/CIGARs) into a
BGZF-compressed BAM with proper header and EOF.
"""
from __future__ import annotations

import struct

import numpy as np

from .bam import BamHeader, ReadBatch
from .bgzf import BgzfWriter

_CODE_TO_NIB = np.array([1, 2, 4, 8, 15], dtype=np.uint8)  # A C G T N


def write_bam(path: str, header: BamHeader, batch: ReadBatch,
              sort_by_pos: bool = True) -> None:
    order = (np.lexsort((batch.pos, batch.tid)) if sort_by_pos
             else np.arange(batch.n))
    with BgzfWriter(path) as w:
        text = header.text or ""
        if "@HD" not in text:
            text = "@HD\tVN:1.6\tSO:coordinate\n" + text
        tb = text.encode()
        w.write(b"BAM\x01" + struct.pack("<i", len(tb)) + tb)
        w.write(struct.pack("<i", len(header.ref_names)))
        for name, length in zip(header.ref_names, header.ref_lengths):
            nb = name.encode() + b"\x00"
            w.write(struct.pack("<i", len(nb)) + nb +
                    struct.pack("<i", length))
        for i in order:
            w.write(_record_bytes(batch, int(i)))


def _record_bytes(b: ReadBatch, i: int) -> bytes:
    name = b.names[i].encode() + b"\x00"
    ops, lens = b.get_cigar(i)
    seq = b.get_seq(i)
    qual = b.get_qual(i)
    l_seq = len(seq)
    cig = (lens.astype(np.uint32) << 4) | ops.astype(np.uint32)
    nib = _CODE_TO_NIB[np.minimum(seq, 4)]
    packed = np.zeros((l_seq + 1) // 2, dtype=np.uint8)
    packed |= nib[0::2] << 4
    if l_seq > 1:
        packed[:len(nib[1::2])] |= nib[1::2]
    # bin: use reg2bin over the alignment span
    from .tabix import reg2bin
    from ..utils import cigar as cg
    span = cg.ref_span(ops, lens) if len(ops) else 1
    pos = int(b.pos[i])
    bin_ = reg2bin(max(pos, 0), max(pos + max(span, 1), 1))
    body = struct.pack(
        "<iiBBHHHiiii",
        int(b.tid[i]), pos, len(name), int(b.mapq[i]), bin_,
        len(ops), int(b.flag[i]), l_seq,
        int(b.mate_tid[i]), int(b.mate_pos[i]), int(b.tlen[i]))
    payload = (body + name + cig.astype("<u4").tobytes()
               + packed.tobytes() + qual.tobytes())
    return struct.pack("<i", len(payload)) + payload
