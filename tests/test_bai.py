"""BAI-indexed region reads (io/bai.py).

Reference analog: htslib bam index queries used by
htsapi/bam_streamer::resetRegion — the per-segment process opens only
its genome span. Verifies that indexed reads return exactly the reads
whose alignment span overlaps the request, identical to filtering a
whole-file decode, and that fan-out span planning (merge_group_spans)
produces minimal halo'd footprints.
"""
import os

import numpy as np
import pytest

from strelka_tpu.io.bai import BaiIndex, read_bam_regions
from strelka_tpu.io.bam import read_bam
from strelka_tpu.parallel import runner as rn

DATA = os.path.join(os.path.dirname(__file__), "data", "cram")
BAM = os.path.join(DATA, "synth.bam")

_FIELDS = ("tid", "pos", "mapq", "flag", "mate_tid", "mate_pos", "tlen",
           "seq", "qual", "seq_off", "cig_ops", "cig_lens", "cig_off")


def _expected(hdr, full, regions):
    ends = full.ref_end_positions()
    keep = np.zeros(full.n, bool)
    for chrom, beg, end in regions:
        if chrom not in hdr.ref_names:
            continue
        tid = hdr.ref_names.index(chrom)
        keep |= (full.tid == tid) & (full.pos < end) & (ends > beg)
    return full.select(keep)


@pytest.mark.parametrize("regions", [
    [("c1", 2000, 3000)],
    [("c1", 0, 100)],
    [("c1", 500, 900), ("c1", 5000, 6000)],
    [("c1", 0, 8000)],
    [("c1", 7990, 8000)],          # tail
    [("cX", 0, 100)],              # unknown chrom -> empty
])
def test_region_read_matches_filtered_full_read(regions):
    hdr, full = read_bam(BAM)
    h2, sub = read_bam_regions(BAM, regions)
    exp = _expected(hdr, full, regions)
    assert sub.n == exp.n
    assert sub.names == exp.names
    for f in _FIELDS:
        assert np.array_equal(np.asarray(getattr(exp, f)),
                              np.asarray(getattr(sub, f))), f


def test_read_overlapping_region_by_span_only():
    # a read STARTING before the region but spanning into it must be
    # returned (deletion/splice spans count via the CIGAR ref span)
    hdr, full = read_bam(BAM)
    ends = full.ref_end_positions()
    # pick a position strictly inside some read's span
    i = int(np.argmax(ends - full.pos))  # longest span (spliced read)
    mid = int(full.pos[i]) + int(ends[i] - full.pos[i]) // 2
    _, sub = read_bam_regions(BAM, [("c1", mid, mid + 1)])
    assert full.names[i] in sub.names


def test_missing_index_raises():
    import shutil
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "x.bam")
        shutil.copy(BAM, p)
        with pytest.raises(FileNotFoundError):
            read_bam_regions(p, [("c1", 0, 100)])


def test_bai_parse_smoke():
    idx = BaiIndex(BAM + ".bai")
    assert len(idx.bins) == 1
    chunks = idx.chunks_for(0, 0, 8000)
    assert chunks and all(b > a for a, b in chunks)
    assert idx.chunks_for(5, 0, 100) == []


def test_merge_group_spans():
    segs = [rn.GenomeSegment("c1", 0, 1000), rn.GenomeSegment("c1", 1000, 2000),
            rn.GenomeSegment("c1", 5000, 6000), rn.GenomeSegment("c2", 0, 500)]
    spans = rn.merge_group_spans([[segs[0], segs[1]], [segs[2]], [segs[3]]],
                                 halo=100, chrom_lengths={"c1": 10000,
                                                          "c2": 300})
    spans = sorted(spans)
    # adjacent halo'd segments merge; chrom end clamps
    assert spans == [("c1", 0, 2100), ("c1", 4900, 6100), ("c2", 0, 300)]
