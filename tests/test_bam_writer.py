"""BAM writer round trip: write demo reads, re-read, compare."""
import numpy as np
import pytest

from strelka_tpu.io.bam import read_bam
from strelka_tpu.io.bam_writer import write_bam


def test_bam_roundtrip(tmp_path, demo_bams):
    hdr, batch = read_bam(demo_bams[0])
    out = str(tmp_path / "rt.bam")
    write_bam(out, hdr, batch, sort_by_pos=False)
    hdr2, batch2 = read_bam(out)
    assert hdr2.ref_names == hdr.ref_names
    assert hdr2.ref_lengths == hdr.ref_lengths
    assert batch2.n == batch.n
    assert batch2.names == batch.names
    for fld in ("tid", "pos", "mapq", "flag", "mate_tid", "mate_pos",
                "tlen", "seq", "qual", "cig_ops", "cig_lens"):
        assert np.array_equal(getattr(batch2, fld), getattr(batch, fld)), fld


def test_bam_writer_sorts(tmp_path, demo_bams):
    hdr, batch = read_bam(demo_bams[1])
    out = str(tmp_path / "s.bam")
    write_bam(out, hdr, batch, sort_by_pos=True)
    _, batch2 = read_bam(out)
    pos = batch2.pos[batch2.tid >= 0]
    assert np.all(np.diff(pos) >= 0)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
