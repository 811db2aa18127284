"""IO layer tests: FASTA/BAM/BGZF against the reference demo data.

Mirrors the reference's htsapi/test/bam_streamer_test.cpp approach of
exercising readers on tiny real files.
"""
import os

import numpy as np
import pytest

from strelka_tpu.io.bam import FLAG_UNMAPPED, read_bam
from strelka_tpu.io.bgzf import BgzfWriter, decompress_file
from strelka_tpu.io.fasta import FastaReference, decode_bases, encode_bases
from strelka_tpu.utils import cigar


def test_fasta_demo(demo_fasta):
    ref = FastaReference(demo_fasta)
    assert "demo20" in ref.contig_names
    n = ref.contig_length("demo20")
    assert n > 4000
    seq = ref.load_contig("demo20")
    assert len(seq) == n
    assert set(np.unique(seq)).issubset({0, 1, 2, 3, 4})
    # spot check round trip through text
    s = decode_bases(seq[:50])
    assert np.array_equal(encode_bases(s), seq[:50])
    # out-of-bounds padded with N
    tail = ref.fetch("demo20", n - 5, n + 5)
    assert len(tail) == 10
    assert np.all(tail[5:] == 4)


def test_bam_demo(demo_bams):
    for path in demo_bams:
        header, batch = read_bam(path)
        assert header.ref_names == ["demo20"]
        assert batch.n > 10
        # all mapped reads have valid positions within contig bounds
        mapped = (batch.flag & FLAG_UNMAPPED) == 0
        assert np.all(batch.pos[mapped] >= 0)
        assert np.all(batch.pos[mapped] < header.ref_lengths[0])
        # seq/qual/cigar ragged arrays are consistent
        assert batch.seq_off[-1] == len(batch.seq)
        assert batch.cig_off[-1] == len(batch.cig_ops)
        for i in range(min(batch.n, 20)):
            ops, lens = batch.get_cigar(i)
            if mapped[i] and len(ops):
                assert cigar.read_span(ops, lens) == batch.read_len(i)


def test_bam_select(demo_bams):
    _, batch = read_bam(demo_bams[0])
    sub = batch.select(np.arange(0, batch.n, 2))
    assert sub.n == (batch.n + 1) // 2
    assert np.array_equal(sub.get_seq(1), batch.get_seq(2))
    assert np.array_equal(sub.get_qual(3), batch.get_qual(6))


def test_bgzf_roundtrip(tmp_path):
    payload = os.urandom(200_000) + b"tail"
    p = tmp_path / "x.bgz"
    with BgzfWriter(str(p)) as w:
        w.write(payload)
    assert decompress_file(str(p)) == payload
    # gzip-compatible
    import gzip
    with gzip.open(p, "rb") as f:
        assert f.read() == payload


def test_cigar_algebra():
    ops, lens = cigar.cigar_from_string("3S10M2I5M3D7M")
    assert cigar.cigar_to_string(ops, lens) == "3S10M2I5M3D7M"
    assert cigar.read_span(ops, lens) == 3 + 10 + 2 + 5 + 7
    assert cigar.ref_span(ops, lens) == 10 + 5 + 3 + 7
    ref_pos, op = cigar.expand_to_per_base(ops, lens, 100)
    assert len(ref_pos) == 27
    # soft-clip bases point at first aligned base
    assert ref_pos[0] == 100 and op[0] == cigar.SOFT_CLIP
    assert ref_pos[3] == 100 and op[3] == cigar.MATCH
    # insertion bases hold next ref pos
    assert ref_pos[13] == 110 and op[13] == cigar.INSERT
    # after deletion the ref pos jumps by 3
    assert ref_pos[20] == 118 and op[20] == cigar.MATCH


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


def test_bam_reader_clean_errors_on_corrupt_input(tmp_path):
    """Truncated/corrupted BAMs raise ValueError (never raw struct
    errors or native crashes)."""
    import numpy as np

    from strelka_tpu.io.bam import read_bam

    data = open("/root/reference/src/demo/data/NA12891_demo20.bam",
                "rb").read()
    rng = np.random.default_rng(0)
    for trial in range(24):
        buf = bytearray(data)
        kind = trial % 3
        if kind == 0:
            buf = bytes(buf[:rng.integers(1, len(buf))])
        elif kind == 1:
            for _ in range(int(rng.integers(1, 50))):
                buf[rng.integers(0, len(buf))] = rng.integers(0, 256)
            buf = bytes(buf)
        else:
            for _ in range(int(rng.integers(1, 8))):
                buf[rng.integers(0, 2000)] = rng.integers(0, 256)
            buf = bytes(buf)
        p = tmp_path / f"fuzz{trial}.bam"
        p.write_bytes(buf)
        try:
            hdr, b = read_bam(str(p))
            _ = b.n  # parsed fine (corruption may land in ignored bytes)
        except (ValueError, EOFError, OSError):
            pass  # the accepted clean-failure surface
