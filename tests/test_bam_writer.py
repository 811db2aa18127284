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


def test_native_encoder_matches_python_oracle(tmp_path):
    """native/bamencoder.cpp serializes records byte-identically to the
    per-record Python path."""
    import numpy as np

    from strelka_tpu.io.bam import BamHeader, ReadBatch
    from strelka_tpu.io.bam_writer import (_encode_records_native,
                                           _record_bytes)

    rng = np.random.default_rng(5)
    n = 300
    rls = rng.integers(30, 150, n)
    seq_off = np.concatenate([[0], np.cumsum(rls)]).astype(np.int64)
    seq = rng.integers(0, 5, int(seq_off[-1])).astype(np.uint8)
    qual = rng.integers(2, 41, int(seq_off[-1])).astype(np.uint8)
    # mixed cigars: ~half simple M, rest M/S or M/I/M
    ops_l, lens_l, noff = [], [], [0]
    for i in range(n):
        rl = int(rls[i])
        r = rng.random()
        if r < 0.5:
            ops_l.append([0]); lens_l.append([rl])
        elif r < 0.75 and rl > 20:
            ops_l.append([4, 0]); lens_l.append([10, rl - 10])
        else:
            ops_l.append([0, 1, 0]); lens_l.append([rl // 2, 2,
                                                    rl - rl // 2 - 2])
        noff.append(noff[-1] + len(ops_l[-1]))
    batch = ReadBatch(
        n=n, names=[f"read_{i}" for i in range(n)],
        tid=rng.integers(0, 2, n).astype(np.int32),
        pos=np.sort(rng.integers(0, 100000, n)).astype(np.int64),
        mapq=rng.integers(0, 61, n).astype(np.uint8),
        flag=rng.integers(0, 4096, n).astype(np.uint16),
        mate_tid=np.full(n, -1, np.int32),
        mate_pos=np.full(n, -1, np.int64),
        tlen=rng.integers(-500, 500, n).astype(np.int64),
        seq=seq, qual=qual, seq_off=seq_off,
        cig_ops=np.concatenate(ops_l).astype(np.int8),
        cig_lens=np.concatenate(lens_l).astype(np.int32),
        cig_off=np.asarray(noff, np.int64))
    order = np.lexsort((batch.pos, batch.tid))
    blob = _encode_records_native(batch, order)
    assert blob is not None
    oracle = b"".join(_record_bytes(batch, int(i)) for i in order)
    assert blob == oracle
