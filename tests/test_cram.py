"""CRAM 3.0 decoder parity tests.

The committed fixtures under tests/data/cram/ are synthetic (generated
by tests' own ReadBatch writer, paired/fixmated and re-encoded with
samtools 1.6 built from the reference's bundled redist tarballs), so the
BAM and CRAM files describe the identical record set. The decoder must
reproduce the BAM decode field for field — including rANS 4x8 blocks,
in-slice mate chains, soft/hard clips, splices, indels and unmapped
reads — for reference-compressed, no-ref and embedded-ref encodings.

Reference analog: htslib cram_decode.c via htsapi/bam_streamer
(bam_streamer_test.cpp runs the same records as BAM and CRAM).
"""
import os

import numpy as np
import pytest

from strelka_tpu.io.bam import read_alignments, read_bam
from strelka_tpu.io.cram import read_cram

DATA = os.path.join(os.path.dirname(__file__), "data", "cram")
REF_TD = "/root/reference/src/c++/lib/htsapi/test/testData"

_FIELDS = ("tid", "pos", "mapq", "flag", "mate_tid", "mate_pos", "tlen",
           "seq", "qual", "seq_off", "cig_ops", "cig_lens", "cig_off")


def _assert_batches_equal(bb, cb):
    assert bb.n == cb.n
    assert bb.names == cb.names
    for f in _FIELDS:
        a, b = np.asarray(getattr(bb, f)), np.asarray(getattr(cb, f))
        assert np.array_equal(a, b), f"field {f} differs"


@pytest.mark.parametrize("cram", ["synth.cram", "synth.noref.cram",
                                  "synth.embed.cram"])
def test_cram_matches_bam(cram):
    bh, bb = read_bam(os.path.join(DATA, "synth.bam"))
    ch, cb = read_cram(os.path.join(DATA, cram),
                       os.path.join(DATA, "synth.fa"))
    assert ch.ref_names == bh.ref_names
    assert ch.ref_lengths == bh.ref_lengths
    _assert_batches_equal(bb, cb)


def test_noref_cram_without_reference():
    # no_ref CRAM stores verbatim bases; must decode with reference=None
    _, bb = read_bam(os.path.join(DATA, "synth.bam"))
    _, cb = read_cram(os.path.join(DATA, "synth.noref.cram"), None)
    _assert_batches_equal(bb, cb)


def test_read_alignments_dispatch():
    _, bb = read_alignments(os.path.join(DATA, "synth.bam"))
    _, cb = read_alignments(os.path.join(DATA, "synth.cram"),
                            os.path.join(DATA, "synth.fa"))
    _assert_batches_equal(bb, cb)


@pytest.mark.skipif(not os.path.exists(REF_TD), reason="no reference checkout")
def test_reference_htsapi_fixture():
    # the reference's own paired BAM/CRAM unit-test fixture
    bh, bb = read_bam(os.path.join(REF_TD, "alignment_test.bam"))
    ch, cb = read_cram(os.path.join(REF_TD, "alignment_test.cram"),
                       os.path.join(REF_TD, "alignment_test.fasta"))
    assert ch.ref_names == bh.ref_names
    _assert_batches_equal(bb, cb)


@pytest.mark.parametrize("regions", [
    [("c1", 2000, 3000)],
    [("c1", 0, 100), ("c1", 7000, 8000)],
    [("c1", 0, 8000)],
    [("cX", 5, 10)],
])
def test_crai_region_read_matches_filtered_full(regions):
    from strelka_tpu.io.cram import read_cram_regions
    hdr, full = read_bam(os.path.join(DATA, "synth.bam"))
    _, sub = read_cram_regions(os.path.join(DATA, "synth.cram"), regions,
                               os.path.join(DATA, "synth.fa"))
    ends = full.ref_end_positions()
    keep = np.zeros(full.n, bool)
    for chrom, beg, end in regions:
        if chrom not in hdr.ref_names:
            continue
        tid = hdr.ref_names.index(chrom)
        keep |= (full.tid == tid) & (full.pos < end) & (ends > beg)
    exp = full.select(keep)
    assert sub.names == exp.names
    for f in _FIELDS:
        assert np.array_equal(np.asarray(getattr(exp, f)),
                              np.asarray(getattr(sub, f))), f


def test_native_slice_decoder_engages(monkeypatch):
    # htslib-style files must decode fully natively: make the Python
    # fallback an error so any silent regression to it fails loudly
    import strelka_tpu.io.cram as cram_mod
    from strelka_tpu.io.native import get_lib
    if get_lib() is None:
        pytest.skip("native library unavailable")

    def boom(*a, **k):
        raise AssertionError("python fallback used for a supported slice")

    monkeypatch.setattr(cram_mod, "_decode_slice", boom)
    _, bb = read_bam(os.path.join(DATA, "synth.bam"))
    _, cb = cram_mod.read_cram(os.path.join(DATA, "synth.cram"),
                               os.path.join(DATA, "synth.fa"))
    _assert_batches_equal(bb, cb)


def test_native_rans_matches_python():
    # the rANS blocks inside the fixture must decode identically through
    # the native codec and the pure-Python one
    import strelka_tpu.io.cram as cram_mod
    from strelka_tpu.io.native import get_lib
    if get_lib() is None:
        pytest.skip("native library unavailable")
    with open(os.path.join(DATA, "synth.cram"), "rb") as f:
        data = f.read()
    # walk blocks, compare every rANS-compressed payload
    br = cram_mod.ByteReader(data)
    br.pos = 26
    n_checked = 0
    while br.pos < len(data):
        length = br.int32()
        br.itf8(); br.itf8(); br.itf8()
        n_records = br.itf8()
        br.ltf8(); br.ltf8()
        n_blocks = br.itf8()
        n_land = br.itf8()
        for _ in range(n_land):
            br.itf8()
        br.uint32()
        if length == 15 and n_records == 0:
            break
        end = br.pos + length
        for _ in range(n_blocks):
            method = br.byte()
            br.byte()
            br.itf8()
            csize = br.itf8()
            br.itf8()
            payload = br.bytes(csize)
            br.uint32()
            if method == 4:
                a = cram_mod._rans_decode_py(payload)
                b = cram_mod._rans_decode_native(payload)
                assert b is not None and a == b
                n_checked += 1
        assert br.pos == end
    assert n_checked > 0


def test_cram_reader_clean_errors_on_corrupt_input(tmp_path):
    """Truncated/corrupted CRAMs raise ValueError (low-level parse and
    codec errors never leak; native decoder never crashes)."""
    import numpy as np

    from strelka_tpu.io.cram import read_cram

    data = open(f"{DATA}/synth.cram", "rb").read()
    rng = np.random.default_rng(1)
    for trial in range(24):
        buf = bytearray(data)
        kind = trial % 3
        if kind == 0:
            buf = bytes(buf[:rng.integers(1, len(buf))])
        elif kind == 1:
            for _ in range(int(rng.integers(1, 40))):
                buf[rng.integers(0, len(buf))] = rng.integers(0, 256)
            buf = bytes(buf)
        else:
            for _ in range(int(rng.integers(1, 8))):
                buf[rng.integers(0, 800)] = rng.integers(0, 256)
            buf = bytes(buf)
        p = tmp_path / f"fuzz{trial}.cram"
        p.write_bytes(buf)
        try:
            read_cram(str(p), reference=f"{DATA}/synth.fa")
        except (ValueError, EOFError, OSError, NotImplementedError):
            pass
