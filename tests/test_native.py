"""Native C++ decoder tests: bit-identical to the Python reference
decoder, plus BGZF round trip through the native inflate path."""
import os

import numpy as np
import pytest

from strelka_tpu.io import native
from strelka_tpu.io.bam import read_bam
from strelka_tpu.io.bgzf import BgzfWriter


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no toolchain)")
    return lib


def test_native_matches_python(lib, demo_bams):
    for path in demo_bams:
        h1, b1 = read_bam(path, use_native=False)
        h2, b2 = native.read_bam_native(path)
        assert h1.ref_names == h2.ref_names
        assert h1.ref_lengths == h2.ref_lengths
        assert b1.n == b2.n
        for fld in ("tid", "pos", "mapq", "flag", "mate_tid", "mate_pos",
                    "tlen", "seq", "qual", "seq_off", "cig_ops",
                    "cig_lens", "cig_off"):
            assert np.array_equal(getattr(b1, fld), getattr(b2, fld)), fld
        assert b1.names == b2.names


def test_native_bgzf_roundtrip(lib, tmp_path):
    payload = os.urandom(300_000) + b"trailing"
    p = tmp_path / "t.bgz"
    with BgzfWriter(str(p)) as w:
        w.write(payload)
    with open(p, "rb") as f:
        raw = f.read()
    out = native.decompress_bgzf_native(raw)
    assert out == payload


def test_native_rejects_garbage(lib):
    assert native.decompress_bgzf_native(b"not a bgzf file at all") is None


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


def test_expand_native_equivalence():
    """native/expand.cpp matches the numpy expansion bit-exactly."""
    import numpy as np

    from strelka_tpu.io.bam import read_bam
    from strelka_tpu.pipeline import reads as rd

    for path in ("/root/reference/src/demo/data/NA12891_demo20.bam",
                 "/root/reference/src/demo/dataMito/NA12878_chrM_200-200.bam"):
        _, batch = read_bam(path)
        native = rd.expand_alignments(batch, use_native=True)
        python = rd.expand_alignments(batch, use_native=False)
        for f in native.__dataclass_fields__:
            assert np.array_equal(getattr(native, f), getattr(python, f)), f


def test_ar_evidence_native_equivalence():
    """native ar_evidence matches the numpy evidence tracks."""
    import numpy as np

    from strelka_tpu.io.bam import read_bam
    from strelka_tpu.io.fasta import FastaReference
    from strelka_tpu.pipeline import active_region as arp
    from strelka_tpu.pipeline import reads as rd

    ref = FastaReference("/root/reference/src/demo/data/demo20.fa")
    L = ref.contig_length("demo20")
    rc = ref.fetch("demo20", 0, L)
    _, raw = read_bam("/root/reference/src/demo/data/NA12891_demo20.bam")
    keep, level = rd.filter_and_classify_reads(raw, 20)
    b = raw.select(keep)
    ea = rd.expand_alignments(b)
    cn, dn = arp.variant_evidence(b, ea, level[keep], rc, 0, L,
                                  use_native=True)
    cp, dp = arp.variant_evidence(b, ea, level[keep], rc, 0, L,
                                  use_native=False)
    assert np.array_equal(cn, cp)
    assert np.array_equal(dn, dp)


def test_native_anchor_and_region_machine_match_python():
    """native/activeregion.cpp vs the numpy/python oracles, on random
    sequences with planted STRs and random evidence tracks."""
    import numpy as np

    from strelka_tpu.pipeline import active_region as ar

    rng = np.random.default_rng(7)
    for trial in range(6):
        L = int(rng.integers(200, 5000))
        ref = rng.integers(0, 4, L).astype(np.uint8)
        # plant STRs of several unit sizes + some N stretches
        for _ in range(8):
            u = int(rng.integers(1, 12))
            reps = int(rng.integers(2, 6))
            s = int(rng.integers(0, max(L - u * reps, 1)))
            unit = rng.integers(0, 4, u)
            ref[s:s + u * reps] = np.tile(unit, reps)[: L - s]
        ns = int(rng.integers(0, L))
        ref[ns:ns + int(rng.integers(0, 10))] = 4

        m_native = ar.anchor_mask(ref, use_native=True)
        m_py = ar.anchor_mask(ref, use_native=False)
        assert np.array_equal(m_native, m_py), trial

        depth = rng.integers(0, 60, L).astype(np.int64)
        counts = np.where(rng.random(L) < 0.05,
                          rng.integers(1, 40, L), 0).astype(np.int64)
        counts = np.minimum(counts, depth + rng.integers(0, 3, L))
        begin = int(rng.integers(0, 10_000))
        r_native = ar.find_active_regions(counts, depth, m_py, ref,
                                          begin, use_native=True)
        r_py = ar.find_active_regions(counts, depth, m_py, ref,
                                      begin, use_native=False)
        assert r_native == r_py, trial


def test_native_aligner_matches_python():
    """align_affine vs the numpy oracle on random pairs with indels,
    including tie-break-sensitive repeats."""
    import numpy as np

    from strelka_tpu.ops.aligner import align_global

    rng = np.random.default_rng(13)
    for trial in range(40):
        m = int(rng.integers(5, 260))
        ref = rng.integers(0, 4, m).astype(np.uint8)
        q = ref.copy()
        # mutate: snvs + an indel
        for _ in range(int(rng.integers(0, 5))):
            q[rng.integers(0, len(q))] = rng.integers(0, 4)
        if rng.random() < 0.5 and len(q) > 10:
            s = int(rng.integers(1, len(q) - 5))
            ln = int(rng.integers(1, 5))
            if rng.random() < 0.5:
                q = np.delete(q, slice(s, s + ln))
            else:
                q = np.insert(q, s, rng.integers(0, 4, ln))
        # homopolymer block to stress tie-breaks
        if rng.random() < 0.4:
            s = int(rng.integers(0, max(len(q) - 8, 1)))
            q[s:s + 8] = q[s] if s < len(q) else 0
        q = q.astype(np.uint8)
        sn, on_, ln_ = align_global(q, ref, use_native=True)
        sp, op_, lp_ = align_global(q, ref, use_native=False)
        assert sn == sp, trial
        assert np.array_equal(on_, op_), trial
        assert np.array_equal(ln_, lp_), trial


def test_native_region_segments_match_python():
    """read_segments_for_region native path vs the python fallback
    (forced by casting the match tables to int64) on demo data."""
    import dataclasses

    import numpy as np

    from strelka_tpu.io.bam import read_bam
    from strelka_tpu.io.fasta import FastaReference
    from strelka_tpu.pipeline import active_region as arp
    from strelka_tpu.pipeline import reads as rd

    ref = FastaReference("/root/reference/src/demo/data/demo20.fa")
    _, raw = read_bam("/root/reference/src/demo/data/NA12891_demo20.bam")
    keep, level = rd.filter_and_classify_reads(raw, 20)
    b = raw.select(keep)
    ea = rd.expand_alignments(b)
    lv = level[keep]
    # int64 tables fail the native dtype gate -> python fallback
    ea64 = dataclasses.replace(
        ea, match_refpos=ea.match_refpos.astype(np.int64),
        match_readoff=ea.match_readoff.astype(np.int64))
    L = ref.contig_length("demo20")
    rng = np.random.default_rng(5)
    for _ in range(25):
        begin = int(rng.integers(0, L - 60))
        end = begin + int(rng.integers(10, 60))
        segs_n, nsp_n = arp.read_segments_for_region(b, ea, lv, begin, end)
        segs_p, nsp_p = arp.read_segments_for_region(b, ea64, lv, begin,
                                                     end)
        assert nsp_n == nsp_p
        assert segs_n == segs_p, (begin, end)


def test_arena_pool_reuse_and_eviction():
    """Released arenas must be handed back (refcount bookkeeping is
    fragile — a miscount silently disables all reuse and reintroduces
    the page-fault tax), and idle arenas must eventually be dropped."""
    from strelka_tpu.io.native import _ArenaPool

    pool = _ArenaPool(max_arenas=4)
    a = pool.acquire(1 << 20)
    addr = a.ctypes.data
    del a  # release
    b = pool.acquire(1 << 20)
    assert b.ctypes.data == addr, "freed arena was not reused"
    del b
    # a big arena idles out after MAX_IDLE acquires of small ones
    big = pool.acquire(8 << 20)
    del big
    keep = []
    for _ in range(pool.MAX_IDLE + 2):
        keep.append(pool.acquire(1 << 10))
        keep.pop()
    assert all(x.nbytes < (8 << 20) for x in pool._arenas), \
        "idle big arena never evicted"


def test_native_base_cache_matches_numpy():
    """base_cache_native vs the numpy fallback: bit-identical per-base
    deltas and per-read lnmis/nvalid (golden byte-parity depends on
    the sequential-f32 accumulation order matching)."""
    import numpy as np

    from strelka_tpu.io import native as nat
    from strelka_tpu.io.bam import read_bam
    from strelka_tpu.pipeline import realign_batch as rb
    from strelka_tpu.pipeline import reads as rd

    _, raw = read_bam("/root/reference/src/demo/data/NA12891_demo20.bam")
    keep, level = rd.filter_and_classify_reads(raw, 20)
    b = raw.select(keep)
    d1, l1, v1 = rb._batch_base_cache(b)
    del b._base_cache
    orig = nat.base_cache_native
    try:
        nat.base_cache_native = lambda *a: None  # force numpy fallback
        d2, l2, v2 = rb._batch_base_cache(b)
    finally:
        nat.base_cache_native = orig
        if hasattr(b, "_base_cache"):
            del b._base_cache
    assert np.array_equal(d1, d2)
    assert np.array_equal(l1, l2)
    assert np.array_equal(v1, v2)


def test_sanitizer_gate():
    """ASan/UBSan smoke gate over every native compute entry point
    (make -C native check; SURVEY §5 sanitizers — the reference wires
    ASan build types and cppcheck-as-error into its build)."""
    import shutil
    import subprocess

    if shutil.which("g++") is None:
        pytest.skip("no toolchain")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = subprocess.run(["make", "-C", os.path.join(repo, "native"),
                          "check"], capture_output=True, text=True,
                         timeout=300)
    if "unrecognized" in res.stderr or "cannot find" in res.stderr:
        pytest.skip("toolchain lacks sanitizer runtime")
    assert res.returncode == 0, res.stdout[-1500:] + res.stderr[-1500:]
    assert "sancheck ok" in res.stdout
