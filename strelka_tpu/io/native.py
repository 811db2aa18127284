"""ctypes bindings for the native BGZF/BAM decoder.

The C++ library (native/bamdecoder.cpp) inflates independent BGZF
blocks across a thread pool and parses BAM records into preallocated
struct-of-arrays numpy buffers. Falls back to the pure-Python path
when the shared library is absent.
"""
from __future__ import annotations

import ctypes
import os
import struct

import numpy as np

_LIB = None
_LIB_CHECKED = False

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
LIB_PATHS = [
    os.path.join(_REPO_ROOT, "native", "libstrelka_tpu_native.so"),
    os.path.join(os.path.dirname(__file__), "libstrelka_tpu_native.so"),
]


def _build_library() -> str | None:
    """Best-effort build of the native library if a toolchain exists."""
    import subprocess
    makedir = os.path.join(_REPO_ROOT, "native")
    if not os.path.exists(os.path.join(makedir, "Makefile")):
        return None
    try:
        subprocess.run(["make", "-C", makedir], check=True,
                       capture_output=True, timeout=120)
    except Exception:  # noqa: BLE001
        return None
    p = LIB_PATHS[0]
    return p if os.path.exists(p) else None


def get_lib():
    global _LIB, _LIB_CHECKED
    if _LIB_CHECKED:
        return _LIB
    _LIB_CHECKED = True
    path = next((p for p in LIB_PATHS if os.path.exists(p)), None)
    if path is None:
        path = _build_library()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    i64p = ctypes.POINTER(ctypes.c_int64)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.bgzf_scan.restype = ctypes.c_int64
    lib.bgzf_scan.argtypes = [u8p, ctypes.c_int64, i64p, i64p, i64p,
                              ctypes.c_int64]
    lib.bgzf_inflate_blocks.restype = ctypes.c_int32
    lib.bgzf_inflate_blocks.argtypes = [u8p, i64p, i64p, i64p, i64p,
                                        ctypes.c_int64, u8p, ctypes.c_int32]
    lib.bam_count_records.restype = ctypes.c_int64
    lib.bam_count_records.argtypes = [u8p, ctypes.c_int64, i64p, i64p, i64p]
    lib.bam_parse_records.restype = ctypes.c_int32
    lib.bam_parse_records.argtypes = [
        u8p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), i64p, u8p,
        ctypes.POINTER(ctypes.c_uint16), ctypes.POINTER(ctypes.c_int32),
        i64p, i64p,
        u8p, u8p, i64p,
        ctypes.POINTER(ctypes.c_int8), ctypes.POINTER(ctypes.c_int32), i64p,
        u8p, i64p,
    ]
    _LIB = lib
    return _LIB


def _p(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def decompress_bgzf_native(data: bytes, n_threads: int = 8) -> bytes | None:
    """Parallel BGZF inflate; None if library unavailable or not BGZF."""
    lib = get_lib()
    if lib is None:
        return None
    buf = np.frombuffer(data, dtype=np.uint8)
    max_blocks = max(len(data) // 64, 16)
    offs = np.zeros(max_blocks, np.int64)
    csizes = np.zeros(max_blocks, np.int64)
    isizes = np.zeros(max_blocks, np.int64)
    n = lib.bgzf_scan(_p(buf, ctypes.c_uint8), len(data),
                      _p(offs, ctypes.c_int64), _p(csizes, ctypes.c_int64),
                      _p(isizes, ctypes.c_int64), max_blocks)
    if n <= 0:
        return None
    out_offs = np.zeros(n, np.int64)
    np.cumsum(isizes[:n - 1], out=out_offs[1:])
    total = int(out_offs[-1] + isizes[n - 1])
    out = np.empty(total, np.uint8)
    rc = lib.bgzf_inflate_blocks(
        _p(buf, ctypes.c_uint8), _p(offs, ctypes.c_int64),
        _p(csizes, ctypes.c_int64), _p(out_offs, ctypes.c_int64),
        _p(isizes, ctypes.c_int64), n, _p(out, ctypes.c_uint8),
        n_threads)
    if rc != 0:
        return None
    return out.tobytes()


def parse_bam_native(data: bytes):
    """Parse a decompressed BAM byte string with the native parser.

    Returns the same (header, ReadBatch) as io.bam.read_bam, or None
    when the library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    from .bam import BamHeader, ReadBatch

    if data[:4] != b"BAM\x01":
        raise ValueError("not a BAM stream")
    off = 4
    (l_text,) = struct.unpack_from("<i", data, off)
    off += 4
    text = data[off:off + l_text].rstrip(b"\x00").decode()
    off += l_text
    (n_ref,) = struct.unpack_from("<i", data, off)
    off += 4
    ref_names, ref_lengths = [], []
    for _ in range(n_ref):
        (l_name,) = struct.unpack_from("<i", data, off)
        off += 4
        ref_names.append(data[off:off + l_name - 1].decode())
        off += l_name
        (l_ref,) = struct.unpack_from("<i", data, off)
        off += 4
        ref_lengths.append(l_ref)
    header = BamHeader(text, ref_names, ref_lengths)

    body = np.frombuffer(data, dtype=np.uint8, offset=off)
    total_seq = np.zeros(1, np.int64)
    total_cig = np.zeros(1, np.int64)
    total_name = np.zeros(1, np.int64)
    n = lib.bam_count_records(_p(body, ctypes.c_uint8), len(body),
                              _p(total_seq, ctypes.c_int64),
                              _p(total_cig, ctypes.c_int64),
                              _p(total_name, ctypes.c_int64))
    if n < 0:
        raise ValueError("truncated BAM alignment section")
    ts, tc, tn = int(total_seq[0]), int(total_cig[0]), int(total_name[0])

    tid = np.empty(n, np.int32)
    pos = np.empty(n, np.int64)
    mapq = np.empty(n, np.uint8)
    flag = np.empty(n, np.uint16)
    mate_tid = np.empty(n, np.int32)
    mate_pos = np.empty(n, np.int64)
    tlen = np.empty(n, np.int64)
    seq = np.empty(ts, np.uint8)
    qual = np.empty(ts, np.uint8)
    seq_off = np.empty(n + 1, np.int64)
    cig_ops = np.empty(tc, np.int8)
    cig_lens = np.empty(tc, np.int32)
    cig_off = np.empty(n + 1, np.int64)
    names_buf = np.empty(tn, np.uint8)
    name_off = np.empty(n + 1, np.int64)

    rc = lib.bam_parse_records(
        _p(body, ctypes.c_uint8), len(body),
        _p(tid, ctypes.c_int32), _p(pos, ctypes.c_int64),
        _p(mapq, ctypes.c_uint8), _p(flag, ctypes.c_uint16),
        _p(mate_tid, ctypes.c_int32), _p(mate_pos, ctypes.c_int64),
        _p(tlen, ctypes.c_int64),
        _p(seq, ctypes.c_uint8), _p(qual, ctypes.c_uint8),
        _p(seq_off, ctypes.c_int64),
        _p(cig_ops, ctypes.c_int8), _p(cig_lens, ctypes.c_int32),
        _p(cig_off, ctypes.c_int64),
        _p(names_buf, ctypes.c_uint8), _p(name_off, ctypes.c_int64),
    )
    if rc != 0:
        raise ValueError("BAM record parse error")

    names_bytes = names_buf.tobytes()
    names = [names_bytes[name_off[i]:name_off[i + 1] - 1].decode()
             for i in range(n)]
    batch = ReadBatch(
        n=int(n), names=names, tid=tid, pos=pos, mapq=mapq, flag=flag,
        mate_tid=mate_tid, mate_pos=mate_pos, tlen=tlen,
        seq=seq, qual=qual, seq_off=seq_off,
        cig_ops=cig_ops, cig_lens=cig_lens, cig_off=cig_off,
    )
    return header, batch


def read_bam_native(path: str, n_threads: int = 8):
    """Native end-to-end BAM read; None if library unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    with open(path, "rb") as f:
        raw = f.read()
    data = decompress_bgzf_native(raw, n_threads)
    if data is None:
        return None
    return parse_bam_native(data)
