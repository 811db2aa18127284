"""Tabix index generation tests: structure parse + region query
against a full scan (concatIndexVcf replacement)."""
import gzip
import os
import struct
import zlib

import pytest

from strelka_tpu.io.tabix import IndexedVcfWriter, read_tbi, reg2bin
from strelka_tpu.workflow.germline import run_germline


def test_reg2bin_spec_values():
    assert reg2bin(0, 1) == 4681
    assert reg2bin(16384, 16385) == 4682
    assert reg2bin(0, 16385) == 585
    assert reg2bin(0, 2 ** 29) == 0


def test_indexed_writer_roundtrip(tmp_path):
    path = str(tmp_path / "x.vcf.gz")
    lines = [f"c1\t{p}\t.\tA\tC\t10\tPASS\t." for p in range(1, 40000, 100)]
    with IndexedVcfWriter(path, ["c1", "c2"]) as w:
        w.write_header("##fileformat=VCFv4.1\n#CHROM\tPOS\n")
        for l in lines:
            w.write_record_line(l)
    assert os.path.exists(path + ".tbi")
    names, refs = read_tbi(path + ".tbi")
    assert names == ["c1", "c2"]
    bins_c1, lin_c1 = refs[0]
    assert bins_c1  # populated
    assert refs[1][0] == {}  # c2 empty
    # region query via the index: fetch records overlapping 20000-20500
    def query(beg, end):
        cand_bins = set()
        # bins overlapping [beg,end): walk the hierarchy
        for shift, off in ((14, 4681), (17, 585), (20, 73), (23, 9), (26, 1)):
            for b in range(off + (beg >> shift), off + ((end - 1) >> shift) + 1):
                cand_bins.add(b)
        cand_bins.add(0)
        chunks = []
        for b in cand_bins:
            chunks.extend(bins_c1.get(b, []))
        assert chunks
        voff = min(c[0] for c in chunks)
        coff, uoff = voff >> 16, voff & 0xFFFF
        with open(path, "rb") as f:
            f.seek(coff)
            data = f.read()
        # decompress from that block onward
        out = []
        pos = 0
        while pos < len(data):
            d = zlib.decompressobj(wbits=31)
            try:
                out.append(d.decompress(data[pos:]))
            except zlib.error:
                break
            consumed = len(data) - pos - len(d.unused_data)
            if consumed <= 0:
                break
            pos += consumed
        text = b"".join(out)[uoff:].decode()
        found = []
        for line in text.splitlines():
            f2 = line.split("\t")
            if len(f2) > 2 and f2[0] == "c1":
                p = int(f2[1]) - 1
                if beg <= p < end:
                    found.append(p)
        return found
    found = query(20000, 20500)
    expect = [p - 1 for p in range(1, 40000, 100) if 20000 <= p - 1 < 20500]
    assert found == expect


def test_germline_outputs_are_indexed(tmp_path):
    out = str(tmp_path / "run")
    run_germline([
        "--reference", "/root/reference/src/demo/data/demo20.fa",
        "--align-file", "/root/reference/src/demo/data/NA12891_demo20.bam",
        "--output-dir", out,
    ])
    for name in ["variants.vcf.gz", "genome.S1.vcf.gz"]:
        assert os.path.exists(os.path.join(out, name + ".tbi"))
        names, refs = read_tbi(os.path.join(out, name + ".tbi"))
        assert "demo20" in names
        # gzip readability of the data file preserved
        with gzip.open(os.path.join(out, name), "rt") as f:
            assert f.readline().startswith("##fileformat")


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
