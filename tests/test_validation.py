"""Input-validation tests (checkChromSet.py semantics)."""
import numpy as np
import pytest

from strelka_tpu.io.bam import BamHeader
from strelka_tpu.workflow.validation import (ConfigurationError,
                                             check_chrom_set)


class FakeRef:
    def __init__(self, lengths):
        self._lengths = lengths

    @property
    def contig_names(self):
        return list(self._lengths)

    def contig_length(self, name):
        return self._lengths[name]


def hdr(*pairs):
    return BamHeader(text="", ref_names=[p[0] for p in pairs],
                     ref_lengths=[p[1] for p in pairs])


def test_consistent_inputs_pass():
    ref = FakeRef({"chr1": 100, "chr2": 50, "chrExtra": 10})
    check_chrom_set(ref, [hdr(("chr1", 100), ("chr2", 50)),
                          hdr(("chr1", 100), ("chr2", 50))])


def test_missing_chrom_in_reference():
    ref = FakeRef({"chr1": 100})
    with pytest.raises(ConfigurationError, match="missing a chromosome"):
        check_chrom_set(ref, [hdr(("chr1", 100), ("chrX", 5))])


def test_length_mismatch_vs_reference():
    ref = FakeRef({"chr1": 100})
    with pytest.raises(ConfigurationError, match="length of chromosome"):
        check_chrom_set(ref, [hdr(("chr1", 99))])


def test_order_mismatch_between_bams():
    ref = FakeRef({"chr1": 100, "chr2": 50})
    with pytest.raises(ConfigurationError, match="ordered"):
        check_chrom_set(ref, [hdr(("chr1", 100), ("chr2", 50)),
                              hdr(("chr2", 50), ("chr1", 100))])


def test_extra_chrom_in_second_bam():
    ref = FakeRef({"chr1": 100, "chrX": 5})
    with pytest.raises(ConfigurationError, match="missing a chromosome"):
        check_chrom_set(ref, [hdr(("chr1", 100)),
                              hdr(("chr1", 100), ("chrX", 5))])


def test_reference_locked_requires_full_set():
    ref = FakeRef({"chr1": 100, "chr2": 50})
    check_chrom_set(ref, [hdr(("chr1", 100), ("chr2", 50))],
                    reference_locked=True)
    with pytest.raises(ConfigurationError, match="missing a chromosome"):
        check_chrom_set(ref, [hdr(("chr1", 100))], reference_locked=True)


def test_workflow_rejects_mismatched_bam(tmp_path):
    """End-to-end: germline CLI exits 1 with CONFIGURATION ERROR when
    the BAM chrom length disagrees with the reference."""
    from strelka_tpu.workflow.germline import run_germline
    fa = tmp_path / "bad.fa"
    fa.write_text(">demo20\n" + "A" * 100 + "\n")
    rc = run_germline([
        "--reference", str(fa),
        "--align-file", "/root/reference/src/demo/data/NA12891_demo20.bam",
        "--output-dir", str(tmp_path / "out")])
    assert rc == 1
