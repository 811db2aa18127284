"""IterativeAssembler fidelity tests.

The five cases mirror assembly/test/IterativeAssemblerTest.cpp
(test_CircleDetector, test_BasicAssembler, test_IterativeKmer,
test_branching_basic, test_branching_iterative) with the same inputs
and expected outputs, plus soaks for the pseudo-read rescue path and
repetitive regions that counting cannot span."""
import numpy as np
import pytest

from strelka_tpu.pipeline.assembly import (
    AssemblerOptions, get_repeat_kmers, run_iterative_assembler)


def test_circle_detector():
    # IterativeAssemblerTest.cpp test_CircleDetector
    word_count = {
        "TACCA": 3, "CCACC": 3, "CACCA": 3, "ACCAC": 3,
        "CCACA": 3, "CACAC": 3, "ACACA": 3, "AAAAA": 2,
    }
    repeats = get_repeat_kmers(word_count)
    # first circle
    assert {"ACCAC", "CACCA", "CCACC"} <= repeats
    assert "TACCA" not in repeats and "CCACA" not in repeats
    # second circle
    assert {"CACAC", "ACACA"} <= repeats
    # homopolymer self-circle
    assert "AAAAA" in repeats


def test_basic_assembler():
    # IterativeAssemblerTest.cpp test_BasicAssembler
    opt = AssemblerOptions(min_word_length=6, max_word_length=6,
                           min_coverage=2)
    reads = [
        "ACGTGTATTACC",
        "GTGTATTACCTA",
        "ATTACCTAGTAC",
        "TACCTAGTACTC",
        "123456789123",
    ]
    contigs, read_info = run_iterative_assembler(reads, opt)
    assert len(contigs) == 1
    assert contigs[0].seq == "GTGTATTACCTAGTAC"
    for i in range(4):
        assert read_info[i].is_used
        assert read_info[i].contig_ids[0] == 0
    assert not read_info[4].is_used


def test_iterative_kmer():
    # IterativeAssemblerTest.cpp test_IterativeKmer: the 3-mer pass
    # hits repeats (ACAC..., TCTC...), and its contigs rescue the
    # assembly as pseudo reads at larger word sizes.
    opt = AssemblerOptions(min_word_length=3, max_word_length=9,
                           word_step_size=3, min_coverage=1)
    reads = [
        "ACACACACGATG",
        "GATGTCTCTCTC",
        "123456789123",
    ]
    contigs, read_info = run_iterative_assembler(reads, opt)
    assert len(contigs) == 1
    assert contigs[0].seq == "ACACACACGATGTCTCTCTC"
    for i in range(2):
        assert read_info[i].is_used
        assert read_info[i].contig_ids[0] == 0
    assert not read_info[2].is_used


def test_branching_basic():
    # IterativeAssemblerTest.cpp test_branching_basic: one shared
    # prefix read splitting into two supported branches -> two contigs,
    # the shared read supports both.
    opt = AssemblerOptions(min_word_length=6, max_word_length=6,
                           min_coverage=1, min_support_reads=1,
                           min_unused_reads=1)
    reads = [
        "ATATAGACGATG",
        "ACGATGTCTATCTT",
        "ACGATGTTGGCCTT",
    ]
    contigs, read_info = run_iterative_assembler(reads, opt)
    assert len(contigs) == 2
    assert contigs[0].seq == "ATATAGACGATGTCTATCTT"
    assert contigs[1].seq == "ATATAGACGATGTTGGCCTT"
    assert read_info[0].is_used
    assert read_info[0].contig_ids == [0, 1]
    assert read_info[1].is_used and read_info[1].contig_ids == [0]
    assert read_info[2].is_used and read_info[2].contig_ids == [1]


def test_branching_iterative():
    # IterativeAssemblerTest.cpp test_branching_iterative: repeat
    # rescue via pseudo reads AND branch tracking together.
    opt = AssemblerOptions(min_word_length=3, max_word_length=9,
                           word_step_size=3, min_coverage=1,
                           min_support_reads=1, min_unused_reads=1)
    reads = [
        "ACACACACGATG",
        "GATGGCCCCCCC",
        "GATGTCTCTCTC",
    ]
    contigs, read_info = run_iterative_assembler(reads, opt)
    assert len(contigs) == 2
    assert contigs[0].seq == "ACACACACGATGGCCCCCCC"
    assert contigs[1].seq == "ACACACACGATGTCTCTCTC"
    assert read_info[0].is_used and read_info[0].contig_ids == [0, 1]
    assert read_info[1].is_used and read_info[1].contig_ids == [0]
    assert read_info[2].is_used and read_info[2].contig_ids == [1]


def test_reject_reads_on_losing_branch():
    # reads on an unselected branch become reject reads of the winning
    # contig (walk :289-315); the winner keeps majority support
    opt = AssemblerOptions(min_word_length=6, max_word_length=6,
                           min_coverage=1, min_support_reads=1,
                           min_unused_reads=1)
    reads = [
        "AAGGCTACGT",   # branch A (majority)
        "AAGGCTACGT",
        "AAGGCTACGT",
        "AAGGCTTTTT",   # branch B (minority)
    ]
    contigs, read_info = run_iterative_assembler(reads, opt)
    top = contigs[0]
    assert top.seq == "AAGGCTACGT"
    assert 3 in top.reject_reads
    assert {0, 1, 2} <= top.support_reads


def test_low_coverage_pseudo_read_rescue_soak():
    # a repetitive interior (forces the small-k pass to fail) flanked
    # by unique sequence at coverage == min_coverage: only the
    # pseudo-read rescue (kmer weight = min_coverage,
    # IterativeAssembler.cpp:506-510) lets larger k span it
    rng = np.random.default_rng(7)
    left = "".join("ACGT"[i] for i in rng.integers(0, 4, 40))
    right = "".join("ACGT"[i] for i in rng.integers(0, 4, 40))
    hap = left + "ACACACACACAC" + right
    # tile reads of length 30, stride 7 => most kmers at ~4x but
    # min_coverage 3 with some positions at exactly 3
    reads = [hap[i:i + 30] for i in range(0, len(hap) - 29, 7)] * 2
    opt = AssemblerOptions(min_word_length=10, max_word_length=31,
                           word_step_size=7, min_coverage=3,
                           min_support_reads=2, min_unused_reads=1)
    contigs, _ = run_iterative_assembler(reads, opt)
    assert contigs
    best = max(contigs, key=lambda c: len(c.seq)).seq
    assert best in hap and len(best) >= 60


def test_repetitive_region_multi_k_soak():
    # tandem repeats of several unit lengths: every small-k pass sees
    # circles; assembly must still terminate and reconstruct when k
    # exceeds the repeat span
    rng = np.random.default_rng(11)
    for unit in ("AT", "CAG", "ACGT"):
        left = "".join("ACGT"[i] for i in rng.integers(0, 4, 35))
        right = "".join("ACGT"[i] for i in rng.integers(0, 4, 35))
        hap = left + unit * 8 + right
        reads = [hap[i:i + 34] for i in range(0, len(hap) - 33, 3)]
        opt = AssemblerOptions(min_word_length=8, max_word_length=33,
                               word_step_size=5, min_coverage=2,
                               min_support_reads=1, min_unused_reads=1)
        contigs, _ = run_iterative_assembler(reads, opt)
        assert contigs, f"no contigs for unit {unit}"
        best = max(contigs, key=lambda c: len(c.seq)).seq
        assert best in hap, f"misassembled unit {unit}"
        assert len(best) > len(unit) * 8 + 20


def test_select_contigs_min_unused_reads():
    # selection stops once fewer than min_unused_reads normal reads
    # remain unused (selectContigs :738-747)
    opt = AssemblerOptions(min_word_length=6, max_word_length=6,
                           min_coverage=1, min_support_reads=1,
                           min_unused_reads=3)
    reads = [
        "ATATAGACGATG",
        "ACGATGTCTATCTT",
        "ACGATGTTGGCCTT",
    ]
    contigs, _ = run_iterative_assembler(reads, opt)
    # after the first contig consumes 2 of the 3 reads, only 1 unused
    # normal read remains < 3 -> the second branch is never selected
    assert len(contigs) == 1


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
