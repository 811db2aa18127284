"""Reference-context metric tests with the reference's own unit-test
expectations (blt_common/test/ref_context_test.cpp)."""
import numpy as np

from strelka_tpu.io.fasta import encode_bases
from strelka_tpu.utils.refcontext import (
    _shortest_unencountered,
    context_compressability,
    indel_interrupted_hpol,
    interrupted_hpol_size,
)


def test_shortest_unencountered():
    ref = encode_bases("AAACGACGAC")
    # ref_context_test.cpp test_shortestUnencountered
    for ne, want in [(0, 1), (1, 2), (2, 1), (3, 1), (4, 4), (5, 4), (6, 4)]:
        assert _shortest_unencountered(ref, 1, ne, False) == want, ne
    for ne, want in [(0, 1), (1, 1), (2, 1), (3, 4), (4, 4)]:
        assert _shortest_unencountered(ref, 8, ne, True) == want, ne


def test_context_compressability():
    ref = encode_bases("AAAAAAAATGC")
    # ref_context_test.cpp test_computeContextCompressability
    assert context_compressability(ref, 8, 8, 3) == 7


def test_interrupted_hpol():
    # single-interruption homopolymer: AAAA T AAAA counts 8
    ref = encode_bases("GGAAAATAAAACC")
    assert interrupted_hpol_size(ref, 5) == 8
    # plain homopolymer
    ref2 = encode_bases("CGAAAAAG")
    assert interrupted_hpol_size(ref2, 3) == 5
    # indel span wrapper takes the max over flanking positions
    assert indel_interrupted_hpol(ref, 6, 6) == 8
    assert indel_interrupted_hpol(np.asarray(ref2), 0, 0) >= 1
