"""Oracle tests for pipeline/allele_select.py — scalar transcriptions
of OrthogonalVariantAlleleCandidateGroupUtil.cpp checked against the
vectorized port, plus e2e wiring through call_region for the
cross-position extension path (addAllelesAtOtherPositions)."""
import numpy as np
import pytest

from strelka_tpu.io.fasta import FastaReference, decode_bases
from strelka_tpu.options import GermlineOptions
from strelka_tpu.pipeline import allele_select as asel
from strelka_tpu.pipeline import germline_caller as gc
from strelka_tpu.pipeline.candidates import IndelKey

from tests.test_pileup import make_batch


# ---------------------------------------------------------------------
# scalar transcriptions (literal ports of the C++ loops)

def _ref_rank_in_sample(allele_lhoods, n_alt):
    """rankOrthogonalAllelesInSample:209-257, scalar."""
    full = n_alt + 1
    support = [0.0] * full
    if allele_lhoods is not None:
        for row in np.asarray(allele_lhoods, np.float64):
            # getAlleleNaivePosteriorFromRead: normalizeLogDistro
            m = max(row)
            p = [np.exp(x - m) for x in row]
            tot = sum(p)
            for i in range(full):
                support[i] += p[i] / tot
    # sortIndices: descending by support (stable convention for ties)
    order = sorted(range(full), key=lambda i: (-support[i], i))
    ranked = []
    ref_rank = 0
    found = False
    for fi in order:
        if fi == 0:
            found = True
            continue
        if not found:
            ref_rank += 1
        ranked.append(fi - 1)
    return ranked, ref_rank


def _ref_select_all_samples(lhoods, caller_ploidy, n_alt):
    """selectTopOrthogonalAllelesInAllSamples:286-391, scalar."""
    key_score = {}
    added = []
    top_allele = []
    for s, al in enumerate(lhoods):
        cp = caller_ploidy[s]
        ranked, ref_rank = _ref_rank_in_sample(al, n_alt)
        top_size = cp - (1 if ref_rank < cp else 0)
        kept = ranked[:max(top_size, 0)]
        for idx, ai in enumerate(kept):
            if ai not in key_score:
                key_score[ai] = 0
                added.append(ai)
            key_score[ai] += cp - idx
        top_allele.append(kept[0] if kept else None)
    group = list(added)
    if len(lhoods) > 1:
        seen = {ai: i for i, ai in enumerate(added)}
        group.sort(key=lambda ai: (-key_score[ai], seen[ai]))
    tops = [group.index(a) if a is not None and a in group else 0
            for a in top_allele]
    return group, tops


def _rand_lhoods(rng, n_reads, n_alt):
    return rng.normal(-40, 8, (n_reads, n_alt + 1))


def test_rank_in_sample_matches_transcription():
    rng = np.random.default_rng(0)
    for _ in range(50):
        n_alt = int(rng.integers(1, 5))
        al = _rand_lhoods(rng, int(rng.integers(1, 30)), n_alt)
        got = asel.rank_alleles_in_sample(al, n_alt)
        want = _ref_rank_in_sample(al, n_alt)
        assert got == want


def test_rank_in_sample_empty_is_identity():
    assert asel.rank_alleles_in_sample(None, 3) == ([0, 1, 2], 0)
    assert asel.rank_alleles_in_sample(np.zeros((0, 4)), 3) == ([0, 1, 2], 0)


def test_select_all_samples_matches_transcription():
    rng = np.random.default_rng(1)
    for _ in range(60):
        n_alt = int(rng.integers(1, 5))
        n_samp = int(rng.integers(1, 4))
        lhoods = [None if rng.random() < 0.2
                  else _rand_lhoods(rng, int(rng.integers(1, 25)), n_alt)
                  for _ in range(n_samp)]
        cps = [int(rng.integers(1, 3)) for _ in range(n_samp)]
        got = asel.select_top_in_all_samples(lhoods, cps, n_alt)
        want = _ref_select_all_samples(lhoods, cps, n_alt)
        assert got == (want[0], want[1]), (lhoods, cps)


def test_topsize_reference_consumes_slot():
    """Ref inside the top-ploidy shrinks topSize (:271-276): with ref
    dominant, a diploid sample keeps only one alt."""
    # 10 ref reads, 4 reads for each alt
    al = np.full((18, 3), -60.0)
    al[:10, 0] = -1.0
    al[10:14, 1] = -1.0
    al[14:, 2] = -1.0
    kept, tops = asel.select_top_in_all_samples([al], [2], 2)
    assert len(kept) == 1 and tops == [0]
    # ref ranked LAST: both alts stay
    al2 = np.full((18, 3), -60.0)
    al2[:2, 0] = -1.0
    al2[2:12, 1] = -1.0
    al2[12:, 2] = -1.0
    kept2, _ = asel.select_top_in_all_samples([al2], [2], 2)
    assert kept2 == [0, 1]  # alt0 (10 reads) ranks before alt1 (6)


def test_haploid_ref_top_drops_all_alts():
    al = np.full((10, 2), -60.0)
    al[:8, 0] = -1.0
    al[8:, 1] = -1.0
    kept, tops = asel.select_top_in_all_samples([al], [1], 1)
    assert kept == [] and tops == [0]


def test_multi_sample_vote_aggregation():
    """Two samples disagreeing on the top allele: the vote sum
    (ploidy - rank) decides the cross-sample order (:331-369)."""
    def fav(ai, strength):
        al = np.full((strength, 3), -60.0)
        al[:, ai] = -1.0
        return al
    # sample0 favors alt0, samples1+2 favor alt1 -> alt1 first
    lhoods = [fav(1, 10), fav(2, 10), fav(2, 10)]
    kept, tops = asel.select_top_in_all_samples(lhoods, [2, 2, 2], 2)
    assert kept[0] == 1
    assert tops == [kept.index(0), kept.index(1), kept.index(1)]


def _ref_rank_new_alts(lhoods, n_new):
    """addAllelesAtOtherPositions:554-612, scalar (refPenalty votes)."""
    key_score = {}
    added = []
    for al in lhoods:
        ranked, ref_rank = _ref_rank_in_sample(al, n_new)
        ref_penalty = 0
        for idx, ai in enumerate(ranked):
            if ai not in key_score:
                key_score[ai] = 0
                added.append(ai)
            if ref_rank == idx:
                ref_penalty = 1
            key_score[ai] += (n_new + 1) - (idx + ref_penalty)
    out = list(added)
    if len(lhoods) > 1:
        seen = {ai: i for i, ai in enumerate(added)}
        out.sort(key=lambda ai: (-key_score[ai], seen[ai]))
    return out


def test_rank_new_alt_alleles_matches_transcription():
    rng = np.random.default_rng(2)
    for _ in range(40):
        n_new = int(rng.integers(2, 5))
        n_samp = int(rng.integers(1, 4))
        lhoods = [_rand_lhoods(rng, int(rng.integers(1, 20)), n_new)
                  for _ in range(n_samp)]
        assert asel.rank_new_alt_alleles(lhoods, n_new) == \
            _ref_rank_new_alts(lhoods, n_new)


def test_indel_conflict_adjacency():
    """is_indel_conflict: open ranges +1 (indel_util.cpp:29-45)."""
    d10 = IndelKey(10, 1, "")      # 1D at 10, right_pos 11
    assert asel.indel_conflict(d10, IndelKey(11, 1, ""))   # adjacent
    assert not asel.indel_conflict(d10, IndelKey(12, 1, ""))
    ins10 = IndelKey(10, 0, "AC")  # insertion: right_pos == pos
    assert asel.indel_conflict(ins10, IndelKey(10, 1, ""))
    assert not asel.indel_conflict(ins10, IndelKey(11, 1, ""))
    # spanning deletion conflicts with anything inside its range
    d5 = IndelKey(5, 10, "")
    assert asel.indel_conflict(d5, IndelKey(12, 0, "T"))
    assert asel.indel_conflict(d5, IndelKey(15, 2, ""))


def test_greedy_clique_keeps_rank_order():
    a = IndelKey(10, 5, "")    # spans 10-15
    b = IndelKey(12, 1, "")    # inside a
    c = IndelKey(30, 1, "")    # far away: conflicts with neither
    assert asel.greedy_orthogonal_clique([a, b, c]) == [a, b]
    assert asel.greedy_orthogonal_clique([c, a, b]) == [c]


def test_alt_repeats_flags_duplicates():
    codes = np.zeros(40, np.uint8)  # all 'A'
    # two different 1D deletions in a homopolymer produce the same ALT
    k1 = IndelKey(10, 1, "")
    k2 = IndelKey(11, 1, "")
    flags = asel.allele_group_alt_repeats([k1, k2], codes, 0, decode_bases)
    assert flags == [False, True]


# ---------------------------------------------------------------------
# e2e: cross-position extension through call_region

def _write_fasta(path, codes):
    seq = decode_bases(codes)
    with open(path, "w") as f:
        f.write(">t1\n")
        for i in range(0, len(seq), 70):
            f.write(seq[i:i + 70] + "\n")


def test_cross_position_extension_e2e(tmp_path):
    """A deletion at p and a conflicting deletion INSIDE its span at
    p+4 form one locus via addAllelesAtOtherPositions (:472-684): the
    reference genotypes them jointly as a 1/2 multi-alt record, and
    the downstream position is suppressed
    (_variantLocusAlreadyOutputToPos) instead of emitting a second,
    conflicting locus."""
    rng = np.random.default_rng(11)
    L = 2000
    codes = rng.integers(0, 4, L).astype(np.uint8)
    refs = decode_bases(codes)
    fa = tmp_path / "t.fa"
    _write_fasta(str(fa), codes)
    ref = FastaReference(str(fa))

    p = 1000
    rl = 100
    reads = []
    # hap A: 10bp deletion at p (reads: ...ref[:p] + ref[p+10:]...)
    for k in range(14):
        st = p - 60 + 3 * k
        seq = refs[st:p] + refs[p + 10:st + rl + 10]
        reads.append((st, f"{p - st}M10D{rl - (p - st)}M",
                      seq, [38] * rl, 0, 60))
    # hap B: 2bp deletion at p+4 (inside hap A's span -> conflicting,
    # different start position)
    q = p + 4
    for k in range(13):
        st = q - 60 + 3 * k
        seq = refs[st:q] + refs[q + 2:st + rl + 2]
        reads.append((st, f"{q - st}M2D{rl - (q - st)}M",
                      seq, [38] * rl, 0, 60))
    # light ref support (below both alts: ref ranks last, both kept)
    for k in range(4):
        st = p - 70 + 6 * k
        reads.append((st, f"{rl}M", refs[st:st + rl], [38] * rl, 0, 60))
    reads.sort(key=lambda r: r[0])
    batch = make_batch(reads)

    opt = GermlineOptions()
    result = gc.call_region(opt, ref, "t1", 0, L, [batch])
    var = [c for c in result.indels if any(g > 0 for g in c.sample_gt)]
    assert len(var) == 1, [(c.pos, [str(k) for k in c.keys]) for c in var]
    call = var[0]
    # left-shift normalization may move the keys a little; the locus
    # must hold exactly the 10bp and 2bp deletions at distinct starts
    spans = sorted((k.pos, k.delete_length) for k in call.keys)
    assert [d for _, d in spans] == [10, 2], spans
    assert spans[0][0] != spans[1][0]
    assert all(abs(kp - p) < 10 for kp, _ in spans), spans
    # hap A has more support: it ranks first in the ALT column
    assert call.keys[0].delete_length == 10
    # both alleles genotyped: het-alt 1/2
    from strelka_tpu.models.indel_genotype import genotype_alleles
    ga = genotype_alleles(2, 3)
    a0, a1 = (int(x) for x in ga[call.sample_gt[0]])
    assert {a0, a1} == {1, 2}, (a0, a1)
    assert not call.is_conflict


def test_extension_suppressed_when_not_conflicting(tmp_path):
    """An indel downstream of the locus range does NOT join the locus
    (extension requires conflict with every input allele) and is
    genotyped at its own position."""
    rng = np.random.default_rng(12)
    L = 2000
    codes = rng.integers(0, 4, L).astype(np.uint8)
    refs = decode_bases(codes)
    fa = tmp_path / "t.fa"
    _write_fasta(str(fa), codes)
    ref = FastaReference(str(fa))

    p, q = 1000, 1040   # far apart: orthogonal loci
    rl = 100
    reads = []
    for pos, dlen, n in ((p, 3, 12), (q, 2, 12)):
        for k in range(n):
            st = pos - 60 + 3 * k
            seq = refs[st:pos] + refs[pos + dlen:st + rl + dlen]
            reads.append((st, f"{pos - st}M{dlen}D{rl - (pos - st)}M",
                          seq, [38] * rl, 0, 60))
    for k in range(4):
        st = p - 70 + 6 * k
        reads.append((st, f"{rl}M", refs[st:st + rl], [38] * rl, 0, 60))
    reads.sort(key=lambda r: r[0])
    batch = make_batch(reads)

    opt = GermlineOptions()
    result = gc.call_region(opt, ref, "t1", 0, L, [batch])
    var = sorted((c for c in result.indels
                  if any(g > 0 for g in c.sample_gt)), key=lambda c: c.pos)
    assert len(var) == 2, [(c.pos, [str(k) for k in c.keys]) for c in var]
    assert len(var[0].keys) == 1 and len(var[1].keys) == 1
    assert not var[0].is_conflict and not var[1].is_conflict
