"""Open breakpoint (BP_LEFT/BP_RIGHT) handling: oversized read indels
become breakpoint candidates whose junction clipping protects the
pileup from misaligned junction-crossing tails."""
import numpy as np
import pytest

from strelka_tpu.io.fasta import FastaReference, decode_bases
from strelka_tpu.options import GermlineOptions
from strelka_tpu.pipeline import candidates as cand
from strelka_tpu.pipeline import germline_caller as gc
from strelka_tpu.pipeline import reads as rd

from tests.test_pileup import make_batch

SV_POS = 2000
SV_LEN = 100
L_REF = 4000
RL = 100


@pytest.fixture(scope="module")
def sv_setup(tmp_path_factory):
    rng = np.random.default_rng(21)
    ref_codes = rng.integers(0, 4, L_REF).astype(np.uint8)
    refs = decode_bases(ref_codes)
    # sample haplotype: 100bp deletion at SV_POS
    hap = refs[:SV_POS] + refs[SV_POS + SV_LEN:]

    reads = []
    # carrier reads: aligned with the (oversized) deletion in the CIGAR
    for st in range(SV_POS - 70, SV_POS - 30, 2):
        left = SV_POS - st
        right = RL - left
        seq = refs[st:SV_POS] + refs[SV_POS + SV_LEN:SV_POS + SV_LEN + right]
        reads.append((st, f"{left}M{SV_LEN}D{right}M", seq, [35] * RL, 0, 60))
    # junction-crossing reads the aligner left gapless (short far-side
    # overhang aligned across the junction as mismatches)
    for st in range(SV_POS - RL + 4, SV_POS - RL + 24, 2):
        hseq = hap[st:st + RL]
        reads.append((st, f"{RL}M", hseq, [35] * RL, 0, 60))
    # plain reference-supporting background away from the junction
    for st in range(SV_POS - 400, SV_POS - 150, 10):
        reads.append((st, f"{RL}M", refs[st:st + RL], [35] * RL, 16, 60))

    batch = make_batch(sorted(reads, key=lambda r: r[0]))
    td = tmp_path_factory.mktemp("bp")
    fa = td / "ref.fa"
    fa.write_text(">syn\n" + refs + "\n")
    return FastaReference(str(fa)), ref_codes, batch


def test_breakpoint_candidacy_and_sequences(sv_setup):
    _ref, ref_codes, batch = sv_setup
    level = np.full(batch.n, rd.MapLevel.TIER1, dtype=np.int8)
    ea = rd.expand_alignments(batch)
    store = cand.IndelObservationStore(1)
    cand.extract_read_indels(batch, ea, level, ref_codes, 0, store, 0, 49)
    assert (SV_POS, "L") in store.breakpoints
    assert (SV_POS + SV_LEN, "R") in store.breakpoints
    rec = store.breakpoints[(SV_POS, "L")]
    assert len(rec.tier1_reads[0]) >= 10
    # junction sequence continues on the far side of the deletion
    assert np.array_equal(rec.seq[:10],
                          ref_codes[SV_POS + SV_LEN:SV_POS + SV_LEN + 10])

    from strelka_tpu.models.error_model import IndelErrorModel
    est = cand.estimated_depth(batch, ea, level, 0, L_REF)
    bps = cand.evaluate_breakpoint_candidacy(
        store, est, 0, IndelErrorModel(1), alpha=1e-9)
    assert any(p == SV_POS and s == "L" for p, s, _ in bps)


def test_breakpoint_clipping_protects_pileup(sv_setup):
    """Gapless junction-crossing reads get their far-side tails
    soft-clipped, so no false SNVs appear right after the junction."""
    ref, ref_codes, batch = sv_setup
    opt = GermlineOptions()
    res = gc.call_region(opt, ref, "syn", 0, L_REF, [batch])
    from strelka_tpu.pipeline import gvcf
    _glines, vlines = gvcf.emit_region(opt, res, ["S"])
    bad = [l for l in vlines
           if SV_POS < int(l.split("\t")[1]) <= SV_POS + 30
           and "PASS" in l.split("\t")[6]]
    assert not bad, bad


def test_breakpoint_scoring_and_clip_mechanics(sv_setup):
    _ref, ref_codes, batch = sv_setup
    level = np.full(batch.n, rd.MapLevel.TIER1, dtype=np.int8)
    ea = rd.expand_alignments(batch)
    store = cand.IndelObservationStore(1)
    cand.extract_read_indels(batch, ea, level, ref_codes, 0, store, 0, 49)
    seq = store.breakpoints[(SV_POS, "L")].seq

    from strelka_tpu.pipeline import realign
    from strelka_tpu.pipeline import realign_apply as ra
    sc = realign.score_breakpoint_locus(batch, ea, level, ref_codes, 0,
                                        SV_POS, "L", seq)
    assert sc is not None
    gain = sc.allele_lhoods[:, 1] - sc.allele_lhoods[:, 0]
    # junction-crossing reads strongly prefer the breakpoint haplotype
    assert (gain > np.log(10.0)).sum() >= 10
    new_batch, n_clipped = ra.apply_breakpoint_clips(
        batch, [(SV_POS, "L", sc)])
    assert n_clipped >= 10
    # clipped reads no longer cover positions past the junction
    ea2 = rd.expand_alignments(new_batch)
    cover_after = ((ea2.match_refpos >= SV_POS) &
                   (ea2.match_refpos < SV_POS + 10)).sum()
    cover_before = ((ea.match_refpos >= SV_POS) &
                    (ea.match_refpos < SV_POS + 10)).sum()
    assert cover_after < cover_before
