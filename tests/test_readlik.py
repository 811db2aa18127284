"""Read-likelihood scoring op + indel genotyping tests.

Mirrors the reference's starling_read_align unit tests plus
model-level simulator tests (starlingSiteSimulator idea): simulate
reads from known haplotypes and check scores/genotypes."""
import numpy as np
import pytest

import strelka_tpu  # noqa: F401
from strelka_tpu.io import bam as bamio
from strelka_tpu.io.fasta import decode_bases, encode_bases
from strelka_tpu.models import indel_genotype as ig
from strelka_tpu.ops import readlik
from strelka_tpu.pipeline import candidates as cand
from strelka_tpu.pipeline import reads as rd
from strelka_tpu.pipeline import realign
from strelka_tpu.utils import cigar as cg

from tests.test_pileup import make_batch


def scalar_score(read, qual, hap, offset):
    """ln P(read | hap at offset) per the reference scoring rule."""
    s = 0.0
    for i, (b, q) in enumerate(zip(read, qual)):
        if b >= 4:
            continue
        e = min(10.0 ** (-q / 10.0), 0.75)
        hp = offset + i
        if 0 <= hp < len(hap) and hap[hp] == b:
            s += np.log1p(-e)
        else:
            s += np.log(e / 3.0)
    return s


def test_score_matches_scalar():
    rng = np.random.default_rng(2)
    hap = rng.integers(0, 4, 80).astype(np.uint8)
    R, L = 5, 30
    seqs = np.full((R, L), 4, np.uint8)
    quals = np.zeros((R, L), np.int32)
    mask = np.zeros((R, L), bool)
    starts = [0, 10, 25, 40, 50]
    for i, st in enumerate(starts):
        ln = 20 + i
        seqs[i, :ln] = hap[st:st + ln]
        if i == 2:  # add mismatches
            seqs[i, 5] = (seqs[i, 5] + 1) % 4
        quals[i, :ln] = rng.integers(10, 40, ln)
        mask[i, :ln] = True
    tile = readlik.build_read_tile(seqs, quals, mask)
    hap_oh = readlik.build_hap_onehot(hap[None, :])
    scores = np.asarray(readlik.score_all_offsets(tile.delta, tile.lnmis_sum, hap_oh))
    W = scores.shape[2]
    for i, st in enumerate(starts):
        ln = int(mask[i].sum())
        for o in [st, st + 3, max(0, st - 2)]:
            if o >= W:
                continue
            expect = scalar_score(seqs[i, :ln], quals[i, :ln], hap, o)
            np.testing.assert_allclose(scores[i, 0, o], expect, rtol=1e-4, atol=1e-3)
        # best offset should be the true start (reads 0,1,3,4 exact)
        if i != 2:
            assert int(np.argmax(scores[i, 0])) == st


def _sim_reads(hap_pool, n, read_len, q, rng, region_len):
    """Simulate error-free reads from a pool of haplotype sequences."""
    entries = []
    for _ in range(n):
        hap = hap_pool[rng.integers(0, len(hap_pool))]
        st = int(rng.integers(0, len(hap) - read_len))
        seq = hap[st:st + read_len]
        entries.append((st, seq))
    return entries


def make_indel_batch(ref, alt_keys, n_reads=30, read_len=40, vaf=0.5, seed=3,
                     q=30):
    """Reads drawn from ref or ref-with-indel haplotypes, with correct
    CIGARs, as a ReadBatch."""
    rng = np.random.default_rng(seed)
    key = alt_keys[0]
    reads = []
    for _ in range(n_reads):
        use_alt = rng.random() < vaf
        if not use_alt:
            st = int(rng.integers(0, len(ref) - read_len))
            seq = ref[st:st + read_len]
            reads.append((st, f"{read_len}M", decode_bases(seq), [q] * read_len, 0, 60))
        else:
            # construct read spanning the indel where possible
            alt_hap = realign.apply_indel_to_window(ref, 0, key, encode_bases)
            shift = key.insert_length - key.delete_length
            st = int(rng.integers(max(0, key.pos - read_len + 5),
                                  max(1, key.pos - 5)))
            seq = alt_hap[st:st + read_len]
            # build cigar
            pre = key.pos - st
            if key.is_insertion:
                ins = key.insert_length
                post = read_len - pre - ins
                if post <= 0:
                    continue
                cigar = f"{pre}M{ins}I{post}M"
            else:
                post = read_len - pre
                cigar = f"{pre}M{key.delete_length}D{post}M"
            reads.append((st, cigar, decode_bases(seq), [q] * read_len, 0, 60))
            del shift
    return make_batch(reads)


@pytest.mark.parametrize("vaf,expected_gt", [(0.0, 0), (0.5, 1), (1.0, 2)])
def test_indel_genotyping_end_to_end(vaf, expected_gt):
    rng = np.random.default_rng(7)
    ref = rng.integers(0, 4, 300).astype(np.uint8)
    # 3bp deletion at pos 150
    key = cand.IndelKey(150, 3, "")
    batch = make_indel_batch(ref, [key], n_reads=40, vaf=vaf)
    keep, level = rd.filter_and_classify_reads(batch, 20)
    ea = rd.expand_alignments(batch)
    scores = realign.score_locus(batch, ea, level, ref, 0, [key])
    assert scores is not None
    glh = ig.genotype_log_lhoods(
        scores.allele_lhoods, np.ones(len(scores.read_rows), bool),
        scores.read_len, scores.n_nonambig,
        ig.AlleleInfo(insert_len=np.array([0]), delete_len=np.array([3])),
        ploidy=2, min_read_bp_flank=5)
    priors = ig.context_priors_for(1, 1)
    tri = ig.ag_genotype_priors_to_triangular(
        np.concatenate([priors.diploid, [-np.inf] * 0]), 2, 2)
    p, max_gt, q_ref, q_max = ig.genotype_posteriors(np.asarray(glh), tri)
    assert max_gt == expected_gt, (vaf, p)
    if vaf > 0:
        assert q_ref > 30


def test_insertion_genotyping():
    rng = np.random.default_rng(11)
    ref = rng.integers(0, 4, 300).astype(np.uint8)
    key = cand.IndelKey(150, 0, "ACGTT")
    batch = make_indel_batch(ref, [key], n_reads=40, vaf=0.5, seed=5)
    keep, level = rd.filter_and_classify_reads(batch, 20)
    ea = rd.expand_alignments(batch)
    scores = realign.score_locus(batch, ea, level, ref, 0, [key])
    glh = ig.genotype_log_lhoods(
        scores.allele_lhoods, np.ones(len(scores.read_rows), bool),
        scores.read_len, scores.n_nonambig,
        ig.AlleleInfo(insert_len=np.array([5]), delete_len=np.array([0])),
        ploidy=2, min_read_bp_flank=5)
    tri = ig.ag_genotype_priors_to_triangular(
        ig.context_priors_for(1, 1).diploid, 2, 2)
    p, max_gt, *_ = ig.genotype_posteriors(np.asarray(glh), tri)
    assert max_gt == 1  # het


def test_candidate_extraction_and_candidacy():
    rng = np.random.default_rng(13)
    ref = rng.integers(0, 4, 300).astype(np.uint8)
    key = cand.IndelKey(150, 3, "")
    batch = make_indel_batch(ref, [key], n_reads=30, vaf=0.5, seed=9)
    keep, level = rd.filter_and_classify_reads(batch, 20)
    ea = rd.expand_alignments(batch)
    store = cand.IndelObservationStore(1)
    cand.extract_read_indels(batch, ea, level, ref, 0, store, 0, 49)
    # left-shifted key may differ from 150 if ref repeats allow
    assert len(store.records) >= 1
    [(k, rec)] = [(k, v) for k, v in store.records.items()
                  if len(v.samples[0].tier1_reads) > 3]
    assert k.delete_length == 3
    from strelka_tpu.models.error_model import IndelErrorModel
    em = IndelErrorModel(1)
    depth = cand.estimated_depth(batch, ea, level, 0, 300)
    result = cand.evaluate_candidacy(store, depth, 0, em, ref, 0, alpha=1e-9)
    assert result[k] is True


def test_error_model_tables():
    from strelka_tpu.models import error_model as em
    ll = em.log_linear_error_model()
    assert np.isclose(ll.get_rate(1, 1, "I"), 5e-5)
    assert np.isclose(ll.get_rate(1, 16, "I"), 3e-4)
    assert np.isclose(ll.get_rate(1, 99, "D"), 3e-4)  # clamped
    assert np.isclose(ll.get_rate(5, 3, "I"), 5e-5)   # unknown pattern -> (1,1)
    ad = em.adaptive_default_error_model()
    assert np.isclose(ad.get_rate(1, 1, "I"), 8e-3)
    assert np.isclose(ad.get_rate(1, 16, "I"), 4.5e-2)
    assert np.isclose(ad.get_rate(2, 9, "D"), 1.8e-2)
    # interpolation between endpoints is monotone
    rates = [ad.get_rate(1, c, "I") for c in range(2, 17)]
    assert all(b >= a for a, b in zip(rates, rates[1:]))


def test_repeat_context():
    # ref ...AAAA[pos]AAAA... 1bp del of A in hpol run
    ref = encode_bases("CGTAAAAAACGT")
    rec = cand.IndelRecord(cand.IndelKey(3, 1, ""), [cand.IndelSampleObs()])
    cand.set_repeat_info(rec, ref, 0, decode_bases)
    assert rec.repeat_unit == "A"
    assert rec.ref_repeat_count == 6
    assert rec.indel_repeat_count == 5
    # dinuc insertion
    ref2 = encode_bases("CGACACACGT")
    rec2 = cand.IndelRecord(cand.IndelKey(2, 0, "AC"), [cand.IndelSampleObs()])
    cand.set_repeat_info(rec2, ref2, 0, decode_bases)
    assert rec2.repeat_unit == "AC"
    assert rec2.ref_repeat_count == 3
    assert rec2.indel_repeat_count == 4


def test_left_shift():
    #        0123456789
    ref = encode_bases("CGAAAATCGT")
    # deletion of one A at pos 5 shifts to pos 2
    pos, dl, ins = cand.left_shift_indel(5, 1, np.empty(0, np.uint8), ref, 0)
    assert pos == 2
    # insertion of A after the A-run shifts to run start
    pos, dl, ins = cand.left_shift_indel(6, 0, encode_bases("A"), ref, 0)
    assert pos == 2
    assert decode_bases(ins) == "A"


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
