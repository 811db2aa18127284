"""AR-discovered indels receive read observations
(ActiveRegionProcessor.cpp:739-755: addIndelObservation per supporting
alignId). Regression for the round-5 insertion-FN class: when the
haplotype aligner places an insertion at a different (but equivalent)
rotation than the left-shifted read-CIGAR key, the discovered key used
to have zero read support and silently failed candidacy — the het
insertion vanished from the output. Context extracted from the soak
generator's missed site (ref_seed=100, pos 510375)."""
import numpy as np

from strelka_tpu.io.fasta import FastaReference, decode_bases, encode_bases
from strelka_tpu.options import GermlineOptions
from strelka_tpu.pipeline import germline_caller as gc
from strelka_tpu.pipeline import gvcf

from tests.test_pileup import make_batch

# 240bp of reference around the failing site; the insertion "TG" goes
# after local position 121 (ref ...ATGATAGCTTG | TCCATG...), where the
# global aligner emits the equivalent rotation "GT" one base later
REF = ("TGACCAAATATTTCTCAAACGCATGCGTAGCTCTCGTGTTAACGATGATAGTCGACGGGCCC"
       "GGCGACATACATAAGTCCAAATTTTCCACCGTTAGCCTCTACATCGCTATGATAGCTTGTCC"
       "ATGAAGTGGCCTCGACTCTAAACGGCTACTATTGTCACCTTCGCGAATGCCCATGCAGCGAT"
       "TAACAAAGACGAACTCATTGAAAGTGGGAGACTCCATCCGTTATTTGCAAGCTG")


def _write_fasta(path, seq):
    with open(path, "w") as f:
        f.write(">t1\n")
        for i in range(0, len(seq), 70):
            f.write(seq[i:i + 70] + "\n")


def test_rotated_discovered_insertion_is_called(tmp_path):
    L = len(REF)
    ins_after = 120          # 0-based ref index of the last M base
    ins = "TG"
    rl = 80
    reads = []
    for k in range(14):      # het insertion reads
        st = ins_after - 70 + 4 * k
        n_m = ins_after - st + 1
        seq = (REF[st:ins_after + 1] + ins
               + REF[ins_after + 1:st + rl - len(ins) + 1])
        seq = seq[:rl]
        cig = f"{n_m}M{len(ins)}I{rl - n_m - len(ins)}M"
        reads.append((st, cig, seq, [37] * rl, 0, 60))
    for k in range(14):      # ref reads
        st = ins_after - 60 + 4 * k
        reads.append((st, f"{rl}M", REF[st:st + rl], [37] * rl, 0, 60))
    reads.sort(key=lambda r: r[0])
    batch = make_batch(reads)
    fa = tmp_path / "t.fa"
    _write_fasta(str(fa), REF)
    ref = FastaReference(str(fa))

    opt = GermlineOptions()
    res = gc.call_region(opt, ref, "t1", 0, L, [batch])
    _g, v = gvcf.emit_region(opt, res, ["S"])
    ins_recs = [l.split("\t") for l in v
                if len(l.split("\t")[4].split(",")[0]) >
                len(l.split("\t")[3])]
    assert ins_recs, v
    assert any(abs(int(r[1]) - (ins_after + 1)) <= 3 for r in ins_recs), \
        ins_recs


def test_discovered_key_gets_read_support(tmp_path):
    """The observation store ends up with tier1 support on the
    AR-discovered key itself (not only on the read-CIGAR key)."""
    from strelka_tpu.pipeline import active_region as arp
    from strelka_tpu.pipeline import candidates as cand
    from strelka_tpu.pipeline import reads as rd

    L = len(REF)
    codes = encode_bases(REF)
    ins_after = 120
    ins = "TG"
    rl = 80
    reads = []
    for k in range(14):
        st = ins_after - 70 + 4 * k
        n_m = ins_after - st + 1
        seq = (REF[st:ins_after + 1] + ins
               + REF[ins_after + 1:st + rl - len(ins) + 1])[:rl]
        reads.append((st, f"{n_m}M{len(ins)}I{rl - n_m - len(ins)}M",
                      seq, [37] * rl, 0, 60))
    for k in range(14):
        st = ins_after - 60 + 4 * k
        reads.append((st, f"{rl}M", REF[st:st + rl], [37] * rl, 0, 60))
    reads.sort(key=lambda r: r[0])
    batch = make_batch(reads)

    opt = GermlineOptions()
    keep, level = rd.filter_and_classify_reads(batch, opt.min_mapping_quality)
    b = batch.select(keep)
    lv = level[keep]
    ea = rd.expand_alignments(b)
    counts_ev, depth_ev = arp.variant_evidence(b, ea, lv, codes, 0, L)
    anchors = arp.anchor_mask(codes)
    regions = arp.find_active_regions(counts_ev, depth_ev, anchors, codes, 0)
    assert regions, "insertion should open an active region"
    cm = arp.candidate_variant_mask(counts_ev, depth_ev, codes)
    dv = arp.process_active_region(b, ea, lv, codes, 0, regions[0],
                                   cand_mask=cm)
    assert dv.indels, "haplotyping should discover the insertion"
    key = dv.indels[0][0]
    assert dv.indel_read_ids.get(key), "supporting reads recorded"
    # wire through the store as call_region does
    store = cand.IndelObservationStore(1)
    for k2, _h in dv.indels:
        for rid in dv.indel_read_ids.get(k2, ()):
            store.add_read_observation(k2, 0, rid, int(lv[rid]))
    assert len(store.records[key].samples[0].tier1_reads) >= 10
