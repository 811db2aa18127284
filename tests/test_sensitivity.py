"""Whole-pipeline sensitivity/specificity on a synthetic 60kb 40x
region with planted SNVs and indels (the reference validates with
PrecisionFDA-style truth comparisons; this is the in-repo analog)."""
import numpy as np
import pytest

from strelka_tpu.io.fasta import FastaReference, decode_bases
from strelka_tpu.options import GermlineOptions
from strelka_tpu.pipeline import germline_caller as gc
from strelka_tpu.pipeline import gvcf

from tests.test_pileup import make_batch


@pytest.fixture(scope="module")
def synthetic_run(tmp_path_factory):
    rng = np.random.default_rng(77)
    L = 30_000
    ref_codes = rng.integers(0, 4, L).astype(np.uint8)
    refs = decode_bases(ref_codes)

    # plant variants with >=300bp separation
    positions = np.arange(1500, L - 1500, 380)
    rng.shuffle(positions)
    truth_snv_het = sorted(positions[:30])
    truth_snv_hom = sorted(positions[30:50])
    truth_del = sorted(positions[50:60])      # 2bp deletions
    truth_ins = sorted(positions[60:70])      # 2bp insertions

    hap1 = list(refs)
    hap2 = list(refs)
    for p in truth_snv_het:
        hap1[p] = "ACGT"[(ref_codes[p] + 1) % 4]
    for p in truth_snv_hom:
        b = "ACGT"[(ref_codes[p] + 2) % 4]
        hap1[p] = b
        hap2[p] = b
    # indels het on hap1
    del_set = set(truth_del)
    ins_set = set(truth_ins)
    hap1_seq = []
    i = 0
    while i < L:
        if i in del_set:
            hap1_seq.append(hap1[i])
            i += 3  # keep anchor base, delete next 2
            continue
        hap1_seq.append(hap1[i])
        if i in ins_set:
            hap1_seq.append("AC")
        i += 1
    hap1_str = "".join(hap1_seq)
    hap2_str = "".join(hap2)

    # map hap1 coordinates: build alignment of hap1 string to ref
    # simpler: simulate reads directly with known cigars per haplotype
    reads = []
    rl = 100
    n_reads = L * 40 // rl // 2
    for hap_id in (1, 2):
        for _ in range(n_reads):
            st = int(rng.integers(0, L - rl - 10))
            if hap_id == 2:
                seq = hap2_str[st:st + rl]
                cigar = f"{rl}M"
                pos = st
            else:
                # walk ref coords collecting read of length rl with cigars
                seq_parts = []
                cig = []
                i = st
                # skip if start inside a deleted base
                if (i - 1 in del_set) or (i - 2 in del_set):
                    continue
                n = 0
                ok = True
                while n < rl and i < L:
                    seq_parts.append(hap1[i])
                    n += 1
                    cig.append("M")
                    if i in ins_set and n < rl:
                        take = min(2, rl - n)
                        seq_parts.append("AC"[:take])
                        n += take
                        cig.extend("I" * take)
                    if i in del_set:
                        cig.extend("D" * 2)
                        i += 3
                    else:
                        i += 1
                if n < rl:
                    ok = False
                if not ok:
                    continue
                # compress cigar
                cstr = []
                last = None
                cnt = 0
                for c in cig:
                    if c == last:
                        cnt += 1
                    else:
                        if last:
                            cstr.append(f"{cnt}{last}")
                        last, cnt = c, 1
                cstr.append(f"{cnt}{last}")
                cigar = "".join(cstr)
                seq = "".join(seq_parts)[:rl]
                pos = st
            # sequencing errors
            seq = list(seq)
            for _ in range(rng.poisson(0.15)):
                seq[rng.integers(0, len(seq))] = "ACGT"[rng.integers(0, 4)]
            reads.append((pos, cigar, "".join(seq), [32] * len(seq),
                          0 if rng.random() < 0.5 else 16, 60))

    batch = make_batch(sorted(reads, key=lambda r: r[0]))
    td = tmp_path_factory.mktemp("sens")
    fa = td / "ref.fa"
    fa.write_text(">syn\n" + refs + "\n")
    ref = FastaReference(str(fa))
    opt = GermlineOptions()
    res = gc.call_region(opt, ref, "syn", 0, L, [batch])
    glines, vlines = gvcf.emit_region(opt, res, ["S"])
    return {
        "vlines": vlines,
        "truth_snv": set(truth_snv_het) | set(truth_snv_hom),
        "truth_het": set(truth_snv_het),
        "truth_hom": set(truth_snv_hom),
        "truth_del": set(truth_del),
        "truth_ins": set(truth_ins),
    }


def test_snv_sensitivity_and_precision(synthetic_run):
    d = synthetic_run
    called_snv = {}
    for l in d["vlines"]:
        f = l.split("\t")
        if len(f[3]) == 1 and len(f[4]) == 1 and f[6] == "PASS":
            called_snv[int(f[1]) - 1] = f[9].split(":")[0]
    tp = sum(1 for p in d["truth_snv"] if p in called_snv)
    sens = tp / len(d["truth_snv"])
    assert sens >= 0.95, f"SNV sensitivity {sens}"
    fp = sum(1 for p in called_snv if p not in d["truth_snv"])
    assert fp <= 2, f"{fp} false positive SNVs"
    # genotypes correct
    het_ok = sum(1 for p in d["truth_het"]
                 if called_snv.get(p, "").replace("|", "/") in ("0/1", "1/0"))
    hom_ok = sum(1 for p in d["truth_hom"] if called_snv.get(p) == "1/1")
    assert het_ok >= 0.9 * len(d["truth_het"])
    assert hom_ok >= 0.9 * len(d["truth_hom"])


def test_indel_sensitivity(synthetic_run):
    d = synthetic_run
    called_del = set()
    called_ins = set()
    for l in d["vlines"]:
        f = l.split("\t")
        if len(f[3]) > 1 and len(f[4]) == 1:
            called_del.add(int(f[1]))  # pos0 of anchor == deletion site
        elif len(f[4]) > 1 and len(f[3]) == 1:
            called_ins.add(int(f[1]))
    del_tp = sum(1 for p in d["truth_del"] if any(
        abs(p - c) <= 3 for c in called_del))
    ins_tp = sum(1 for p in d["truth_ins"] if any(
        abs(p - c) <= 3 for c in called_ins))
    assert del_tp >= 0.8 * len(d["truth_del"]), (del_tp, len(d["truth_del"]))
    assert ins_tp >= 0.8 * len(d["truth_ins"]), (ins_tp, len(d["truth_ins"]))


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
