"""Somatic caller sensitivity/specificity on synthetic tumor/normal
data with planted somatic SNVs and indels (the in-repo analog of the
reference's simulation-based somatic validation)."""
import numpy as np
import pytest

from strelka_tpu.io.fasta import FastaReference, decode_bases
from strelka_tpu.options import SomaticOptions
from strelka_tpu.pipeline import somatic_caller as sc

from tests.test_pileup import make_batch


def _reads_from_hap(rng, hap: str, L: int, depth: int, rl: int, q: int = 35):
    out = []
    n = max(1, L * depth // rl)
    sts = rng.integers(0, max(1, len(hap) - rl - 1), n)
    for st in sts:
        seq = hap[st:st + rl]
        quals = rng.integers(max(2, q - 5), q + 5, rl).tolist()
        out.append((int(st), f"{rl}M", seq, quals, 0, 60))
    return out


@pytest.fixture(scope="module")
def somatic_sim():
    rng = np.random.default_rng(11)
    L = 40_000
    ref_codes = rng.integers(0, 4, L).astype(np.uint8)
    refs = decode_bases(ref_codes)

    positions = np.arange(2000, L - 2000, 700)
    rng.shuffle(positions)
    truth_som_snv = sorted(positions[:20])
    truth_germ_het = sorted(positions[20:35])
    truth_som_del = sorted(positions[35:40])

    # germline haplotype (shared): het SNVs on hap1
    hap1 = list(refs)
    for p in truth_germ_het:
        hap1[p] = "ACGT"[(ref_codes[p] + 1) % 4]
    hap1 = "".join(hap1)
    hap2 = refs

    # tumor somatic haplotype: hap2 + somatic SNVs + 2bp deletions;
    # reads generated in reference coordinates with explicit cigars
    som = list(hap2)
    for p in truth_som_snv:
        som[p] = "ACGT"[(ref_codes[p] + 2) % 4]
    del_set = set(truth_som_del)

    def som_reads(n, rl, q=35):
        out = []
        made = 0
        while made < n:
            st = int(rng.integers(0, L - rl - 10))
            # don't start inside/right after a deleted span
            if (st - 1 in del_set) or (st - 2 in del_set):
                continue
            seq_parts = []
            cig = []
            i = st
            consumed = 0
            while consumed < rl and i < L:
                seq_parts.append(som[i])
                consumed += 1
                if cig and cig[-1][0] == "M":
                    cig[-1][1] += 1
                else:
                    cig.append(["M", 1])
                if i in del_set and consumed < rl:
                    cig.append(["D", 2])
                    i += 3
                else:
                    i += 1
            if consumed < rl:
                continue
            cigar = "".join(f"{ln}{op}" for op, ln in cig)
            quals = rng.integers(max(2, q - 5), q + 5, rl).tolist()
            out.append((st, cigar, "".join(seq_parts), quals, 0, 60))
            made += 1
        return out

    rl = 100
    normal = (_reads_from_hap(rng, hap1, L, 15, rl)
              + _reads_from_hap(rng, hap2, L, 15, rl))
    # tumor: ~40% somatic haplotype fraction
    tumor = (_reads_from_hap(rng, hap1, L, 9, rl)
             + _reads_from_hap(rng, hap2, L, 9, rl)
             + som_reads(L * 12 // rl, rl))
    normal.sort(key=lambda r: r[0])
    tumor.sort(key=lambda r: r[0])

    import tempfile

    d = tempfile.mkdtemp()
    with open(d + "/ref.fa", "w") as f:
        f.write(">s1\n")
        for i in range(0, L, 70):
            f.write(refs[i:i + 70] + "\n")
    ref = FastaReference(d + "/ref.fa")

    opt = SomaticOptions()
    res = sc.call_somatic_region(opt, ref, "s1", 0, L,
                                 make_batch(normal), make_batch(tumor))
    return res, truth_som_snv, truth_germ_het, truth_som_del


def test_somatic_snv_sensitivity(somatic_sim):
    res, som_snv, germ_het, som_del = somatic_sim
    called = {s.pos for s in res.snvs if s.qss >= 15}
    found = sum(1 for p in som_snv if p in called)
    assert found >= int(0.9 * len(som_snv)), (found, len(som_snv))


def test_somatic_snv_specificity(somatic_sim):
    res, som_snv, germ_het, som_del = somatic_sim
    # germline het sites must NOT be called somatic
    called = {s.pos for s in res.snvs if s.qss >= 15}
    fp_germ = [p for p in germ_het if p in called]
    assert not fp_germ, fp_germ
    # few false positives elsewhere
    truth = set(som_snv)
    fps = [p for p in called if p not in truth]
    assert len(fps) <= 2, fps


def test_somatic_indel_sensitivity(somatic_sim):
    res, som_snv, germ_het, som_del = somatic_sim
    called = {c.key.pos for c in res.indels if c.qsi >= 15}
    # deletion key pos is the first deleted base (planted pos + 1)
    found = sum(1 for p in som_del
                if any(abs(k - (p + 1)) <= 2 for k in called))
    assert found >= int(0.8 * len(som_del)), (found, som_del, called)
