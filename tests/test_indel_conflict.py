"""Ploidy-aware orthogonal allele selection at an over-full pileup:
three orthogonal alleles at one position exceed the diploid slot
budget, and the engine emits the reference's top-ranked allele pairing
(selectTopOrthogonalAllelesInSample topSize semantics,
OrthogonalVariantAlleleCandidateGroupUtil.cpp:262-281) — NOT an
IndelConflict record (that filter is reserved for overlapping variant
loci in the overlap resolver, VariantOverlapResolver.cpp:446-459)."""
import numpy as np

from strelka_tpu.io.fasta import FastaReference, decode_bases
from strelka_tpu.options import GermlineOptions
from strelka_tpu.pipeline import germline_caller as gc
from strelka_tpu.pipeline import gvcf

from tests.test_pileup import make_batch


def _write_fasta(path, codes):
    seq = decode_bases(codes)
    with open(path, "w") as f:
        f.write(">t1\n")
        for i in range(0, len(seq), 70):
            f.write(seq[i:i + 70] + "\n")


def test_three_overlapping_indels_marked_conflict(tmp_path):
    rng = np.random.default_rng(5)
    L = 2000
    codes = rng.integers(0, 4, L).astype(np.uint8)
    refs = decode_bases(codes)
    fa = tmp_path / "t.fa"
    _write_fasta(str(fa), codes)
    ref = FastaReference(str(fa))

    # two distinct insertion alleles at position 1000 with distinct
    # support counts: same-count alt haplotypes would be dropped as a
    # group by selectHaplotypes (ActiveRegionProcessor.cpp:448-452)
    p = 1000
    reads = []
    rl = 100
    for ins, n in (("AA", 10), ("CC", 9)):
        for k in range(n):
            st = p - 60 + 3 * k
            seq = refs[st:p] + ins + refs[p:st + rl - len(ins)]
            reads.append((st, f"{p - st}M{len(ins)}I{rl - (p - st) - len(ins)}M",
                          seq, [35] * rl, 0, 60))
    for k in range(4):  # ref support (below both alt counts)
        st = p - 70 + 5 * k
        reads.append((st, f"{rl}M", refs[st:st + rl], [35] * rl, 0, 60))
    reads.sort(key=lambda r: r[0])
    batch = make_batch(reads)

    # active-region discovery caps haplotypes at the ploidy (2), so a
    # third orthogonal allele arrives via the external candidate path
    # (e.g. a Manta VCF) — the realistic route to an over-full locus
    ext = tmp_path / "ext.vcf"
    anchor = refs[p - 1]
    ext.write_text("##fileformat=VCFv4.1\n"
                   "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
                   f"t1\t{p}\t.\t{anchor}\t{anchor}TT\t.\t.\t.\n")

    opt = GermlineOptions()
    result = gc.call_region(opt, ref, "t1", 0, L, [batch],
                            external_indel_vcfs=[str(ext)])
    # reference semantics: the position clique {AA, CC, TT} is ranked
    # by summed naive posteriors; with ref support (4 reads) below both
    # read-backed insertions the reference allele ranks OUTSIDE the
    # diploid top-2, so topSize stays 2 and the locus keeps the two
    # supported insertions. The unsupported external TT is trimmed
    # silently; nothing is marked IndelConflict.
    locus = [c for c in result.indels
             if any(g > 0 for g in c.sample_gt)]
    assert len(locus) == 1, locus
    alts = {k.insert_seq for k in locus[0].keys}
    assert alts == {"AA", "CC"}, alts
    assert not locus[0].is_conflict
    glines, vlines = gvcf.emit_region(opt, result, ["S1"])
    assert not any("IndelConflict" in l for l in vlines)
    # the emitted record reports exactly the reference's allele pairing
    rec = [l.split("\t") for l in vlines
           if l.split("\t")[1] == str(p) and "," in l.split("\t")[4]]
    assert rec, "\n".join(vlines[:8])
    alt_col = rec[0][4].split(",")
    assert len(alt_col) == 2
    # AA ranks first (10 supporting reads vs 9)
    assert alt_col[0].endswith("AA") and alt_col[1].endswith("CC"), alt_col


def test_oversized_indel_becomes_breakpoints(tmp_path):
    """Indels beyond max_indel_size record BP_LEFT/BP_RIGHT
    observations instead of primitive alleles."""
    from strelka_tpu.pipeline import candidates as cand
    from strelka_tpu.pipeline import reads as rd

    rng = np.random.default_rng(9)
    L = 1000
    codes = rng.integers(0, 4, L).astype(np.uint8)
    refs = decode_bases(codes)
    # read with a 60bp deletion (max_indel_size 49)
    rl = 100
    seq = refs[300:350] + refs[410:460]
    reads = [(300, "50M60D50M", seq, [35] * rl, 0, 60)]
    batch = make_batch(reads)
    keep, level = rd.filter_and_classify_reads(batch, 20)
    ea = rd.expand_alignments(batch)
    store = cand.IndelObservationStore(1)
    cand.extract_read_indels(batch, ea, level, codes, 0, store, 0, 49)
    assert not store.records, "oversized indel must not become an allele"
    assert (350, "L") in store.breakpoints
    assert (410, "R") in store.breakpoints
    rec = store.breakpoints[(350, "L")]
    assert rec.tier1_reads[0] == {0}
    # junction sequence = the read's far-side bases (<= max_indel_size)
    assert np.array_equal(rec.seq, codes[410:459])
