"""RNA spliced-read (N-CIGAR) end-to-end: variants adjacent to splice
junctions must be discovered, realigned and called with per-exon
segment semantics (starling_read_segment), with no segment-boundary
losses; realigned-BAM output reassembles whole spliced reads."""
import numpy as np
import pytest

from strelka_tpu.io.fasta import FastaReference, decode_bases
from strelka_tpu.options import GermlineOptions
from strelka_tpu.pipeline import germline_caller as gc
from strelka_tpu.pipeline import reads as rd
from strelka_tpu.utils import cigar as cg

from tests.test_pileup import make_batch

EXONS = [(500, 700), (1200, 1400), (2000, 2200)]
SNV_POS = 1205        # 5bp into exon 2 (splice-junction adjacent)
DEL_POS = 1390        # 2bp deletion ending 8bp before the exon 2 end
DEL_LEN = 2
L = 3000


def _write_fasta(path, codes):
    seq = decode_bases(codes)
    with open(path, "w") as f:
        f.write(">t1\n")
        for i in range(0, len(seq), 70):
            f.write(seq[i:i + 70] + "\n")


def _tx_maps(exons):
    """transcript coordinate -> genomic position list."""
    gmap = []
    for b, e in exons:
        gmap.extend(range(b, e))
    return np.asarray(gmap, np.int64)


def _read_for(gmap, refs, t0, rl, mutate=None, deletion=None):
    """Build (gpos, cigar, seq) for a read over transcript [t0,t0+rl),
    with optional SNV {gpos: base} and an optional genomic deletion
    (del_start, del_len) carried in the cigar."""
    gpos_list = gmap[t0:t0 + rl]
    if deletion is not None:
        d0, dl = deletion
        gpos_list = gpos_list[(gpos_list < d0) | (gpos_list >= d0 + dl)]
        gpos_list = np.concatenate(
            [gpos_list, gmap[t0 + rl:t0 + rl + dl]]) \
            if len(gmap) >= t0 + rl + dl else gpos_list
    seq = []
    ops = []
    lens = []
    prev = None
    for g in gpos_list:
        base = refs[g]
        if mutate and g in mutate:
            base = mutate[g]
        seq.append(base)
        if prev is None:
            ops.append("M")
            lens.append(1)
        else:
            gap = g - prev - 1
            if gap == 0:
                if ops[-1] == "M":
                    lens[-1] += 1
                else:
                    ops.append("M")
                    lens.append(1)
            elif deletion is not None and prev < deletion[0] + deletion[1] \
                    and g >= deletion[0] + deletion[1] and gap == deletion[1]:
                ops.append("D")
                lens.append(gap)
                ops.append("M")
                lens.append(1)
            else:
                ops.append("N")
                lens.append(gap)
                ops.append("M")
                lens.append(1)
        prev = g
    cigar = "".join(f"{ln}{op}" for ln, op in zip(lens, ops))
    return int(gpos_list[0]), cigar, "".join(seq)


@pytest.fixture(scope="module")
def rna_setup(tmp_path_factory):
    rng = np.random.default_rng(17)
    codes = rng.integers(0, 4, L).astype(np.uint8)
    refs = decode_bases(codes)
    fa = tmp_path_factory.mktemp("rna") / "t.fa"
    _write_fasta(str(fa), codes)
    gmap = _tx_maps(EXONS)

    snv_alt = "ACGT"[(codes[SNV_POS] + 1) % 4]
    reads = []
    rl = 90
    tx_len = len(gmap)
    for i, t0 in enumerate(range(0, tx_len - rl - DEL_LEN, 4)):
        hap1 = i % 2 == 0
        mutate = {SNV_POS: snv_alt} if hap1 else None
        deletion = (DEL_POS, DEL_LEN) if hap1 else None
        # a third of the hap1 carriers arrive GAPLESS (the aligner
        # missed the deletion): realignment must recover them
        if hap1 and i % 6 == 4:
            gpos_list = gmap[t0:t0 + rl]
            seq = []
            for k, g in enumerate(gpos_list):
                src = g
                if g >= DEL_POS and g < EXONS[1][1]:
                    # bases shift left by DEL_LEN inside exon 2
                    src = g + DEL_LEN if g + DEL_LEN < EXONS[1][1] else g
                b = refs[src]
                if mutate and src in mutate:
                    b = mutate[src]
                seq.append(b)
            # gapless per-exon cigar (M segments joined by N)
            g0, cigar, _ = _read_for(gmap, refs, t0, rl)
            reads.append((g0, cigar, "".join(seq), [35] * rl, 0, 60))
            continue
        g0, cigar, seq = _read_for(gmap, refs, t0, rl, mutate, deletion)
        reads.append((g0, cigar, seq, [35] * len(seq), 0, 60))
    reads.sort(key=lambda r: r[0])
    batch = make_batch(reads)
    return str(fa), batch, snv_alt


def test_split_spliced_reads_roundtrip(rna_setup):
    _, batch, _ = rna_setup
    keep, level = rd.filter_and_classify_reads(batch, 20)
    kept = batch.select(keep)
    sb, sl, parent, segno = rd.split_spliced_reads(kept, level[keep])
    # every spliced read decomposed; segments sorted by pos; no SKIP
    assert (np.diff(sb.pos) >= 0).all()
    assert not (sb.cig_ops == cg.SKIP).any()
    assert sb.n > kept.n
    # aligned base content preserved: total M bases equal
    m_in = kept.cig_lens[np.isin(kept.cig_ops, (cg.MATCH,))].sum()
    m_out = sb.cig_lens[np.isin(sb.cig_ops, (cg.MATCH,))].sum()
    assert m_in == m_out
    # identity reassembly (no realignment) restores the input cigars
    rb = rd.reassemble_spliced(sb, parent, segno, kept)
    assert (rb.pos == kept.pos).all()
    assert np.array_equal(rb.cig_ops, kept.cig_ops)
    assert np.array_equal(rb.cig_lens, kept.cig_lens)


def test_junction_adjacent_variants_called(rna_setup):
    fa, batch, snv_alt = rna_setup
    ref = FastaReference(fa)
    opt = GermlineOptions(het_variant_frequency_extension=0.45,
                          retain_optimal_soft_clipping=True)
    result = gc.call_region(opt, ref, "t1", 0, L, [batch],
                            collect_realigned=True)
    # the junction-adjacent het SNV is genotyped from the segment pileup
    from strelka_tpu.models import digt
    s = result.samples[0]
    gt = int(np.asarray(s.snv.genome_max_gt)[SNV_POS])
    pair = digt.ALLELES[gt]
    assert set(pair) == {int(batch.seq[0]) * 0 + "ACGT".index(snv_alt),
                        int(ref.fetch("t1", SNV_POS, SNV_POS + 1)[0])} \
        or digt.LABELS[gt] in ("AC", "AG", "AT", "CG", "CT", "GT")
    # the deletion adjacent to the exon end is a called candidate
    called = [c for c in result.indels
              if any(k.pos == DEL_POS and k.delete_length == DEL_LEN
                     for k in c.keys)]
    assert called, [c.keys for c in result.indels]
    # zero segment-boundary loss: the locus genotypes non-ref with
    # believable alt support (gapless carriers recovered by realignment)
    c = called[0]
    assert c.sample_gt[0] != 0
    ad_alt = int(np.asarray(c.sample_ad[0])[1:].sum())
    assert ad_alt >= 8, ad_alt

    # realigned-BAM reassembly: spliced reads still spliced, deletion
    # carriers now carry 2D inside exon 2, and every read keeps its
    # read-length worth of M+I+S ops
    keep_idx, rb = result.realigned[0]
    assert (rb.cig_ops == cg.SKIP).any()
    n_with_del = 0
    for r in range(rb.n):
        o, l = rb.get_cigar(r)
        rl_ops = int(l[cg.ADVANCES_READ[o.astype(np.int64)] > 0].sum())
        assert rl_ops == rb.read_len(r)
        if (o == cg.DELETE).any():
            n_with_del += 1
    assert n_with_del >= 10


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
