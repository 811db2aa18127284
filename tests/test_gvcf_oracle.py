"""Scalar oracle transcriptions of the reference gVCF decision logic
vs the vectorized/native production paths, plus synthetic e2e cases
for the round-1 germline parity divergences:

  (a) non-compressable hom-ref sites emit FULL site records
      (gvcf_writer.cpp:446 write_site_record_instance) to the variants
      VCF and every sample gVCF;
  (b) germline indel records carry the MQ INFO key and the HighDepth
      filter (gvcf_writer.cpp:902-922, ScoringModelManager.cpp:365);
  (c) hom-ref sites inside genotyped deletions apply the
      deletion-overlap ploidy reduction (starling_pos_processor.cpp
      :1213-1243 decrementSpanningIndelPloidy + :644-651);
  (d) site HighDepth tests the pooled all-sample mapq-tracker depth
      (ScoringModelManager.cpp:293-299), not per-sample dp+dpf.
"""
import numpy as np
import pytest

from strelka_tpu.io.fasta import FastaReference, decode_bases
from strelka_tpu.options import GermlineOptions
from strelka_tpu.pipeline import germline_caller as gc
from strelka_tpu.pipeline import gvcf

from tests.test_pileup import make_batch


# ---------------------------------------------------------------------------
# oracle transcriptions
# ---------------------------------------------------------------------------

def _check_block_tolerance_oracle(values, frac_tol, abs_tol):
    """Literal transcription of gvcf_block_site_record.cpp
    check_block_tolerance over a stream_stat holding `values`."""
    import math
    mn = int(math.floor(min(values) + 0.5))  # compat_round of the min
    mx = max(values)

    def single(tol):
        return (mn + tol) >= mx / 2.0

    if single(abs_tol):
        return True
    ftol = int(math.floor(mn * frac_tol))
    if ftol <= abs_tol:
        return False
    return single(ftol)


def test_blockable_matches_tolerance_oracle():
    rng = np.random.default_rng(7)
    for _ in range(3000):
        vals = rng.integers(0, 60, size=rng.integers(2, 6)).tolist()
        lo, hi = min(vals[:-1]), max(vals[:-1])
        got = gvcf._blockable(lo, hi, vals[-1], 3, 0.3)
        exp = _check_block_tolerance_oracle(vals, 0.3, 3)
        assert got == exp, vals


def test_native_block_compressor_matches_python_oracle():
    """block_compress_run2 vs the _DiploidBlock scalar loop on random
    key/gqx/dp/dpf streams (including gqx-undefined spans)."""
    from strelka_tpu.io import native as natio
    if not hasattr(natio.get_lib() or object(), "block_compress_run2"):
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(11)
    for trial in range(40):
        L = int(rng.integers(5, 400))
        # small key alphabet so runs of equal keys occur
        keys = rng.choice(
            [gvcf._pack_key(0, 0, 0, 2, 1, 1, 1),
             gvcf._pack_key(0, 1, 0, 2, 1, 1, 1),
             gvcf._pack_key(0, 0, 2, 2, 0, 0, 0),   # uncovered
             gvcf._pack_key(0, 0, 1, 1, 1, 1, 1)],  # haploid
            size=L).astype(np.int64)
        gqx = rng.integers(0, 60, L).astype(np.int32)
        dp = rng.integers(0, 40, L).astype(np.int32)
        dpf = rng.integers(0, 6, L).astype(np.int32)
        out = np.empty((L, 7), np.int64)
        n = natio.block_compress_run2(keys, gqx, dp, dpf, 0, L, 3, 0.3, out)
        native_rows = [tuple(r) for r in out[:n].tolist()]
        b = gvcf._DiploidBlock()
        py_rows = []
        for t in range(L):
            if not b.can_join(int(keys[t]), int(gqx[t]), int(dp[t]),
                              int(dpf[t]), 3, 0.3):
                py_rows.append(b.flush_row())
            b.add(t, int(keys[t]), int(gqx[t]), int(dp[t]), int(dpf[t]))
        row = b.flush_row()
        if row is not None:
            py_rows.append(row)
        assert native_rows == py_rows, trial


def _get_site_alt_alleles_oracle(ref_gt, sample_counts, sample_ploidy,
                                 sample_gts):
    """Literal transcription of getSiteAltAlleles
    (starling_pos_processor.cpp:508-616)."""
    from strelka_tpu.models import digt
    N = 4
    allele_rank = [0] * N
    for counts, ploidy in zip(sample_counts, sample_ploidy):
        c = [float(x) for x in counts]
        min_count = max(1, int(sum(c) * 0.10))
        for ploidy_index in range(ploidy):
            mx = 0
            for b in range(1, N):
                if c[b] > c[mx]:
                    mx = b
            if c[mx] >= min_count:
                allele_rank[mx] += (2 - ploidy_index)
            c[mx] = 0
    is_added = [b == ref_gt for b in range(N)]
    alts = []
    while True:
        mx = 0
        for b in range(1, N):
            if allele_rank[b] > allele_rank[mx]:
                mx = b
        if allele_rank[mx] == 0:
            break
        allele_rank[mx] = 0
        if mx == ref_gt:
            continue
        alts.append(mx)
        is_added[mx] = True
    for (poly_gt, genome_gt), ploidy in zip(sample_gts, sample_ploidy):
        for gt in (poly_gt, genome_gt):
            for chrom_index in range(ploidy):
                b = int(digt.ALLELES[gt][chrom_index])
                if not is_added[b]:
                    alts.append(b)
                    is_added[b] = True
    return alts


def test_alt_nomination_matches_oracle():
    rng = np.random.default_rng(3)
    for _ in range(500):
        n_samples = int(rng.integers(1, 4))
        L = 8
        counts = [rng.integers(0, 30, (L, 4)) for _ in range(n_samples)]
        cps = [rng.choice([1, 2], L) for _ in range(n_samples)]
        dps = [c.sum(axis=1) for c in counts]
        gts = [rng.integers(0, 10, (L, 2)) for _ in range(n_samples)]
        rank = gvcf.compute_alt_ranks(counts, dps, cps)
        for i in range(L):
            ref_gt = int(rng.integers(0, 4))
            got = gvcf.nominate_site_alts(
                rank[i].tolist(), ref_gt,
                [(int(gts[s][i, 0]), int(gts[s][i, 1]), int(cps[s][i]))
                 for s in range(n_samples)])
            exp = _get_site_alt_alleles_oracle(
                ref_gt, [counts[s][i] for s in range(n_samples)],
                [int(cps[s][i]) for s in range(n_samples)],
                [(int(gts[s][i, 0]), int(gts[s][i, 1]))
                 for s in range(n_samples)])
            assert got == exp


# ---------------------------------------------------------------------------
# synthetic e2e cases
# ---------------------------------------------------------------------------

def _write_fasta(path, codes):
    seq = decode_bases(codes)
    with open(path, "w") as f:
        f.write(">t1\n")
        for i in range(0, len(seq), 70):
            f.write(seq[i:i + 70] + "\n")


def _region_with_deletion(tmp_path, n_del_reads, n_ref_reads, seed=5,
                          n_inner_reads=0, dlen=8):
    """Reads over a 2kb contig with a deletion at pos 1000.
    `n_inner_reads` short reads sit FULLY INSIDE the deletion span:
    they pile up basecalls there but never span a breakpoint, so they
    don't vote in the indel genotype (breakpoint-overlap read
    selection)."""
    rng = np.random.default_rng(seed)
    L = 2000
    codes = rng.integers(0, 4, L).astype(np.uint8)
    refs = decode_bases(codes)
    fa = tmp_path / "t.fa"
    _write_fasta(str(fa), codes)
    ref = FastaReference(str(fa))
    p, rl = 1000, 100
    reads = []
    for k in range(n_del_reads):
        st = p - 60 + 3 * k
        m1 = p - st
        m2 = rl - m1
        seq = refs[st:p] + refs[p + dlen:p + dlen + m2]
        reads.append((st, f"{m1}M{dlen}D{m2}M", seq, [35] * rl, 0, 60))
    for k in range(n_ref_reads):
        st = p - 65 + 5 * k
        reads.append((st, f"{rl}M", refs[st:st + rl], [35] * rl, 0, 60))
    for k in range(n_inner_reads):
        st = p + 2 + k
        rli = dlen - 8
        assert st + rli < p + dlen
        reads.append((st, f"{rli}M", refs[st:st + rli], [35] * rli, 0, 60))
    reads.sort(key=lambda r: r[0])
    batch = make_batch(reads)
    opt = GermlineOptions()
    res = gc.call_region(opt, ref, "t1", 0, L, [batch])
    return opt, res, p, dlen


def test_homref_sites_under_het_deletion_are_haploid(tmp_path):
    """(c): a het genotyped deletion reduces site ploidy to 1 over its
    span — hom-ref records there print haploid GT '0'."""
    opt, res, p, dlen = _region_with_deletion(tmp_path, 10, 10)
    dels = [c for c in res.indels if c.keys[0].delete_length == 8]
    assert dels and dels[0].sample_gt[0] > 0
    key = dels[0].keys[0]
    sd = res.samples[0]
    span = slice(key.pos, key.right_pos)
    assert (sd.group_ploidy[span] == 1).all()
    assert (sd.caller_ploidy[span] == 1).all()
    assert not sd.homalt_del[span].any()
    glines, _v = gvcf.emit_region(opt, res, ["S"])
    for line in glines[0]:
        f = line.split("\t")
        pos0 = int(f[1]) - 1
        if f[4] == "." and key.pos <= pos0 < key.right_pos:
            assert f[9].split(":")[0] == "0", line


def test_homref_sites_under_homalt_deletion_unknown_gt(tmp_path):
    """(c): a hom-alt deletion zeroes site ploidy over its span —
    covered hom-ref records there print GT '.' with GQX '.'
    (isOverlappingHomAltDeletion -> is_gqx false)."""
    opt, res, p, dlen = _region_with_deletion(tmp_path, 20, 0,
                                              n_inner_reads=5, dlen=30)
    dels = [c for c in res.indels if c.keys[0].delete_length == 30]
    assert dels, [c.keys for c in res.indels]
    from strelka_tpu.models.indel_genotype import genotype_alleles
    ga = genotype_alleles(2, len(dels[0].keys) + 1)
    assert tuple(ga[dels[0].sample_gt[0]]) == (1, 1), "needs hom-alt GT"
    key = dels[0].keys[0]
    sd = res.samples[0]
    span = slice(key.pos, key.right_pos)
    assert (sd.group_ploidy[span] == 0).all()
    assert sd.homalt_del[span].all()
    glines, _v = gvcf.emit_region(opt, res, ["S"])
    span_lines = []
    for line in glines[0]:
        f = line.split("\t")
        pos0 = int(f[1]) - 1
        if f[4] == "." and key.pos <= pos0 < key.right_pos:
            span_lines.append(f)
    assert span_lines
    for f in span_lines:
        col = f[9].split(":")
        assert col[0] == ".", f
        assert col[1] == ".", f  # GQX undefined inside hom-alt deletion


def _two_sample_region(tmp_path, depth=20, seed=9):
    rng = np.random.default_rng(seed)
    L = 1500
    codes = rng.integers(0, 4, L).astype(np.uint8)
    refs = decode_bases(codes)
    fa = tmp_path / "t.fa"
    _write_fasta(str(fa), codes)
    ref = FastaReference(str(fa))
    rl = 100
    batches = []
    for s in range(2):
        reads = []
        # depth-targeted tiling: one read every rl/depth positions
        stride = max(1, rl // depth)
        for st in range(0, L - rl, stride):
            reads.append((st, f"{rl}M", refs[st:st + rl], [35] * rl, 0, 60))
        batches.append(make_batch(reads))
    opt = GermlineOptions()
    res = gc.call_region(opt, ref, "t1", 0, L, batches)
    return opt, res


def test_pooled_highdepth_filter(tmp_path):
    """(d): HighDepth fires on the pooled all-sample read depth. Each
    sample is ~20x; chrom depth 12 puts the 3x threshold at 36 —
    above either sample alone but below their 40x sum."""
    def homref_covering(glines, lo, hi):
        """hom-ref records whose span intersects [lo, hi] (1-based)."""
        out = []
        for l in glines:
            f = l.split("\t")
            if f[4] != ".":
                continue
            pos = int(f[1])
            end = pos
            for kv in f[7].split(";"):
                if kv.startswith("END="):
                    end = int(kv[4:])
            if pos <= hi and end >= lo:
                out.append(f)
        return out

    opt, res = _two_sample_region(tmp_path, depth=20)
    glines, _v = gvcf.emit_region(opt, res, ["S1", "S2"], chrom_depth=12.0)
    deep = homref_covering(glines[0], 400, 900)
    assert deep
    assert all("HighDepth" in f[6] for f in deep), deep[0]
    # per-sample depth alone (~20 < 3*26=78) must NOT trigger it:
    # pooled 40 < 78 -> no HighDepth anywhere
    glines1, _ = gvcf.emit_region(opt, res, ["S1", "S2"], chrom_depth=26.0)
    assert not [f for f in homref_covering(glines1[0], 400, 900)
                if "HighDepth" in f[6]]


def test_indel_record_mq_and_highdepth(tmp_path):
    """(b): indel records carry ;MQ= (pooled RMS mapq at the preceding
    position) and the HighDepth filter from the pooled depth."""
    opt, res, p, dlen = _region_with_deletion(tmp_path, 10, 10)
    glines, vlines = gvcf.emit_region(opt, res, ["S"], chrom_depth=2.0)
    indel = [l for l in vlines if "\t" + str(p) + "\t" in l and "CIGAR" in l]
    assert indel, vlines[:5]
    f = indel[0].split("\t")
    assert ";MQ=60" in f[7], f[7]
    assert "HighDepth" in f[6], f[6]
    # without a chrom depth (exome mode) HighDepth must be absent
    _g, v2 = gvcf.emit_region(opt, res, ["S"])
    f2 = next(l for l in v2 if "CIGAR" in l).split("\t")
    assert "HighDepth" not in f2[6]
    assert ";MQ=60" in f2[7]


def test_nocompress_sites_emit_full_records(tmp_path):
    """(a): nocompress-bed positions emit full site records — real
    GT/GQ/GQX/DP/DPF/FT columns with SNVHPOL+MQ INFO — to the sample
    gVCF AND the variants VCF (write_site_record writes both), not
    fake one-site blocks with hardcoded GT 0/0 + MIN_DP."""
    opt, res = _two_sample_region(tmp_path, depth=20)
    nocomp = np.zeros(1500, bool)
    nocomp[700:703] = True
    glines, vlines = gvcf.emit_region(opt, res, ["S1", "S2"],
                                      nocompress_mask=nocomp)
    recs = [l.split("\t") for l in glines[0] if int(l.split("\t")[1])
            in (701, 702, 703)]
    assert len(recs) == 3
    for f in recs:
        assert f[8] == "GT:GQ:GQX:DP:DPF:FT", f
        assert "SNVHPOL=" in f[7] and "MQ=" in f[7], f
        col = f[9].split(":")
        assert col[0] == "0/0"
        assert col[1] != "." and col[2] != "."  # real GQ/GQX
        assert int(col[3]) > 0
        assert f[5] == "."  # QUAL undefined for hom-ref loci
    # the same records appear in the variants VCF, flagged
    # NoPassedVariantGTs (no variant genotypes pass)
    vrecs = [l.split("\t") for l in vlines if int(l.split("\t")[1])
             in (701, 702, 703)]
    assert len(vrecs) == 3
    for f in vrecs:
        assert "NoPassedVariantGTs" in f[6], f
        assert len(f) == 11  # both sample columns


def test_nocompress_uncovered_site_unknown_gt(tmp_path):
    """(a): an uncovered nocompress position prints GT '.' with
    GQ/GQX '.:.' (empty-site semantics through
    write_site_record_instance)."""
    rng = np.random.default_rng(2)
    L = 600
    codes = rng.integers(0, 4, L).astype(np.uint8)
    refs = decode_bases(codes)
    fa = tmp_path / "t.fa"
    _write_fasta(str(fa), codes)
    ref = FastaReference(str(fa))
    rl = 100
    reads = [(st, f"{rl}M", refs[st:st + rl], [35] * rl, 0, 60)
             for st in range(0, 150, 10)]  # coverage only at the start
    batch = make_batch(reads)
    opt = GermlineOptions()
    res = gc.call_region(opt, ref, "t1", 0, L, [batch])
    nocomp = np.zeros(L, bool)
    nocomp[500] = True
    glines, _v = gvcf.emit_region(opt, res, ["S"], nocompress_mask=nocomp)
    rec = next(l.split("\t") for l in glines[0]
               if l.split("\t")[1] == "501")
    assert rec[4] == "."
    col = rec[9].split(":")
    assert col[0] == "." and col[1] == "." and col[2] == "."
    assert col[3] == "0"
    # uncovered -> LowGQX only (empty sites skip the prefilter, so no
    # LowDepth: gvcf_writer ctor classify_site(_empty_site))
    assert rec[6] == "LowGQX", rec


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
