"""gVCF writer branch-coverage campaign (VERDICT r2 #3).

Each test pins one decision branch of the reference's
gvcf_writer.cpp / ScoringModelManager.cpp / VariantOverlapResolver.cpp
named in docs/gvcf_oracle_coverage.md, either against a scalar oracle
transcription or through a synthetic e2e record check.
"""
import gzip
import math
import os

import numpy as np
import pytest

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


# ---------------------------------------------------------------------------
# block compressor + formatter differential fuzz
# ---------------------------------------------------------------------------

def test_fuzz_blocks_native_vs_python():
    """Randomized differential fuzz: native block_compress_run2 rows
    AND native block_format_lines text must match the Python
    _DiploidBlock oracle + _block_line byte-for-byte across random
    key/gqx/dp/dpf streams (including exact-tolerance boundaries)."""
    from strelka_tpu.io import native as natio
    lib = natio.get_lib()
    if lib is None or not hasattr(lib, "block_compress_run2"):
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(42)
    fblob, foff = gvcf._fstr_table()
    for trial in range(25):
        L = int(rng.integers(1, 400))
        # few distinct keys -> long joinable runs; include gqxdef tag
        keys = rng.integers(0, 4, L).astype(np.int64)
        keymap = rng.integers(0, 1 << 13, 4).astype(np.int64)
        # gt code (bits 8-9) only takes 0..2 in production keys
        keymap = (keymap & ~(np.int64(3) << 8)) | (
            rng.integers(0, 3, 4).astype(np.int64) << 8)
        key = keymap[keys] | (rng.integers(0, 2, L).astype(np.int64) << 14)
        # small value ranges make tolerance boundaries common
        gqx = rng.integers(0, 8, L).astype(np.int32)
        dp = rng.integers(0, 6, L).astype(np.int32)
        dpf = rng.integers(0, 3, L).astype(np.int32)
        abs_tol = int(rng.integers(0, 4))
        frac_tol = float(rng.choice([0.0, 0.2, 0.3]))
        out = np.empty((L, 7), np.int64)
        n_rows = natio.block_compress_run2(key, gqx, dp, dpf, 0, L,
                                           abs_tol, frac_tol, out)
        # Python oracle
        b = gvcf._DiploidBlock()
        rows = []
        kl, gl, dl, fl = key.tolist(), gqx.tolist(), dp.tolist(), dpf.tolist()
        for t in range(L):
            if not b.can_join(kl[t], gl[t], dl[t], fl[t], abs_tol, frac_tol):
                rows.append(b.flush_row())
            b.add(t, kl[t], gl[t], dl[t], fl[t])
        last = b.flush_row()
        if last is not None:
            rows.append(last)
        assert n_rows == len(rows), (trial, n_rows, len(rows))
        np.testing.assert_array_equal(out[:n_rows],
                                      np.asarray(rows, np.int64))
        # formatter vs _block_line
        ref_codes = rng.integers(0, 5, L).astype(np.uint8)
        ref_list = ref_codes.tolist()
        begin = int(rng.integers(0, 10_000))
        buf = np.empty(max(n_rows, 1) * 160, np.uint8)
        m = natio.block_format_lines_native(
            out, n_rows, begin, ref_codes, b"chrT", b"LBL", fblob, foff,
            buf)
        assert m is not None and m >= 0
        got = buf[:m].tobytes().decode("ascii").splitlines()
        want = [gvcf._block_line("chrT", begin, "ACGTN", ref_list, "LBL",
                                tuple(r)) for r in rows]
        assert got == want, trial


# ---------------------------------------------------------------------------
# ScoringModelManager default classifiers
# ---------------------------------------------------------------------------

def default_classify_site_oracle(opt, gqx, sb, dp, dpf, is_variant,
                                 pooled_depth, hpol, ad_sum, chrom_depth):
    """Literal transcription of ScoringModelManager::
    default_classify_site (:272-328) + applyDepthFilter (:234-249)."""
    f = set()
    if is_variant:
        if gqx < opt.gvcf_min_gqx:
            f.add("LowGQX")
    else:
        if gqx < opt.gvcf_min_homref_gqx:
            f.add("LowGQX")
    if chrom_depth is not None and pooled_depth > opt.max_depth_factor * chrom_depth:
        f.add("HighDepth")
    total = dp + dpf
    if total > 0 and dpf / total > 0.4:
        f.add("HighDPFRatio")
    if is_variant:
        if opt.gvcf_max_snv_hpol is not None and hpol > opt.gvcf_max_snv_hpol:
            f.add("HighSNVHPOL")
        if sb > opt.gvcf_max_snv_strand_bias:
            f.add("HighSNVSB")
    if dp < opt.gvcf_min_passed_call_depth or ad_sum < opt.gvcf_min_passed_call_depth:
        f.add("LowDepth")
    return f


def test_default_classify_site_oracle():
    opt = GermlineOptions()
    rng = np.random.default_rng(1)
    cases = 0
    for hpol_lim in (None, 6):
        opt.gvcf_max_snv_hpol = hpol_lim
        for _ in range(200):
            gqx = int(rng.integers(0, 60))
            sb = float(rng.uniform(-20, 20))
            dp = int(rng.integers(0, 40))
            dpf = int(rng.integers(0, 20))
            hpol = int(rng.integers(1, 12))
            pooled = int(rng.integers(0, 200))
            ad_sum = int(rng.integers(0, dp + 1))
            cd = float(rng.choice([0.0, 20.0]))
            cd_arg = cd if cd else None
            is_var = bool(rng.integers(0, 2))
            got = set(gvcf._site_sample_filters(
                opt, gqx, sb, dp, dpf, is_var, cd_arg, ad_sum=ad_sum,
                pooled_depth=pooled, hpol=hpol))
            want = default_classify_site_oracle(
                opt, gqx, sb, dp, dpf, is_var, pooled, hpol, ad_sum,
                cd_arg)
            assert got == want, (got, want)
            cases += 1
    assert cases == 400
    opt.gvcf_max_snv_hpol = None


def test_high_ref_rep_oracle(tmp_path):
    """default_classify_indel HighRefRep (:369-387): repeat-unit length
    <= 2 gate + refRepeatCount threshold, applied per indel allele."""
    from strelka_tpu.pipeline import candidates as cand
    opt = GermlineOptions()
    opt.gvcf_max_ref_rep = 8

    def mk_call(ru, refrep):
        key = cand.IndelKey(100, len(ru), "")
        rec = cand.IndelRecord(key=key, samples=[], repeat_unit=ru,
                               ref_repeat_count=refrep,
                               indel_repeat_count=refrep - 1)
        return gc.IndelCall(
            pos=100, keys=[key], records=[rec],
            sample_gt=[1], sample_gq=[30], sample_gqx=[30],
            sample_pl=[np.zeros(3, np.int64)],
            sample_ad=[np.array([5, 5])], sample_adf=[np.array([3, 2])],
            sample_adr=[np.array([2, 3])], sample_dpi=[10],
            sample_ploidy=[2], sample_edge_dist=[10.0])

    try:
        # ru len 1, count over limit -> filtered
        m = gvcf._indel_filters(opt, None, mk_call("A", 9), 1)
        assert "HighRefRep" in m["sample_fsets"][0]
        # at the limit -> not filtered
        m = gvcf._indel_filters(opt, None, mk_call("A", 8), 1)
        assert "HighRefRep" not in m["sample_fsets"][0]
        # ru len 3 is exempt regardless of count (:380)
        m = gvcf._indel_filters(opt, None, mk_call("ACT", 30), 1)
        assert "HighRefRep" not in m["sample_fsets"][0]
    finally:
        opt.gvcf_max_ref_rep = None


# ---------------------------------------------------------------------------
# record-shape branches via synthetic e2e
# ---------------------------------------------------------------------------

def _simple_region(tmp_path, reads_fn, L=600, seed=3):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 4, L).astype(np.uint8)
    refs = decode_bases(codes)
    fa = tmp_path / "t.fa"
    _write_fasta(str(fa), codes)
    ref = FastaReference(str(fa))
    reads = reads_fn(refs)
    reads.sort(key=lambda r: r[0])
    batch = make_batch(reads)
    opt = GermlineOptions()
    res = gc.call_region(opt, ref, "t1", 0, L, [batch])
    return opt, res


def test_pl_clamped_at_999(tmp_path):
    """maxPL clamp (gvcf_writer.cpp:632 site, :1007 indel): very deep
    hom-alt coverage drives the ref-genotype PL past 999; the printed
    value must cap there."""
    def reads(refs):
        rl = 80
        out = []
        # deep enough that PL(ref) passes 999 even with the dependent
        # eprob adjustment saturating per-call mismatch penalties
        for k in range(300):
            st = 140 + (k % 40)
            seq = list(refs[st:st + rl])
            p = 200 - st
            seq[p] = "A" if refs[200] != "A" else "C"
            out.append((st, f"{rl}M", "".join(seq), [40] * rl, 0, 60))
        return out

    opt, res = _simple_region(tmp_path, reads)
    _g, v = gvcf.emit_region(opt, res, ["S"])
    rec = [l for l in v if l.split("\t")[1] == "201"]
    assert rec, v
    fields = rec[0].split("\t")
    fmt = fields[8].split(":")
    pl = fields[9].split(":")[fmt.index("PL")].split(",")
    assert "999" in pl, rec[0]
    assert all(int(x) <= 999 for x in pl)


def test_ru_dot_when_over_20(tmp_path):
    """RU prints '.' when the repeat unit exceeds 20 bases while
    REFREP/IDREP still print counts (gvcf_writer.cpp:860-903)."""
    ins = "ACGTACGTTGCATGCATGAAC"  # 21bp non-repeating insertion
    assert len(ins) == 21

    def reads(refs):
        rl = 80
        out = []
        for k in range(30):
            st = 150 + k
            m1 = 200 - st
            seq = refs[st:200] + ins + refs[200:200 + rl - m1 - len(ins)]
            out.append((st, f"{m1}M{len(ins)}I{rl - m1 - len(ins)}M",
                        seq[:rl], [38] * rl, 0, 60))
        for k in range(10):
            st = 130 + k
            out.append((st, "80M", refs[st:st + 80], [38] * 80, 0, 60))
        return out

    opt, res = _simple_region(tmp_path, reads)
    _g, v = gvcf.emit_region(opt, res, ["S"])
    rec = [l for l in v if "RU=" in l and f"{len(ins)}I" in l]
    assert rec, v
    info = rec[0].split("\t")[7]
    assert "RU=.;" in info, info
    # non-repeating 21bp unit: 0 reference copies, 1 indel copy
    assert "REFREP=0;IDREP=1" in info, info


def test_site_mq_pooled_rms(tmp_path):
    """Site MQ pools the mapq tracker over ALL samples and prints the
    rounded RMS (gvcf_writer.cpp:495-506)."""
    def reads_a(refs):
        return [(100 + k, "80M", refs[100 + k:180 + k], [38] * 80, 0, 60)
                for k in range(20)]

    def reads_b(refs):
        return [(100 + k, "80M", refs[100 + k:180 + k], [38] * 80, 0, 20)
                for k in range(20)]

    rng = np.random.default_rng(3)
    L = 600
    codes = rng.integers(0, 4, L).astype(np.uint8)
    refs = decode_bases(codes)
    fa = tmp_path / "t.fa"
    _write_fasta(str(fa), codes)
    ref = FastaReference(str(fa))
    # plant a variant so position 150 emits a full record: sample A
    # reads carry an alt base at ref pos 150
    ra = []
    for st, cg, seq, q, fl, mq in reads_a(refs):
        s = list(seq)
        p = 150 - st
        if 0 <= p < len(s):
            s[p] = "A" if refs[150] != "A" else "C"
        ra.append((st, cg, "".join(s), q, fl, mq))
    batch_a = make_batch(sorted(ra, key=lambda r: r[0]))
    batch_b = make_batch(sorted(reads_b(refs), key=lambda r: r[0]))
    opt = GermlineOptions()
    res = gc.call_region(opt, ref, "t1", 0, L, [batch_a, batch_b])
    _g, v = gvcf.emit_region(opt, res, ["A", "B"])
    rec = [l for l in v if l.split("\t")[1] == "151"]
    assert rec, v
    info = rec[0].split("\t")[7]
    mq_str = [kv for kv in info.split(";") if kv.startswith("MQ=")][0]
    # oracle: counts of mapq over covering reads of both samples
    n_a = sum(1 for st, *_ in ra if st <= 150 < st + 80)
    n_b = sum(1 for st, *_ in reads_b(refs) if st <= 150 < st + 80)
    rms = math.sqrt((n_a * 60.0 ** 2 + n_b * 20.0 ** 2) / (n_a + n_b))
    assert mq_str == f"MQ={int(math.floor(rms + 0.5))}", (mq_str, rms)


def test_phased_snvs_emit_ps(tmp_path):
    """Read-backed phasing: two het SNVs on the same haplotype inside
    one active region emit phased GTs '0|1' with a shared PS tag
    (gvcf_writer.cpp:547-561,:637-649; VariantPhaser semantics)."""
    def reads(refs):
        rl = 80
        p1, p2 = 200, 206
        out = []
        for k in range(30):
            st = 150 + k
            seq = list(refs[st:st + rl])
            if k % 2 == 0:  # haplotype with both alts
                seq[p1 - st] = "A" if refs[p1] != "A" else "C"
                seq[p2 - st] = "A" if refs[p2] != "A" else "C"
            out.append((st, f"{rl}M", "".join(seq), [38] * rl, 0, 60))
        return out

    opt, res = _simple_region(tmp_path, reads)
    _g, v = gvcf.emit_region(opt, res, ["S"])
    phased = [l for l in v if "|" in l.split("\t")[9].split(":")[0]]
    assert len(phased) >= 2, v
    ps_vals = set()
    for l in phased:
        f = l.split("\t")
        fmt = f[8].split(":")
        assert "PS" in fmt, l
        ps_vals.add(f[9].split(":")[fmt.index("PS")])
    assert len(ps_vals) == 1  # same phase set


def test_filter_intersection_promoted_to_locus(tmp_path):
    """getExtendedLocusFilters (:329-353): sample filters present in
    EVERY sample are promoted to the locus FILTER of the variants VCF;
    non-shared ones are not."""
    from strelka_tpu.pipeline import candidates as cand
    rng = np.random.default_rng(4)
    L = 400
    codes = rng.integers(0, 4, L).astype(np.uint8)
    fa = tmp_path / "t.fa"
    _write_fasta(str(fa), codes)

    key = cand.IndelKey(100, 2, "")
    rec = cand.IndelRecord(key=key, samples=[], repeat_unit="A",
                           ref_repeat_count=1, indel_repeat_count=1)

    def mk_call():
        return gc.IndelCall(
            pos=100, keys=[key], records=[rec],
            sample_gt=[1, 1], sample_gq=[8, 35], sample_gqx=[8, 35],
            sample_pl=[np.zeros(3, np.int64)] * 2,
            sample_ad=[np.array([4, 4])] * 2,
            sample_adf=[np.array([2, 2])] * 2,
            sample_adr=[np.array([2, 2])] * 2,
            sample_dpi=[8, 8], sample_ploidy=[2, 2],
            sample_edge_dist=[10.0, 10.0])

    opt = GermlineOptions()
    ref = FastaReference(str(fa))
    refs = decode_bases(codes)
    dummy = [(50, "60M", refs[50:110], [38] * 60, 0, 60)]
    res = gc.call_region(opt, ref, "t1", 0, L,
                         [make_batch(dummy), make_batch(dummy)])
    call = mk_call()
    meta = {"locus_fset": set(),
            "sample_fsets": [{"LowGQX", "LowDepth"}, {"LowDepth"}],
            "gqx_out": [8, 35], "is_var_gt": [True, True]}
    g = [[], []]
    v = []
    gvcf._emit_indel(opt, res, call, ["A", "B"], g, v, meta)
    fcol = v[0].split("\t")[6]
    assert "LowDepth" in fcol          # in both samples -> promoted
    assert "LowGQX" not in fcol        # only sample A -> not promoted
    assert "NoPassedVariantGTs" in fcol
    # per-sample gVCFs carry their own filters
    assert "LowGQX" in g[0][0].split("\t")[6]
    assert "LowGQX" not in g[1][0].split("\t")[6]


def test_forced_complex_allele_not_genotyped(tmp_path):
    """Forced-GT complex (swap) alleles cannot be genotyped
    (IndelBuffer.cpp:115-129): the record is emitted with the
    NotGenotyped filter, MQ=., D-before-I CIGAR, and all-dot sample
    columns (variant_prefilter_stage.cpp:83-91,
    gvcf_writer.cpp:907-922,:1025-1054)."""
    rng = np.random.default_rng(5)
    L = 400
    codes = rng.integers(0, 4, L).astype(np.uint8)
    refs = decode_bases(codes)
    fa = tmp_path / "t.fa"
    _write_fasta(str(fa), codes)

    # forced swap at 1-based pos 100: REF=ref[99:102], ALT=anchor + GG
    anchor = refs[99]
    ref_field = refs[99:102]
    alt = anchor + "GG"
    if alt == ref_field:
        alt = anchor + "CC"
    fvcf = tmp_path / "forced.vcf"
    fvcf.write_text(
        "##fileformat=VCFv4.1\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        f"t1\t100\t.\t{ref_field}\t{alt}\t.\t.\t.\n")

    reads = [(60 + k, "80M", refs[60 + k:140 + k], [38] * 80, 0, 60)
             for k in range(10)]
    batch = make_batch(reads)
    opt = GermlineOptions()
    ref = FastaReference(str(fa))
    res = gc.call_region(opt, ref, "t1", 0, L, [batch],
                         forced_gt_vcfs=[str(fvcf)])
    ng = [c for c in res.indels if c.not_genotyped]
    assert len(ng) == 1
    _g, v = gvcf.emit_region(opt, res, ["S"])
    rec = [l for l in v if l.split("\t")[1] == "100"]
    assert rec, v
    f = rec[0].split("\t")
    assert f[3] == ref_field and f[4] == alt
    assert "NotGenotyped" in f[6]
    info = f[7]
    assert "MQ=." in info
    assert "RU=.;REFREP=.;IDREP=." in info
    assert "2D2I" in info  # D before I (gvcfAlleleInfo.cpp:77-95)
    assert f[9].startswith(".:.:.:.:.:.:.:")
    assert f[9].endswith(":.")


def test_adjacent_indels_interact(tmp_path):
    """Two ADJACENT variant indels (deletion end == insertion pos;
    VariantOverlapResolver.cpp:88-96 treats pos == end as interacting)
    must both be emitted — jointly genotyped or conflict-marked, never
    silently dropped."""
    def reads(refs):
        rl = 80
        p, dlen = 200, 3
        out = []
        for k in range(25):
            st = 150 + k
            m1 = p - st
            seq = refs[st:p] + refs[p + dlen:p + dlen + rl - m1]
            out.append((st, f"{m1}M{dlen}D{rl - m1}M", seq[:rl],
                        [38] * rl, 0, 60))
        for k in range(25):
            st = 152 + k
            m1 = p + dlen - st
            seq = refs[st:p + dlen] + "TT" + refs[p + dlen:p + dlen + rl]
            out.append((st, f"{m1}M2I{rl - m1 - 2}M", seq[:rl],
                        [38] * rl, 0, 60))
        for k in range(10):
            st = 150 + k
            out.append((st, "80M", refs[st:st + 80], [38] * 80, 0, 60))
        return out

    opt, res = _simple_region(tmp_path, reads)
    _g, v = gvcf.emit_region(opt, res, ["S"])
    recs = [l.split("\t") for l in v if not l.startswith("#")]
    has_del = any(len(r[3]) > len(r[4].split(",")[0]) for r in recs)
    has_ins = any(len(r[3]) < max(len(a) for a in r[4].split(","))
                  for r in recs)
    assert has_del and has_ins, v


def test_call_regions_gate(tmp_path):
    """--call-regions-bed: records (sites, blocks, indels) are only
    emitted inside called regions (skip_to_pos :139-147,
    write_indel_record :1106-1115)."""
    from strelka_tpu.workflow.germline import run_germline
    rng = np.random.default_rng(6)
    L = 800
    codes = rng.integers(0, 4, L).astype(np.uint8)
    refs = decode_bases(codes)
    fa = tmp_path / "t.fa"
    _write_fasta(str(fa), codes)
    reads = [(100 + 3 * k, "80M", refs[100 + 3 * k:180 + 3 * k],
              [38] * 80, 0, 60) for k in range(60)]
    from strelka_tpu.io.bam import BamHeader
    from strelka_tpu.io.bam_writer import write_bam
    batch = make_batch(sorted(reads, key=lambda r: r[0]))
    bam = str(tmp_path / "r.bam")
    write_bam(bam, BamHeader(text="", ref_names=["t1"],
                             ref_lengths=[L]), batch)
    bed = tmp_path / "call.bed"
    bed.write_text("t1\t150\t250\n")
    out = str(tmp_path / "out")
    rc = run_germline(["--reference", str(fa), "--align-file", bam,
                       "--exome", "--call-regions-bed", str(bed),
                       "--output-dir", out])
    assert rc == 0
    spans = []
    with gzip.open(os.path.join(out, "genome.S1.vcf.gz"), "rt") as f:
        for line in f:
            if line.startswith("#"):
                continue
            fl = line.split("\t")
            pos = int(fl[1])
            end = pos
            for kv in fl[7].split(";"):
                if kv.startswith("END="):
                    end = int(kv[4:])
            spans.append((pos, end))
    assert spans, "no records emitted"
    for b, e in spans:
        assert b >= 151 and e <= 250, (b, e)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


def test_site_strand_bias_clamped_at_99(tmp_path):
    """Raw strand bias is bounded to +-maxAbsSampleVariantStrandBias
    (=99, starling_shared.hh:94) at updateSiteSampleInfo
    (starling_pos_processor.cpp:231-233) before the SB column, EVS
    features, and the HighSNVSB filter see it."""
    def reads(refs):
        rl = 80
        out = []
        # extreme strand artifact: ~200 fwd-only alt reads over ref-only
        # reverse reads drives the strand-split lhood advantage past 99
        for k in range(400):
            st = 140 + (k % 40)
            seq = list(refs[st:st + rl])
            fwd = k % 2 == 0
            if fwd:
                seq[200 - st] = "A" if refs[200] != "A" else "C"
            out.append((st, f"{rl}M", "".join(seq), [38] * rl,
                        0 if fwd else 16, 60))
        return out

    opt, res = _simple_region(tmp_path, reads)
    _g, v = gvcf.emit_region(opt, res, ["S"])
    rec = [l for l in v if l.split("\t")[1] == "201"]
    assert rec, v
    f = rec[0].split("\t")
    fmt = f[8].split(":")
    assert "SB" in fmt
    sb_raw = float(np.asarray(res.samples[0].snv.strand_bias)[200])
    assert sb_raw > 99.0, sb_raw   # the scenario really exceeds the cap
    sb = f[9].split(":")[fmt.index("SB")]
    assert sb == "99.0", rec[0]
    assert "HighSNVSB" in f[6]


def test_phased_snvs_opposite_haps_flip(tmp_path):
    """Two het SNVs on OPPOSITE haplotypes: the first prints 0|1 and
    the second flips to 1|0 (orientation anchored to the first variant,
    VariantPhaser.cpp:232-254), sharing PS = first variant's POS."""
    def reads(refs):
        rl = 80
        p1, p2 = 200, 206
        out = []
        for k in range(30):
            st = 150 + k
            seq = list(refs[st:st + rl])
            if k % 2 == 0:
                seq[p1 - st] = "A" if refs[p1] != "A" else "C"
            else:
                seq[p2 - st] = "A" if refs[p2] != "A" else "C"
            out.append((st, f"{rl}M", "".join(seq), [38] * rl, 0, 60))
        return out

    opt, res = _simple_region(tmp_path, reads)
    _g, v = gvcf.emit_region(opt, res, ["S"])
    phased = [l for l in v if "|" in l.split("\t")[9].split(":")[0]]
    assert len(phased) == 2, v
    gts = []
    ps_vals = set()
    first_pos = None
    for l in phased:
        f = l.split("\t")
        if first_pos is None:
            first_pos = f[1]
        fmt = f[8].split(":")
        cols = f[9].split(":")
        gts.append(cols[fmt.index("GT")])
        ps_vals.add(cols[fmt.index("PS")])
    assert gts == ["0|1", "1|0"], gts
    assert ps_vals == {first_pos}


def test_phased_indel_emits_ps(tmp_path):
    """Het indels participate in phase blocks: an insertion and an SNV
    on the same haplotype both print phased GTs, and the indel record
    carries PS (gvcf_writer.cpp:948-965,1008-1022)."""
    def reads(refs):
        rl = 80
        p1, p2 = 200, 210
        out = []
        for k in range(30):
            st = 150 + k
            if k % 2 == 0:
                seq = (refs[st:p1 + 1] + "ACTG"
                       + refs[p1 + 1:st + rl - 4])
                snv_off = p2 - st + 4
                seq = list(seq)
                seq[snv_off] = "A" if refs[p2] != "A" else "C"
                cig = f"{p1 - st + 1}M4I{rl - (p1 - st + 1) - 4}M"
                out.append((st, cig, "".join(seq), [38] * rl, 0, 60))
            else:
                out.append((st, f"{rl}M", refs[st:st + rl],
                            [38] * rl, 0, 60))
        return out

    opt, res = _simple_region(tmp_path, reads)
    _g, v = gvcf.emit_region(opt, res, ["S"])
    indel_rec = [l for l in v
                 if len(l.split("\t")[3]) != len(l.split("\t")[4])]
    assert indel_rec, v
    f = indel_rec[0].split("\t")
    fmt = f[8].split(":")
    assert "PS" in fmt, indel_rec[0]
    cols = f[9].split(":")
    assert "|" in cols[0], indel_rec[0]
    assert cols[fmt.index("PS")] == f[1], indel_rec[0]


def test_forced_allele_displaced_by_trim_still_emitted(tmp_path):
    """A forced-GT allele that loses the locus's top-2 allele selection
    must still be reported as its own single-allele locus, genotyped
    against the displacing alleles as a contrast group (forced-output
    pathway, starling_pos_processor.cpp:1826-1966; contrast scores max
    down into ref, AlleleGroupGenotype.cpp:236-247)."""
    rng = np.random.default_rng(5)
    L = 600
    codes = rng.integers(0, 4, L).astype(np.uint8)
    refs = decode_bases(codes)
    fa = tmp_path / "t.fa"
    _write_fasta(str(fa), codes)
    ref = FastaReference(str(fa))

    rl = 80
    p = 300
    out = []
    for k in range(45):
        st = 250 + (k % 40)
        third = k % 3
        if third == 0:       # 2bp deletion at p
            seq = refs[st:p + 1] + refs[p + 3:st + rl + 2]
            cig = f"{p - st + 1}M2D{rl - (p - st + 1)}M"
        elif third == 1:     # 4bp deletion at p
            seq = refs[st:p + 1] + refs[p + 5:st + rl + 4]
            cig = f"{p - st + 1}M4D{rl - (p - st + 1)}M"
        else:
            seq = refs[st:st + rl]
            cig = f"{rl}M"
        out.append((st, cig, seq, [38] * rl, 0, 60))
    out.sort(key=lambda r: r[0])
    batch = make_batch(out)

    fvcf = tmp_path / "forced.vcf"
    # overlapping 1bp deletion with zero read support
    fvcf.write_text("##fileformat=VCFv4.1\n"
                    "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
                    f"t1\t{p + 1}\t.\t{refs[p]}{refs[p + 1]}\t{refs[p]}"
                    "\t.\t.\t.\n")

    opt = GermlineOptions()
    res = gc.call_region(opt, ref, "t1", 0, L, [batch],
                         forced_gt_vcfs=[str(fvcf)])
    _g, v = gvcf.emit_region(opt, res, ["S"])
    indel_recs = [l.split("\t") for l in v
                  if len(l.split("\t")[3]) != len(l.split("\t")[4]
                                                 .split(",")[0])]
    # reference selection: the pileup is ~1/3 ref, ~1/3 2bp-del and
    # ~1/3 4bp-del, so the reference allele ranks inside the diploid
    # top-2 and consumes a slot (topSize = 2 - 1 = 1,
    # selectTopOrthogonalAllelesInSample:262-281) — the locus keeps
    # only the top-ranked deletion as a het call
    var = [r for r in indel_recs if r[9].split(":")[0] in ("0/1", "0|1")]
    assert len(var) == 1, indel_recs
    assert "," not in var[0][4], var[0]
    # ... and the displaced forced 1bp deletion gets its own record
    forced = [r for r in indel_recs
              if len(r[3]) == 2 and "," not in r[4] and r[1] == str(p + 1)]
    assert forced, indel_recs
    assert forced[0][9].split(":")[0] in ("0/0", "0|0"), forced[0]


def test_rank_locus_alleles_posterior_beats_read_count():
    """Allele ranking: an allele with MORE but individually ambiguous
    supporting reads ranks after an allele with fewer confident reads
    (posterior-sum ranking, rankOrthogonalAllelesInSample), and the
    ploidy-aware vote aggregation across samples follows
    selectTopOrthogonalAllelesInAllSamples (allele_select port)."""
    from strelka_tpu.pipeline import allele_select as asel
    # single sample: 14 reads weakly favoring alt0 (posterior ~0.52)
    # vs 10 reads decisively favoring alt1
    weak = np.array([[0.0, 0.08, -30.0]] * 14)     # ref, alt0, alt1
    strong = np.array([[0.0, -30.0, 9.0]] * 10)
    al = np.concatenate([weak, strong])
    kept, _ = asel.select_top_in_all_samples([al], [2], 2)
    assert kept == [1, 0]
    # two samples voting for different alleles: ploidy votes aggregate
    s0 = np.array([[0.0, 9.0, -30.0]] * 6)         # top allele 0
    s1 = np.array([[0.0, -30.0, 9.0]] * 3)         # top allele 1
    kept, _ = asel.select_top_in_all_samples([s0, s1], [2, 2], 2)
    # equal votes (2 each from rank-0 positions); tie broken by
    # first-seen order -> allele 0 stays first
    assert kept == [0, 1]
    kept, _ = asel.select_top_in_all_samples([s1, s0], [2, 2], 2)
    assert kept == [1, 0]


def test_multiallelic_alt_order_by_posterior_support(tmp_path):
    """e2e wiring: a 2-alt locus orders its ALT column by the
    posterior-support ranking (here support and counts agree; the
    disagreement case is pinned by the unit test above)."""
    rng = np.random.default_rng(11)
    L = 600
    codes = rng.integers(0, 4, L).astype(np.uint8)
    refs = decode_bases(codes)
    fa = tmp_path / "t.fa"
    _write_fasta(str(fa), codes)
    ref = FastaReference(str(fa))

    rl = 80
    p = 300
    out = []
    k = 0
    # 14 reads supporting a 2bp deletion with q=5 basecalls (weak
    # per-read posteriors), 10 reads supporting a 4bp deletion at q=40,
    # 12 clean ref reads at q=40
    for n, kind, q in ((14, "del2", 5), (10, "del4", 40),
                      (4, "ref", 40)):
        for _ in range(n):
            st = 250 + (k % 40)
            k += 1
            if kind == "del2":
                seq = refs[st:p + 1] + refs[p + 3:st + rl + 2]
                cig = f"{p - st + 1}M2D{rl - (p - st + 1)}M"
            elif kind == "del4":
                seq = refs[st:p + 1] + refs[p + 5:st + rl + 4]
                cig = f"{p - st + 1}M4D{rl - (p - st + 1)}M"
            else:
                seq = refs[st:st + rl]
                cig = f"{rl}M"
            out.append((st, cig, seq, [q] * rl, 0, 60))
    out.sort(key=lambda r: r[0])
    batch = make_batch(out)
    opt = GermlineOptions()
    res = gc.call_region(opt, ref, "t1", 0, L, [batch])
    _g, v = gvcf.emit_region(opt, res, ["S"])
    multi = [l.split("\t") for l in v if "," in l.split("\t")[4]]
    assert multi, v
    alts = multi[0][4].split(",")
    # the 14-read q5 deletion still wins posterior support here (each
    # read's haplotype is decisively matched); ALT0 = the 2bp deletion
    # (longer ALT string), ALT1 = the 4bp deletion
    assert len(alts[0]) > len(alts[1]), multi[0][:5]
    # and both samples genotype against the ranked order
    assert multi[0][9].split(":")[0].replace("|", "/") in (
        "1/2", "2/1", "1/1", "0/1", "0/2"), multi[0]
