"""Germline SNV EVS rank-sum features (VERDICT r4 #5): scalar
transcriptions of updateGermlineScoringMetrics
(pos_basecall_buffer.cpp:44-70) + fastRanksum checked against
pileup.SiteScoringMetrics, plus an e2e with a self-trained model whose
feature set is the FULL production germline SNV set
(germlineVariantEmpiricalScoringFeatures.hh:49-61)."""
import gzip
import json

import numpy as np
import pytest

from strelka_tpu.io.fasta import FastaReference, decode_bases
from strelka_tpu.options import GermlineOptions
from strelka_tpu.pipeline import germline_caller as gc
from strelka_tpu.pipeline import gvcf
from strelka_tpu.utils.stats import mann_whitney_u_from_groups

from tests.test_pileup import make_batch

# the reference's production germline SNV model feature set, in enum
# order (germlineVariantEmpiricalScoringFeatures.hh:49-61)
FULL_GERMLINE_SNV_FEATURES = [
    "GenotypeCategory",
    "SampleRMSMappingQuality",
    "SiteHomopolymerLength",
    "SampleStrandBias",
    "SampleRMSMappingQualityRankSum",
    "SampleReadPosRankSum",
    "RelativeTotalLocusDepth",
    "SampleUsedDepthFraction",
    "ConservativeGenotypeQuality",
    "NormalizedAltHaplotypeCountRatio",
]


def _write_fasta(path, codes):
    seq = decode_bases(codes)
    with open(path, "w") as f:
        f.write(">t1\n")
        for i in range(0, len(seq), 70):
            f.write(seq[i:i + 70] + "\n")


def _het_site_region(tmp_path, seed=3, alt_mapq=45, ref_mapq=60):
    """A het SNV at pos 500 (plus a second linked SNV at 510 so an
    active region opens around them) with distinct alt/ref mapq +
    qual + read placements so every rank-sum statistic is nonzero."""
    rng = np.random.default_rng(seed)
    L = 1000
    codes = rng.integers(0, 4, L).astype(np.uint8)
    refs = decode_bases(codes)
    fa = tmp_path / "t.fa"
    _write_fasta(str(fa), codes)
    p = 500
    p2 = 510
    alt_base = "ACGT"[(codes[p] + 1) % 4]
    alt2 = "ACGT"[(codes[p2] + 1) % 4]
    rl = 80
    reads = []
    for k in range(12):  # alt reads: later cycle positions, lower mapq
        st = p - 70 + 2 * k
        seq = (refs[st:p] + alt_base + refs[p + 1:p2] + alt2
               + refs[p2 + 1:st + rl])
        reads.append((st, f"{rl}M", seq, [30 + (k % 6)] * rl, 0, alt_mapq))
    for k in range(14):  # ref reads
        st = p - 40 + 2 * k
        reads.append((st, f"{rl}M", refs[st:st + rl],
                      [36 + (k % 4)] * rl, 0, ref_mapq))
    # one submapped read (mapq below cutoff) covering the site
    reads.append((p - 30, f"{rl}M", refs[p - 30:p - 30 + rl],
                  [35] * rl, 0, 5))
    reads.sort(key=lambda r: r[0])
    return FastaReference(str(fa)), make_batch(reads), p, alt_base, L


def test_site_metrics_match_scalar_transcription(tmp_path):
    ref, batch, p, alt_base, L = _het_site_region(tmp_path)
    opt = GermlineOptions()
    res = gc.call_region(opt, ref, "t1", 0, L, [batch])
    sd = res.samples[0]
    mq_rs, pos_rs, bq_rs = sd.scoring_metrics.at(p)

    # scalar transcription: walk the pileup tile + submapped reads and
    # bucket observations exactly as updateGermlineScoringMetrics does
    pu = sd.pileup
    ref_id = int(res.ref_codes[p])
    mq_ref, mq_alt = [], []
    cyc_ref, cyc_alt = [], []
    q_ref, q_alt = [], []
    rlens = np.diff(batch.seq_off)
    for d in range(pu.max_depth):
        if not pu.valid[p, d]:
            continue
        r = int(pu.read_idx[p, d])
        is_ref = int(pu.base_id[p, d]) == ref_id
        (mq_ref if is_ref else mq_alt).append(int(batch.mapq[r]))
        off = int(pu.read_off[p, d])
        cyc = off if pu.is_fwd[p, d] else int(rlens[r]) - 1 - off
        (cyc_ref if is_ref else cyc_alt).append(cyc)
        (q_ref if is_ref else q_alt).append(int(pu.qual[p, d]))
    # submapped read contributes to MQ only
    from strelka_tpu.pipeline import reads as rd
    from strelka_tpu.pipeline.pileup import submapped_match_obs
    ea = rd.expand_alignments(batch)
    keep, level = rd.filter_and_classify_reads(batch, opt.min_mapping_quality)
    n_sub = int((level[keep] == rd.MapLevel.SUB_MAPPED).sum())
    assert n_sub >= 1, "fixture must produce a submapped read"
    for r in range(batch.n):
        if level[r] != rd.MapLevel.SUB_MAPPED:
            continue
        st, en = int(batch.pos[r]), int(batch.pos[r]) + int(rlens[r])
        if st <= p < en:
            base = int(batch.seq[batch.seq_off[r] + (p - st)])
            (mq_ref if base == ref_id else mq_alt).append(int(batch.mapq[r]))
    assert mq_rs == pytest.approx(
        mann_whitney_u_from_groups(np.array(mq_ref), np.array(mq_alt)))
    assert pos_rs == pytest.approx(
        mann_whitney_u_from_groups(np.array(cyc_ref), np.array(cyc_alt)))
    assert bq_rs == pytest.approx(
        mann_whitney_u_from_groups(np.array(q_ref), np.array(q_alt)))
    # distinct mapq groups must produce a nonzero (negative) z
    assert mq_rs < 0.0
    assert bq_rs != 0.0


def test_hap_ratio_populated_in_active_region(tmp_path):
    ref, batch, p, alt_base, L = _het_site_region(tmp_path)
    opt = GermlineOptions()
    res = gc.call_region(opt, ref, "t1", 0, L, [batch])
    assert p in res.phase_set_of_pos, "het SNV should sit in an AR"
    ratio = res.snv_hap_ratio.get((0, p))
    assert ratio is not None and 0.0 < ratio <= 1.0, ratio


def test_full_feature_vector_values(tmp_path):
    """Feature extraction through germline_snv_features with the full
    production set: rank sums flow from the pileup metrics, the
    genotype category reflects the het call, and the hap-count ratio
    is doubled for a ref-het genotype (gvcf_locus_info.cpp:392-398)."""
    ref, batch, p, alt_base, L = _het_site_region(tmp_path)
    opt = GermlineOptions()
    res = gc.call_region(opt, ref, "t1", 0, L, [batch])
    sd = res.samples[0]
    forest = gvcf._FeatureList(FULL_GERMLINE_SNV_FEATURES)
    alt_id = "ACGT".index(alt_base)
    ratio = res.snv_hap_ratio.get((0, p), 0.0)
    f = gvcf.germline_snv_features(
        forest, sd, p, gc.snv_hpol(res.ref_codes, p), 100, alt_id, -30.0,
        gt_indices=[0, 1], ploidy=2, gqx=55, rel_depth=1.0,
        hap_ratio=ratio)
    by = dict(zip(FULL_GERMLINE_SNV_FEATURES, f))
    assert by["GenotypeCategory"] == 0.0          # HET
    assert by["SampleRMSMappingQualityRankSum"] < 0.0
    assert by["SampleReadPosRankSum"] != 0.0
    assert by["ConservativeGenotypeQuality"] == 55.0
    assert by["RelativeTotalLocusDepth"] == 1.0
    assert by["NormalizedAltHaplotypeCountRatio"] == \
        pytest.approx(min(ratio, 1.0) * 2.0)      # ref-het doubling
    # outside an active region the ratio pins to -1
    f2 = gvcf.germline_snv_features(
        forest, sd, p, 1, 100, alt_id, 0.0,
        gt_indices=[1, 1], ploidy=2, gqx=55, hap_ratio=None)
    assert dict(zip(FULL_GERMLINE_SNV_FEATURES, f2))[
        "NormalizedAltHaplotypeCountRatio"] == -1.0
    # hom genotype category
    assert dict(zip(FULL_GERMLINE_SNV_FEATURES, f2))[
        "GenotypeCategory"] == 1.0


@pytest.fixture(scope="module")
def full_model(tmp_path_factory):
    from strelka_tpu.training import evs_train
    rng = np.random.default_rng(21)
    n = 1500
    x = rng.normal(size=(n, len(FULL_GERMLINE_SNV_FEATURES)))
    # ConservativeGenotypeQuality (col 8) dominates: real calls high
    x[:, 8] = rng.uniform(0, 200, size=n)
    labels = (x[:, 8] > 40).astype(int)
    clf = evs_train.train_forest(x, labels, n_trees=10, max_depth=5)
    doc = evs_train.export_model_json(
        clf, FULL_GERMLINE_SNV_FEATURES, "SNV", "Germline", 3.0)
    path = tmp_path_factory.mktemp("gsnvfull") / "germlineSNVFull.json"
    with open(path, "w") as f:
        json.dump(doc, f)
    return str(path)


def test_full_feature_model_e2e(full_model, tmp_path):
    """A model over the FULL production germline SNV feature set runs
    end-to-end: scored variant records get EVS GQX + the EVSF vector
    carries finite rank-sum values."""
    from strelka_tpu.workflow.germline import run_germline
    out = str(tmp_path / "run")
    rc = run_germline([
        "--reference", "/root/reference/src/demo/data/demo20.fa",
        "--align-file", "/root/reference/src/demo/data/NA12891_demo20.bam",
        "--output-dir", out, "--exome",
        "--snv-scoring-model-file", full_model,
        "--report-evs-features",
    ])
    assert rc == 0
    n_var = 0
    with gzip.open(f"{out}/variants.vcf.gz", "rt") as f:
        for line in f:
            if line.startswith("#") or "EVSF=" not in line:
                continue
            ref_a, alt_a = line.split("\t")[3:5]
            if len(ref_a) != 1 or len(alt_a.split(",")[0]) != 1:
                continue
            n_var += 1
            evsf = [x for x in line.split("\t")[7].split(";")
                    if x.startswith("EVSF=")][0]
            vals = [float(v) for v in evsf[5:].split(",")]
            assert len(vals) == len(FULL_GERMLINE_SNV_FEATURES)
            assert all(np.isfinite(vals))
    assert n_var >= 5, "demo should emit scored SNV records"
