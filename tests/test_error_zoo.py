"""Error-model zoo tests: scalar oracles of the reference math +
parameter recovery from simulated counts
(EstimateParametersFromAlleleCounts)."""
import math

import numpy as np
import pytest

from strelka_tpu.models import error_zoo as ez
from strelka_tpu.models.error_fit import ContextCounts


def scalar_indy_lhood(ref_obs, alt_obs, inst, ln_ins, ln_del, ln_theta):
    """Direct transcription of indelModelVariantAndIndyError.cpp
    contextLogLhood:54-183."""
    log_hom_alt = math.log(0.99)
    log_hom_ref = math.log(0.01)
    log_het = math.log(0.5)
    log_hom_prior = ln_theta - math.log(2)
    log_het_prior = ln_theta
    log_althet_prior = ln_theta * 2
    theta = math.exp(ln_theta)
    log_noindel_prior = math.log(1 - (theta * 3.0 / 2.0 + theta * theta))
    ln_ref = math.log(1 - math.exp(ln_ins) - math.exp(ln_del))

    def lse(*vals):
        m = max(vals)
        return m + math.log(sum(math.exp(v - m) for v in vals))

    total = 0.0
    for ref, alt, n in zip(ref_obs, alt_obs, inst):
        tot_ins = sum(alt[:3])
        tot_del = sum(alt[3:])
        noindel = ln_ins * tot_ins + ln_del * tot_del + ln_ref * ref
        mx = 0
        for j in range(1, 6):
            if alt[j] > alt[mx]:
                mx = j
        rem_ins = sum(a for i, a in enumerate(alt[:3]) if i != mx)
        rem_del = sum(a for i, a in enumerate(alt[3:], 3) if i != mx)
        het = (log_het * (ref + alt[mx]) + ln_ins * rem_ins
               + ln_del * rem_del)
        hom = (log_hom_alt * alt[mx] + log_hom_ref * ref
               + ln_ins * rem_ins + ln_del * rem_del)
        mx2 = 1 if mx == 0 else 0
        for j in range(mx2 + 1, 6):
            if j == mx:
                continue
            if alt[j] > alt[mx2]:
                mx2 = j
        rem_ins2 = sum(a for i, a in enumerate(alt[:3])
                       if i != mx and i != mx2)
        rem_del2 = sum(a for i, a in enumerate(alt[3:], 3)
                       if i != mx and i != mx2)
        althet = (log_het * (alt[mx] + alt[mx2]) + log_hom_ref * ref
                  + ln_ins * rem_ins2 + ln_del * rem_del2)
        mix = lse(log_hom_prior + hom, log_het_prior + het,
                  log_noindel_prior + noindel, log_althet_prior + althet)
        total += mix * n
    return total


def random_counts(rng, n=40):
    ref = rng.integers(5, 60, n)
    alt = rng.poisson(0.6, (n, 6))
    # a few variant-like patterns
    alt[:4, rng.integers(0, 6, 4)] += ref[:4] // 2
    inst = rng.integers(1, 50, n)
    return ContextCounts(ref_obs=ref.astype(np.int64),
                         alt_obs=alt.astype(np.int64),
                         instance_count=inst.astype(np.int64))


def test_indy_lhood_matches_scalar_oracle():
    rng = np.random.default_rng(3)
    cc = random_counts(rng)
    p = ez.IndelPatterns.build(cc)
    ln_ins, ln_del, ln_theta = math.log(2e-4), math.log(3e-4), math.log(1e-4)
    got = float(ez.indel_indy_lhood(p, ln_ins, ln_del, ln_theta))
    want = scalar_indy_lhood(cc.ref_obs, cc.alt_obs, cc.instance_count,
                             ln_ins, ln_del, ln_theta)
    assert got == pytest.approx(want, rel=1e-10)


def simulate_counts(rng, ins_rate, del_rate, theta, n_loci=40000, depth=40):
    """Draw locus patterns from the indy generative model."""
    patterns = {}
    for _ in range(n_loci):
        u = rng.random()
        alt = np.zeros(6, np.int64)
        if u < theta:        # het insertion at signal 0
            k = rng.binomial(depth, 0.5)
            alt[0] = k
            ref = depth - k
        else:
            ni = rng.binomial(depth, ins_rate)
            nd = rng.binomial(depth, del_rate)
            alt[0] = ni
            alt[3] = nd
            ref = depth - ni - nd
        key = (ref, *alt)
        patterns[key] = patterns.get(key, 0) + 1
    rows = np.array(list(patterns.keys()), dtype=np.int64)
    inst = np.array(list(patterns.values()), dtype=np.int64)
    return ContextCounts(ref_obs=rows[:, 0], alt_obs=rows[:, 1:],
                         instance_count=inst)


def test_indy_fit_recovers_rates():
    rng = np.random.default_rng(11)
    cc = simulate_counts(rng, ins_rate=5e-3, del_rate=1.5e-3, theta=8e-4)
    fit = ez.fit_indel_indy(cc)
    assert fit["insert_rate"] == pytest.approx(5e-3, rel=0.25)
    assert fit["delete_rate"] == pytest.approx(1.5e-3, rel=0.35)
    assert fit["theta"] == pytest.approx(8e-4, rel=0.5)


def test_binom_mixture_fit_runs_and_improves_on_indy():
    rng = np.random.default_rng(5)
    # noisy-locus generative process: 2% of loci have 30x error rate
    cc_parts = [simulate_counts(rng, 2e-3, 2e-3, 5e-4, n_loci=20000),
                simulate_counts(rng, 6e-2, 6e-2, 5e-4, n_loci=400)]
    rows = np.concatenate([np.concatenate(
        [p.ref_obs[:, None], p.alt_obs], axis=1) for p in cc_parts])
    inst = np.concatenate([p.instance_count for p in cc_parts])
    uniq, inv = np.unique(rows, axis=0, return_inverse=True)
    agg = np.zeros(len(uniq), np.int64)
    np.add.at(agg, inv, inst)
    cc = ContextCounts(ref_obs=uniq[:, 0], alt_obs=uniq[:, 1:],
                       instance_count=agg)
    indy = ez.fit_indel_indy(cc)
    mix = ez.fit_indel_binom_mixture(cc)
    assert mix["log_lhood"] > indy["log_lhood"]
    assert 0 < mix["noisy_locus_rate"] < 0.5


def test_beta_binomial_fit_recovers_mean():
    rng = np.random.default_rng(7)
    cc = simulate_counts(rng, ins_rate=4e-3, del_rate=1e-9, theta=1e-6,
                         n_loci=30000)
    fit = ez.fit_indel_beta_binomial(cc, is_insert=True)
    assert fit["mean"] == pytest.approx(4e-3, rel=0.4)
    assert fit["concentration"] > 0


def test_snv_indy_fit_recovers_per_qual_rates():
    import jax.numpy as jnp

    rng = np.random.default_rng(13)
    quals = np.array([20, 30])
    true_rates = np.array([8e-3, 8e-4])
    n_loci, depth = 30000, 30
    patterns = {}
    ref_hist = np.zeros(2, np.int64)
    for _ in range(n_loci):
        per_q = rng.multinomial(depth, [0.5, 0.5])
        alt = np.array([rng.binomial(per_q[0], true_rates[0]),
                        rng.binomial(per_q[1], true_rates[1])])
        ref = depth - alt.sum()
        ref_hist += per_q - alt
        key = (ref, alt[0], alt[1])
        patterns[key] = patterns.get(key, 0) + 1
    rows = np.array(list(patterns.keys()), np.int64)
    inst = np.array(list(patterns.values()), np.int64)
    sp = ez.SnvPatterns(
        qual_levels=quals,
        ref_qual_hist=jnp.asarray(ref_hist, dtype=jnp.float64),
        ref_count=jnp.asarray(rows[:, 0], dtype=jnp.float64),
        alt_count=jnp.asarray(rows[:, 1:], dtype=jnp.float64),
        inst=jnp.asarray(inst, dtype=jnp.float64))
    fit = ez.fit_snv_indy(sp)
    assert fit["error_rates"][0] == pytest.approx(8e-3, rel=0.3)
    assert fit["error_rates"][1] == pytest.approx(8e-4, rel=0.4)


def test_collect_basecall_counts_demo_bam():
    """Basecall-count collection + SNV fit over the demo BAM."""
    from strelka_tpu.io.bam import read_bam
    from strelka_tpu.io.fasta import FastaReference
    from strelka_tpu.pipeline import reads as rd
    from strelka_tpu.pipeline.allele_counts import collect_basecall_counts

    ref = FastaReference("/root/reference/src/demo/data/demo20.fa")
    hdr, raw = read_bam("/root/reference/src/demo/data/NA12891_demo20.bam")
    keep, level = rd.filter_and_classify_reads(raw, 20)
    batch = raw.select(keep)
    L = ref.contig_length("demo20")
    refall = ref.fetch("demo20", 0, L)
    sp = collect_basecall_counts(batch, level[keep], refall, 0, 0, L)
    assert sp is not None
    assert float(np.asarray(sp.inst).sum()) > 1000
    fit = ez.fit_snv_indy(sp, steps=300)
    # demo data is high quality: every per-qual rate is a plausible
    # basecall error rate
    for r in fit["error_rates"]:
        assert 0 < r < 0.1


def test_estimate_parameters_cli(tmp_path):
    rng = np.random.default_rng(19)
    cc = simulate_counts(rng, 2e-3, 1e-3, 5e-4, n_loci=5000)
    from strelka_tpu.pipeline.allele_counts import save_context_counts
    path = str(tmp_path / "counts.npz")
    save_context_counts(path, {(1, 1): cc})
    from strelka_tpu.workflow.tools import estimate_parameters
    res = estimate_parameters(path, "indelIndy")
    assert "unit1_rep1" in res
    assert 0 < res["unit1_rep1"]["insert_rate"] < 0.1


def scalar_indy_noovl_lhood(ref_obs, alt_obs, inst, ln_indel, is_insert,
                            ln_theta):
    """Direct transcription of
    indelModelVariantAndIndyErrorNoOverlap.cpp contextLogLhood:55-112."""
    log_hom_alt = math.log(0.99)
    log_hom_ref = math.log(1 - 0.99)
    log_het = math.log(0.5)
    log_hom_prior = ln_theta - math.log(2)
    log_het_prior = ln_theta
    theta = math.exp(ln_theta)
    log_noindel_prior = math.log(1 - theta * 3.0 / 2.0)
    ln_ref = math.log1p(-math.exp(ln_indel))

    def lse(*vals):
        m = max(vals)
        return m + math.log(sum(math.exp(v - m) for v in vals))

    total = 0.0
    for ref, alt, n in zip(ref_obs, alt_obs, inst):
        k = sum(alt[:3]) if is_insert else sum(alt[3:])
        noindel = ln_indel * k + ln_ref * ref
        het = log_het * (ref + k)
        hom = log_hom_alt * k + log_hom_ref * ref
        total += lse(log_hom_prior + hom, log_het_prior + het,
                     log_noindel_prior + noindel) * n
    return total


def test_indy_noovl_lhood_matches_scalar_oracle():
    rng = np.random.default_rng(21)
    cc = random_counts(rng)
    p = ez.IndelPatterns.build(cc)
    for is_insert in (True, False):
        got = float(ez.indel_indy_noovl_lhood(
            p, np.log(3e-4), is_insert, np.log(1e-4)))
        want = scalar_indy_noovl_lhood(
            cc.ref_obs, cc.alt_obs, cc.instance_count,
            math.log(3e-4), is_insert, math.log(1e-4))
        assert got == pytest.approx(want, rel=1e-12), is_insert


def _sim_single_type_counts(rng, rate, n_loci=4000, depth=40):
    """Non-overlap counts: insert-type errors at `rate`, no deletes."""
    patterns = {}
    for _ in range(n_loci):
        k = rng.binomial(depth, rate)
        key = (depth - k, k)
        patterns[key] = patterns.get(key, 0) + 1
    rows = np.array(list(patterns.keys()), np.int64)
    inst = np.array(list(patterns.values()), np.int64)
    alt = np.zeros((len(rows), 6), np.int64)
    alt[:, 0] = rows[:, 1]
    return ContextCounts(ref_obs=rows[:, 0], alt_obs=alt,
                         instance_count=inst)


def test_indy_noovl_fit_recovers_rate():
    rng = np.random.default_rng(22)
    cc = _sim_single_type_counts(rng, 2e-3)
    fit = ez.fit_indel_indy_noovl(cc, is_insert=True, lock_theta=True)
    assert fit["indel_rate"] == pytest.approx(2e-3, rel=0.25)
    # the delete-side fit sees zero alt signal -> rate collapses low
    fit_d = ez.fit_indel_indy_noovl(cc, is_insert=False, lock_theta=True)
    assert fit_d["indel_rate"] < 1e-4


def test_binom_mixture_noovl_fit_runs_and_improves():
    rng = np.random.default_rng(23)
    # mixture data: 10% noisy loci at 2e-2, the rest clean
    patterns = {}
    for _ in range(3000):
        rate = 2e-2 if rng.random() < 0.1 else 1e-8
        k = rng.binomial(40, rate)
        key = (40 - k, k)
        patterns[key] = patterns.get(key, 0) + 1
    rows = np.array(list(patterns.keys()), np.int64)
    inst = np.array(list(patterns.values()), np.int64)
    alt = np.zeros((len(rows), 6), np.int64)
    alt[:, 3] = rows[:, 1]
    cc = ContextCounts(ref_obs=rows[:, 0], alt_obs=alt,
                       instance_count=inst)
    indy = ez.fit_indel_indy_noovl(cc, is_insert=False, lock_theta=True)
    mix = ez.fit_indel_binom_mixture_noovl(cc, is_insert=False,
                                           lock_theta=True)
    assert mix["log_lhood"] >= indy["log_lhood"] - 1e-6
    assert mix["noisy_locus_rate"] == pytest.approx(0.1, rel=0.6)


def test_snv_binom_mixture_fit_runs_and_improves():
    import jax.numpy as jnp

    rng = np.random.default_rng(24)
    quals = np.array([30])
    n_loci, depth = 20000, 30
    patterns = {}
    ref_hist = np.zeros(1, np.int64)
    for _ in range(n_loci):
        rate = 1e-2 if rng.random() < 0.05 else 2e-4
        alt = rng.binomial(depth, rate)
        ref = depth - alt
        ref_hist[0] += ref
        patterns[(ref, alt)] = patterns.get((ref, alt), 0) + 1
    rows = np.array(list(patterns.keys()), np.int64)
    inst = np.array(list(patterns.values()), np.int64)
    sp = ez.SnvPatterns(
        qual_levels=quals,
        ref_qual_hist=jnp.asarray(ref_hist, dtype=jnp.float64),
        ref_count=jnp.asarray(rows[:, 0], dtype=jnp.float64),
        alt_count=jnp.asarray(rows[:, 1:], dtype=jnp.float64),
        inst=jnp.asarray(inst, dtype=jnp.float64))
    indy = ez.fit_snv_indy(sp, lock_theta=True)
    mix = ez.fit_snv_binom_mixture(sp, lock_theta=True)
    assert mix["log_lhood"] >= indy["log_lhood"] - 1e-6


def test_indel_model1_report():
    rng = np.random.default_rng(25)
    cc = _sim_single_type_counts(rng, 1e-3, n_loci=2000, depth=40)
    rep = ez.indel_model1_report(cc, is_insert=True)
    assert rep["rate"] == pytest.approx(1e-3, rel=0.4)
    assert rep["rate_95pct_upper_bound"] > rep["rate"]
    assert rep["used_loci"] <= rep["loci"]
    # noisy loci (high alt fraction) are excluded from the rate
    noisy = ContextCounts(
        ref_obs=np.array([30, 10], np.int64),
        alt_obs=np.array([[0, 0, 0, 0, 0, 0],
                          [30, 0, 0, 0, 0, 0]], np.int64),
        instance_count=np.array([100, 50], np.int64))
    rep2 = ez.indel_model1_report(noisy, is_insert=True)
    assert rep2["alt_reads"] == 0.0
    assert rep2["used_loci"] == 100
