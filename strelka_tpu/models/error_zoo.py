"""Research-grade error-model zoo: parameter estimation from allele
counts.

Reference: applications/EstimateParametersFromAlleleCounts/ — a family
of maximum-likelihood fits of sequencing error parameters from the
binary allele-count files, spanning indel models
{independent-error (indelModelVariantAndIndyError.cpp:54-183),
 binomial-mixture (indelModelVariantAndBinomialMixtureError.cpp:181-235),
 beta-binomial (indelModelVariantAndBetaBinomialError.cpp:80-208)}
and the SNV independent-error model
(snvModelVariantAndIndyError.cpp:43-108). The reference minimizes each
with CodeMin conjugate directions; here every context's observation
patterns evaluate as one vectorized log-likelihood and optax adam
drives the ML fit — the TPU-native "vectorized EM" replacement.

All models share the germline genotype mixture over
{no-variant, het, hom(, alt-het)} with theta priors
(logHomPrior = ln theta - ln 2, logHetPrior = ln theta,
logAltHetPrior = 2 ln theta) and the approximation that the most
frequent alt observation is the candidate variant allele.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

LN2 = float(np.log(2.0))
LOG_HOM_ALT = float(np.log(0.99))
LOG_HOM_REF = float(np.log(0.01))
LOG_HET = float(np.log(0.5))
DEFAULT_LOG_THETA = float(np.log(1e-4))


# ---------------------------------------------------------------------------
# parameter smoothers (error_minfunc::argToParameters): the minimizer
# works on unconstrained values; rates fold back below ln(0.5), theta
# below ln(0.3), with a log1p softening above the trigger
# ---------------------------------------------------------------------------

def _smooth(a, trigger: float, limit: float):
    lt = float(np.log(trigger))
    ll = float(np.log(limit))
    a = jnp.where(a > lt, jnp.log1p(a - lt) + lt, a)
    return jnp.where(a > ll, ll - jnp.abs(a - ll), a)


def rate_smoother(a, trigger: float = 1e-3):
    return _smooth(a, trigger, 0.5)


def theta_smoother(a):
    return _smooth(a, 1e-3, 0.3)


# The reference's fold-back smoothers suit CodeMin's line searches but
# create a sawtooth that traps momentum-based optimizers; the fits use
# an equivalent smooth bounded parameterization instead:
# rate = limit * sigmoid(x)  <=>  ln rate = ln limit + log_sigmoid(x).

def _ln_bounded(x, limit: float):
    return float(np.log(limit)) + jax.nn.log_sigmoid(x)


def _bounded_init(rate0: float, limit: float) -> float:
    q = min(max(rate0 / limit, 1e-12), 1 - 1e-12)
    return float(np.log(q / (1.0 - q)))


# ---------------------------------------------------------------------------
# shared genotype-mixture observation likelihood (indel)
# ---------------------------------------------------------------------------

def _alt_split(alt_obs):
    """(total_ins, total_del) per pattern; signal types 0-2 are
    insertions, 3-5 deletions (INDEL_SIGNAL_TYPE)."""
    return alt_obs[:, :3].sum(axis=1), alt_obs[:, 3:].sum(axis=1)


def _max_allele_masks(alt_obs: np.ndarray):
    """Indices of the most / second-most frequent alt signal per
    pattern with the reference's first-wins tie break (strict > scans
    in index order). Returns numpy int arrays (host-side precompute)."""
    n, k = alt_obs.shape
    max1 = np.zeros(n, dtype=np.int64)
    for j in range(1, k):
        upd = alt_obs[:, j] > alt_obs[np.arange(n), max1]
        max1[upd] = j
    max2 = np.where(max1 == 0, 1, 0).astype(np.int64)
    for j in range(1, k):
        cand = (j != max1) & (j > max2) & \
            (alt_obs[:, j] > alt_obs[np.arange(n), max2])
        max2[cand] = j
    return max1, max2


@dataclass
class IndelPatterns:
    """Device-ready observation patterns for one context."""
    ref_obs: jnp.ndarray        # [N] f64
    alt_obs: jnp.ndarray        # [N, 6] f64
    inst: jnp.ndarray           # [N] f64 pattern multiplicities
    max1: jnp.ndarray           # [N] most frequent alt index
    max2: jnp.ndarray           # [N] second most frequent alt index

    @classmethod
    def build(cls, counts) -> "IndelPatterns":
        alt = np.asarray(counts.alt_obs, dtype=np.float64)
        m1, m2 = _max_allele_masks(np.asarray(counts.alt_obs))
        return cls(ref_obs=jnp.asarray(counts.ref_obs, dtype=jnp.float64),
                   alt_obs=jnp.asarray(alt),
                   inst=jnp.asarray(counts.instance_count,
                                    dtype=jnp.float64),
                   max1=jnp.asarray(m1), max2=jnp.asarray(m2))


def _indel_mixture_lhood(p: IndelPatterns, ln_ins, ln_del,
                         ln_noindel_ref, ln_theta):
    """Sum over patterns of the 4-state genotype mixture
    (getObsLogLhood of indelModelVariantAndIndyError.cpp:54-183)."""
    log_hom_prior = ln_theta - LN2
    log_het_prior = ln_theta
    log_althet_prior = ln_theta * 2.0
    theta = jnp.exp(ln_theta)
    log_noindel_prior = jnp.log(1.0 - (theta * 1.5 + theta * theta))

    tot_ins, tot_del = _alt_split(p.alt_obs)
    noindel = (ln_ins * tot_ins + ln_del * tot_del
               + ln_noindel_ref * p.ref_obs)

    is_ins1 = p.max1 < 3
    a1 = jnp.take_along_axis(p.alt_obs, p.max1[:, None], axis=1)[:, 0]
    rem_ins1 = tot_ins - jnp.where(is_ins1, a1, 0.0)
    rem_del1 = tot_del - jnp.where(is_ins1, 0.0, a1)
    het = (LOG_HET * (p.ref_obs + a1)
           + ln_ins * rem_ins1 + ln_del * rem_del1)
    hom = (LOG_HOM_ALT * a1 + LOG_HOM_REF * p.ref_obs
           + ln_ins * rem_ins1 + ln_del * rem_del1)

    is_ins2 = p.max2 < 3
    a2 = jnp.take_along_axis(p.alt_obs, p.max2[:, None], axis=1)[:, 0]
    rem_ins2 = rem_ins1 - jnp.where(is_ins2, a2, 0.0)
    rem_del2 = rem_del1 - jnp.where(is_ins2, 0.0, a2)
    althet = (LOG_HET * (a1 + a2) + LOG_HOM_REF * p.ref_obs
              + ln_ins * rem_ins2 + ln_del * rem_del2)

    stacked = jnp.stack([log_hom_prior + hom,
                         log_het_prior + het,
                         log_noindel_prior + noindel,
                         log_althet_prior + althet])
    mix = jax.scipy.special.logsumexp(stacked, axis=0)
    return jnp.sum(mix * p.inst)


# ---------------------------------------------------------------------------
# model 1: independent per-observation error rates
# ---------------------------------------------------------------------------

def indel_indy_lhood(p: IndelPatterns, ln_ins, ln_del, ln_theta):
    ln_ref = jnp.log(1.0 - jnp.exp(ln_ins) - jnp.exp(ln_del))
    return _indel_mixture_lhood(p, ln_ins, ln_del, ln_ref, ln_theta)


# ---------------------------------------------------------------------------
# model 3: binomial mixture of clean / noisy loci
# ---------------------------------------------------------------------------

CLEAN_LOCUS_INDEL_RATE = 1e-8


def indel_binom_mixture_lhood(p: IndelPatterns, ln_ins, ln_del,
                              ln_noisy, ln_theta):
    """Per-pattern mixture of a noisy locus (fitted rates) and a clean
    locus (1e-8 rates) (indelModelVariantAndBinomialMixtureError.cpp
    :181-235). Note the per-pattern mix happens before the instance
    weighting, so this cannot reuse _indel_mixture_lhood's sum."""
    log_hom_prior = ln_theta - LN2
    log_het_prior = ln_theta
    log_althet_prior = ln_theta * 2.0
    theta = jnp.exp(ln_theta)
    log_noindel_prior = jnp.log(1.0 - (theta * 1.5 + theta * theta))

    def obs_mix(li, ld, lref):
        tot_ins, tot_del = _alt_split(p.alt_obs)
        noindel = li * tot_ins + ld * tot_del + lref * p.ref_obs
        is_ins1 = p.max1 < 3
        a1 = jnp.take_along_axis(p.alt_obs, p.max1[:, None], axis=1)[:, 0]
        rem_ins1 = tot_ins - jnp.where(is_ins1, a1, 0.0)
        rem_del1 = tot_del - jnp.where(is_ins1, 0.0, a1)
        het = LOG_HET * (p.ref_obs + a1) + li * rem_ins1 + ld * rem_del1
        hom = (LOG_HOM_ALT * a1 + LOG_HOM_REF * p.ref_obs
               + li * rem_ins1 + ld * rem_del1)
        is_ins2 = p.max2 < 3
        a2 = jnp.take_along_axis(p.alt_obs, p.max2[:, None], axis=1)[:, 0]
        rem_ins2 = rem_ins1 - jnp.where(is_ins2, a2, 0.0)
        rem_del2 = rem_del1 - jnp.where(is_ins2, 0.0, a2)
        althet = (LOG_HET * (a1 + a2) + LOG_HOM_REF * p.ref_obs
                  + li * rem_ins2 + ld * rem_del2)
        return jax.scipy.special.logsumexp(
            jnp.stack([log_hom_prior + hom, log_het_prior + het,
                       log_noindel_prior + noindel,
                       log_althet_prior + althet]), axis=0)

    ln_ref = jnp.log(1.0 - jnp.exp(ln_ins) - jnp.exp(ln_del))
    noisy = obs_mix(ln_ins, ln_del, ln_ref)
    lc = float(np.log(CLEAN_LOCUS_INDEL_RATE))
    lcr = float(np.log(1.0 - CLEAN_LOCUS_INDEL_RATE))
    clean = obs_mix(lc, lc, lcr)
    ln_clean_locus = jnp.log(1.0 - jnp.exp(ln_noisy))
    mix = jnp.logaddexp(ln_clean_locus + clean, ln_noisy + noisy)
    return jnp.sum(mix * p.inst)


# ---------------------------------------------------------------------------
# model 4: beta-binomial error distribution (per indel type)
# ---------------------------------------------------------------------------

def indel_beta_binom_lhood(p: IndelPatterns, ln_mean, ln_conc,
                           is_insert: bool, ln_theta):
    """3-state mixture with a beta-binomial no-indel likelihood
    (indelModelVariantAndBetaBinomialError.cpp:80-208)."""
    mean = jnp.exp(ln_mean)
    conc = jnp.exp(ln_conc)
    alpha = mean * conc
    beta = conc * (1.0 - mean)

    log_hom_prior = ln_theta - LN2
    log_het_prior = ln_theta
    theta = jnp.exp(ln_theta)
    log_noindel_prior = jnp.log(1.0 - theta * 1.5)

    tot_ins, tot_del = _alt_split(p.alt_obs)
    k = tot_ins if is_insert else tot_del
    n_ref = p.ref_obs
    from jax.scipy.special import betaln
    noindel = betaln(k + alpha, n_ref + beta) - betaln(alpha, beta)
    het = LOG_HET * (n_ref + k)
    hom = LOG_HOM_ALT * k + LOG_HOM_REF * n_ref
    mix = jax.scipy.special.logsumexp(
        jnp.stack([log_hom_prior + hom, log_het_prior + het,
                   log_noindel_prior + noindel]), axis=0)
    return jnp.sum(mix * p.inst)


# ---------------------------------------------------------------------------
# SNV independent-error model (per-qual error rates)
# ---------------------------------------------------------------------------

@dataclass
class SnvPatterns:
    """Basecall observation patterns: per-qual alt counts + ref count,
    deduplicated with multiplicities (BasecallCounts export analog)."""
    qual_levels: np.ndarray     # [Q] phred levels
    ref_qual_hist: jnp.ndarray  # [Q] total ref basecalls by qual
    ref_count: jnp.ndarray      # [N] ref basecalls per pattern
    alt_count: jnp.ndarray      # [N, Q] alt basecalls by qual
    inst: jnp.ndarray           # [N]


def snv_indy_lhood(sp: SnvPatterns, ln_err_q, ln_theta):
    """snvModelVariantAndIndyError.cpp:43-108 vectorized."""
    log_hom_prior = ln_theta - LN2
    log_het_prior = ln_theta
    theta = jnp.exp(ln_theta)
    log_novar_prior = jnp.log(1.0 - theta * 1.5)

    ref_total = jnp.sum(sp.ref_qual_hist)
    ref_err_factor = jnp.sum(sp.ref_qual_hist * jnp.exp(ln_err_q))
    ln_novar_ref = jnp.log(1.0 - ref_err_factor / ref_total)

    alt_tot = sp.alt_count.sum(axis=1)
    novar = (ln_novar_ref * sp.ref_count
             + jnp.sum(sp.alt_count * ln_err_q[None, :], axis=1))
    het = LOG_HET * (sp.ref_count + alt_tot)
    hom = LOG_HOM_ALT * alt_tot + LOG_HOM_REF * sp.ref_count
    mix = jax.scipy.special.logsumexp(
        jnp.stack([log_hom_prior + hom, log_het_prior + het,
                   log_novar_prior + novar]), axis=0)
    return jnp.sum(mix * sp.inst)


# ---------------------------------------------------------------------------
# optax fits
# ---------------------------------------------------------------------------

def _fit(loss_fn, x0: np.ndarray, steps: int = 600,
         lr: float = 0.05) -> tuple[np.ndarray, float]:
    import optax
    opt = optax.adam(lr)
    x = jnp.asarray(x0, dtype=jnp.float64)
    state = opt.init(x)
    vg = jax.jit(jax.value_and_grad(loss_fn))

    @jax.jit
    def step(x, state):
        v, g = vg(x)
        updates, state = opt.update(g, state)
        return optax.apply_updates(x, updates), state, v

    v = None
    for _ in range(steps):
        x, state, v = step(x, state)
    return np.asarray(x), float(loss_fn(x))


def fit_indel_indy(counts, lock_theta: bool = False, steps: int = 600):
    """ML fit of {insert rate, delete rate, theta}."""
    p = IndelPatterns.build(counts)

    def loss(x):
        li = _ln_bounded(x[0], 0.5)
        ld = _ln_bounded(x[1], 0.5)
        lt = DEFAULT_LOG_THETA if lock_theta else _ln_bounded(x[2], 0.3)
        return -indel_indy_lhood(p, li, ld, lt)

    x0 = [_bounded_init(1e-4, 0.5)] * 2 + [_bounded_init(1e-4, 0.3)]
    x, neg = _fit(loss, np.array(x0), steps)
    return {
        "insert_rate": float(np.exp(_ln_bounded(x[0], 0.5))),
        "delete_rate": float(np.exp(_ln_bounded(x[1], 0.5))),
        "theta": (1e-4 if lock_theta
                  else float(np.exp(_ln_bounded(x[2], 0.3)))),
        "log_lhood": -neg,
    }


def fit_indel_binom_mixture(counts, lock_theta: bool = False,
                            steps: int = 1500):
    """ML fit of {insert rate, delete rate, noisy-locus rate, theta}.

    Multi-start on the noisy-locus rate (the mixture surface is
    bimodal: all-noisy recovers the indy model; the minimizer can get
    trapped on either side)."""
    p = IndelPatterns.build(counts)

    def loss(x):
        li = _ln_bounded(x[0], 0.5)
        ld = _ln_bounded(x[1], 0.5)
        ln = _ln_bounded(x[2], 1.0)
        lt = DEFAULT_LOG_THETA if lock_theta else _ln_bounded(x[3], 0.3)
        return -indel_binom_mixture_lhood(p, li, ld, ln, lt)

    best = None
    for noisy0 in (0.9, 1e-2):
        x0 = np.array([_bounded_init(1e-4, 0.5), _bounded_init(1e-4, 0.5),
                       _bounded_init(noisy0, 1.0), _bounded_init(1e-4, 0.3)])
        xi, negi = _fit(loss, x0, steps)
        if best is None or negi < best[1]:
            best = (xi, negi)
    x, neg = best
    return {
        "insert_rate": float(np.exp(_ln_bounded(x[0], 0.5))),
        "delete_rate": float(np.exp(_ln_bounded(x[1], 0.5))),
        "noisy_locus_rate": float(np.exp(_ln_bounded(x[2], 1.0))),
        "theta": (1e-4 if lock_theta
                  else float(np.exp(_ln_bounded(x[3], 0.3)))),
        "log_lhood": -neg,
    }


MAX_CONCENTRATION = 2000.0


def fit_indel_beta_binomial(counts, is_insert: bool,
                            lock_theta: bool = False, steps: int = 600):
    """ML fit of the beta-binomial {mean, concentration, theta} for one
    indel type."""
    p = IndelPatterns.build(counts)

    def loss(x):
        lm = _ln_bounded(x[0], 0.5)
        lc = _ln_bounded(x[1], MAX_CONCENTRATION)
        lt = DEFAULT_LOG_THETA if lock_theta else _ln_bounded(x[2], 0.3)
        return -indel_beta_binom_lhood(p, lm, lc, is_insert, lt)

    x0 = np.array([_bounded_init(1e-4, 0.5),
                   _bounded_init(100.0, MAX_CONCENTRATION),
                   _bounded_init(1e-4, 0.3)])
    x, neg = _fit(loss, x0, steps)
    return {
        "mean": float(np.exp(_ln_bounded(x[0], 0.5))),
        "concentration": float(np.exp(_ln_bounded(x[1],
                                                  MAX_CONCENTRATION))),
        "theta": (1e-4 if lock_theta
                  else float(np.exp(_ln_bounded(x[2], 0.3)))),
        "log_lhood": -neg,
    }


def fit_snv_indy(sp: SnvPatterns, lock_theta: bool = False,
                 steps: int = 600):
    """ML fit of per-qual basecall error rates + theta."""
    Q = len(sp.qual_levels)
    r0 = np.power(10.0, -np.asarray(sp.qual_levels, dtype=np.float64) / 10.0)
    x0 = np.array([_bounded_init(r, 0.5) for r in r0]
                  + [_bounded_init(1e-4, 0.3)])

    def loss(x):
        le = _ln_bounded(x[:Q], 0.5)
        lt = DEFAULT_LOG_THETA if lock_theta else _ln_bounded(x[Q], 0.3)
        return -snv_indy_lhood(sp, le, lt)

    x, neg = _fit(loss, x0, steps)
    rates = np.exp(np.asarray(_ln_bounded(jnp.asarray(x[:Q]), 0.5)))
    return {
        "qual_levels": [int(q) for q in sp.qual_levels],
        "error_rates": [float(r) for r in rates],
        "theta": (1e-4 if lock_theta
                  else float(np.exp(theta_smoother(jnp.float64(x[Q]))))),
        "log_lhood": -neg,
    }


# ---------------------------------------------------------------------------
# NoOverlap variants: one indel type, one error rate, 3-state mixture
# (the reference fits these on counts exported without overlapping
# loci; the same pattern arrays serve here — overlap filtering is a
# counts-export concern, not a likelihood concern)
# ---------------------------------------------------------------------------

def indel_indy_noovl_lhood(p: IndelPatterns, ln_indel, is_insert: bool,
                           ln_theta):
    """indelModelVariantAndIndyErrorNoOverlap.cpp:55-112: single indel
    error rate for one indel type, {homref, het, hom} mixture."""
    log_hom_prior = ln_theta - LN2
    log_het_prior = ln_theta
    theta = jnp.exp(ln_theta)
    log_noindel_prior = jnp.log(1.0 - theta * 1.5)
    ln_ref = jnp.log1p(-jnp.exp(ln_indel))

    tot_ins, tot_del = _alt_split(p.alt_obs)
    k = tot_ins if is_insert else tot_del
    noindel = ln_indel * k + ln_ref * p.ref_obs
    het = LOG_HET * (p.ref_obs + k)
    hom = LOG_HOM_ALT * k + LOG_HOM_REF * p.ref_obs
    mix = jax.scipy.special.logsumexp(
        jnp.stack([log_hom_prior + hom, log_het_prior + het,
                   log_noindel_prior + noindel]), axis=0)
    return jnp.sum(mix * p.inst)


def indel_binom_mixture_noovl_lhood(p: IndelPatterns, ln_indel, ln_noisy,
                                    is_insert: bool, ln_theta):
    """indelModelVariantAndBinomialMixtureErrorNoOverlap.cpp:64-160:
    per-locus mixture of a clean locus (rate 1e-8) and a noisy locus
    (fitted rate), single indel type."""
    log_hom_prior = ln_theta - LN2
    log_het_prior = ln_theta
    theta = jnp.exp(ln_theta)
    log_noindel_prior = jnp.log(1.0 - theta * 1.5)

    tot_ins, tot_del = _alt_split(p.alt_obs)
    k = tot_ins if is_insert else tot_del

    def obs(li):
        lref = jnp.log1p(-jnp.exp(li))
        noindel = li * k + lref * p.ref_obs
        het = LOG_HET * (p.ref_obs + k)
        hom = LOG_HOM_ALT * k + LOG_HOM_REF * p.ref_obs
        return jax.scipy.special.logsumexp(
            jnp.stack([log_hom_prior + hom, log_het_prior + het,
                       log_noindel_prior + noindel]), axis=0)

    noisy = obs(ln_indel)
    clean = obs(float(np.log(CLEAN_LOCUS_INDEL_RATE)))
    ln_clean_locus = jnp.log1p(-jnp.exp(ln_noisy))
    mix = jnp.logaddexp(ln_clean_locus + clean, ln_noisy + noisy)
    return jnp.sum(mix * p.inst)


def fit_indel_indy_noovl(counts, is_insert: bool,
                         lock_theta: bool = False, steps: int = 600):
    """ML fit of {indel rate, theta} for one indel type."""
    p = IndelPatterns.build(counts)

    def loss(x):
        li = _ln_bounded(x[0], 0.5)
        lt = DEFAULT_LOG_THETA if lock_theta else _ln_bounded(x[1], 0.3)
        return -indel_indy_noovl_lhood(p, li, is_insert, lt)

    x0 = np.array([_bounded_init(1e-4, 0.5), _bounded_init(1e-4, 0.3)])
    x, neg = _fit(loss, x0, steps)
    return {
        "indel_rate": float(np.exp(_ln_bounded(x[0], 0.5))),
        "theta": (1e-4 if lock_theta
                  else float(np.exp(_ln_bounded(x[1], 0.3)))),
        "log_lhood": -neg,
    }


def fit_indel_binom_mixture_noovl(counts, is_insert: bool,
                                  lock_theta: bool = False,
                                  steps: int = 1500):
    """ML fit of {indel rate, noisy-locus rate, theta} for one indel
    type; multi-start on the noisy-locus rate (bimodal surface, see
    fit_indel_binom_mixture)."""
    p = IndelPatterns.build(counts)

    def loss(x):
        li = _ln_bounded(x[0], 0.5)
        ln = _ln_bounded(x[1], 1.0)
        lt = DEFAULT_LOG_THETA if lock_theta else _ln_bounded(x[2], 0.3)
        return -indel_binom_mixture_noovl_lhood(p, li, ln, is_insert, lt)

    best = None
    for noisy0 in (0.9, 1e-2):
        x0 = np.array([_bounded_init(1e-4, 0.5),
                       _bounded_init(noisy0, 1.0),
                       _bounded_init(1e-4, 0.3)])
        xi, negi = _fit(loss, x0, steps)
        if best is None or negi < best[1]:
            best = (xi, negi)
    x, neg = best
    return {
        "indel_rate": float(np.exp(_ln_bounded(x[0], 0.5))),
        "noisy_locus_rate": float(np.exp(_ln_bounded(x[1], 1.0))),
        "theta": (1e-4 if lock_theta
                  else float(np.exp(_ln_bounded(x[2], 0.3)))),
        "log_lhood": -neg,
    }


# ---------------------------------------------------------------------------
# SNV binomial-mixture model: per-qual noisy rates + per-site
# clean/noisy mixture with clean rates tied to noisy rates by a
# log-space exponent (snvModelVariantAndBinomialMixtureError.cpp)
# ---------------------------------------------------------------------------

def snv_binom_mixture_lhood(sp: SnvPatterns, ln_err_q, ln_clean_q,
                            ln_noisy, ln_theta):
    """getObsLogLhood of snvModelVariantAndBinomialMixtureError.cpp
    :60-155 (the strand-combined branch the reference compiles) summed
    over patterns: the no-variant state is a per-SITE clean/noisy
    mixture; het/hom states are rate-free as in the indy model."""
    log_hom_prior = ln_theta - LN2
    log_het_prior = ln_theta
    theta = jnp.exp(ln_theta)
    log_novar_prior = jnp.log(1.0 - theta * 1.5)

    ref_total = jnp.sum(sp.ref_qual_hist)
    ln_novar_ref = jnp.log1p(
        -jnp.sum(sp.ref_qual_hist * jnp.exp(ln_err_q)) / ref_total)
    ln_novar_clean_ref = jnp.log1p(
        -jnp.sum(sp.ref_qual_hist * jnp.exp(ln_clean_q)) / ref_total)
    ln_clean_locus = jnp.log1p(-jnp.exp(ln_noisy))

    novar_noise = (ln_novar_ref * sp.ref_count
                   + jnp.sum(sp.alt_count * ln_err_q[None, :], axis=1))
    novar_clean = (ln_novar_clean_ref * sp.ref_count
                   + jnp.sum(sp.alt_count * ln_clean_q[None, :], axis=1))
    novar = jnp.logaddexp(ln_noisy + novar_noise,
                          ln_clean_locus + novar_clean)

    alt_tot = sp.alt_count.sum(axis=1)
    het = LOG_HET * (sp.ref_count + alt_tot)
    hom = LOG_HOM_ALT * alt_tot + LOG_HOM_REF * sp.ref_count
    mix = jax.scipy.special.logsumexp(
        jnp.stack([log_hom_prior + hom, log_het_prior + het,
                   log_novar_prior + novar]), axis=0)
    return jnp.sum(mix * sp.inst)


def fit_snv_binom_mixture(sp: SnvPatterns, lock_theta: bool = False,
                          steps: int = 1500):
    """ML fit of per-qual noisy rates, the clean-rate exponent
    (logClean = logNoisy * factor, factor > 1 => cleaner,
    getLogCleanLocusBaseErrorRate :50-55), the noisy-locus rate, and
    theta."""
    Q = len(sp.qual_levels)
    r0 = np.power(10.0, -np.asarray(sp.qual_levels, dtype=np.float64) / 10.0)

    def loss(x):
        le = _ln_bounded(x[:Q], 0.5)
        factor = 1.0 + jnp.exp(x[Q])
        lc = le * factor
        ln = _ln_bounded(x[Q + 1], 1.0)
        lt = DEFAULT_LOG_THETA if lock_theta else _ln_bounded(x[Q + 2], 0.3)
        return -snv_binom_mixture_lhood(sp, le, lc, ln, lt)

    best = None
    for noisy0 in (0.9, 1e-2):
        x0 = np.array([_bounded_init(r, 0.5) for r in r0]
                      + [float(np.log(1.0)),
                         _bounded_init(noisy0, 1.0),
                         _bounded_init(1e-4, 0.3)])
        xi, negi = _fit(loss, x0, steps)
        if best is None or negi < best[1]:
            best = (xi, negi)
    x, neg = best
    rates = np.exp(np.asarray(_ln_bounded(jnp.asarray(x[:Q]), 0.5)))
    return {
        "qual_levels": [int(q) for q in sp.qual_levels],
        "error_rates": [float(r) for r in rates],
        "clean_rate_exponent": float(1.0 + np.exp(x[Q])),
        "noisy_locus_rate": float(np.exp(_ln_bounded(x[Q + 1], 1.0))),
        "theta": (1e-4 if lock_theta
                  else float(np.exp(_ln_bounded(x[Q + 2], 0.3)))),
        "log_lhood": -neg,
    }


# ---------------------------------------------------------------------------
# model 1: direct summary rates with noisy-locus exclusion
# ---------------------------------------------------------------------------

def indel_model1_report(counts, is_insert: bool,
                        max_alt_frac: float = 0.05,
                        min_depth: int = 25) -> dict:
    """indelModel1.cpp:60-100 reportExtendedContext: exclude loci that
    are shallow or noisy (altFrac > 5%), report the pooled error rate
    and its 95% Clopper-Pearson upper bound."""
    from scipy.stats import beta as beta_dist

    ref = np.asarray(counts.ref_obs, dtype=np.float64)
    alt6 = np.asarray(counts.alt_obs, dtype=np.float64)
    inst = np.asarray(counts.instance_count, dtype=np.float64)
    alt = alt6[:, :3].sum(axis=1) if is_insert else alt6[:, 3:].sum(axis=1)
    total = ref + alt
    used = (total >= min_depth) & \
        (np.divide(alt, np.maximum(total, 1)) <= max_alt_frac)
    sig_ref = float((ref[used] * inst[used]).sum())
    sig_alt = float((alt[used] * inst[used]).sum())
    sig_tot = sig_ref + sig_alt
    alpha = 0.05
    if sig_tot <= 0:
        upper = 1.0
    elif sig_alt >= sig_tot:
        upper = 1.0
    else:
        upper = float(beta_dist.ppf(1.0 - alpha, sig_alt + 1,
                                    sig_tot - sig_alt))
    return {
        "loci": float(inst.sum()),
        "used_loci": float(inst[used].sum()),
        "ref_reads": sig_ref,
        "alt_reads": sig_alt,
        "rate": sig_alt / sig_tot if sig_tot > 0 else 0.0,
        "rate_95pct_upper_bound": upper,
    }
