"""Adaptive indel error-rate estimation: counts + vectorized ML fit.

Reference: applications/EstimateVariantErrorRates/IndelModelProduction.cpp
(getObsLogLhood :57-170, contextLogLhood :176-229, parameter smoothers
:260-345, estimateModelParams :411-436, estimateIndelErrorRates
:462-505) and the GetSequenceAlleleCounts counting app
(SequenceAlleleCountsPosProcessor.cpp).

TPU-native redesign: the reference minimizes each STR context's mixture
likelihood with a serial conjugate-direction minimizer (CodeMin); here
the per-locus observation patterns are dense arrays and the likelihood/
gradient evaluate vectorized in JAX, optimized with optax adam — every
context fits in parallel on one device.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

# INDEL_SIGNAL_TYPE: INSERT_1, INSERT_2, INSERT_GE3, DELETE_1, DELETE_2, DELETE_GE3
N_SIGNAL = 6
INSERT_SLOTS = slice(0, 3)
DELETE_SLOTS = slice(3, 6)

LOW_REPEAT_COUNT = 2                    # AdaptiveIndelErrorModel::lowRepeatCount
MAX_REPEAT_COUNTS = {1: 16, 2: 9}      # _maxRepeatCounts
HOM_ALT_RATE = 0.99
CLEAN_LOCUS_INDEL_RATE = 1e-8
MAX_LOG_RATE = float(np.log(0.5))
MAX_LOG_LOCUS_RATE = float(np.log(1.0))


def signal_index(is_insertion: bool, length: int) -> int:
    base = 0 if is_insertion else 3
    return base + min(length, 3) - 1


@dataclass
class ContextCounts:
    """Deduplicated locus observation patterns for one STR context."""
    ref_obs: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int64))
    alt_obs: np.ndarray = field(default_factory=lambda: np.zeros((0, N_SIGNAL), np.int64))
    instance_count: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int64))

    @property
    def total_instances(self) -> int:
        return int(self.instance_count.sum())


def dedupe_counts(ref_obs: np.ndarray, alt_obs: np.ndarray) -> ContextCounts:
    """Compress identical (ref, alt[6]) patterns into instance counts
    (the reference's context/observation compression)."""
    rows = np.concatenate([ref_obs[:, None], alt_obs], axis=1)
    uniq, counts = np.unique(rows, axis=0, return_counts=True)
    return ContextCounts(ref_obs=uniq[:, 0], alt_obs=uniq[:, 1:],
                         instance_count=counts)


# --------------------------------------------------------------------------
# likelihood (exact transcription of getObsLogLhood + contextLogLhood)
# --------------------------------------------------------------------------

def _obs_log_lhood(log_ins, log_del, log_ref_rate, ref_obs, alt_obs,
                   log_theta):
    """Vectorized per-locus genotype-marginalized log lhood [N]."""
    log2 = jnp.log(2.0)
    log_hom_prior = log_theta - log2
    log_het_prior = log_theta
    log_althet_prior = log_theta * 2
    theta = jnp.exp(log_theta)
    log_noindel_prior = jnp.log(1 - (theta * 3.0 / 2.0 + theta * theta))

    log_hom_alt = jnp.log(HOM_ALT_RATE)
    log_hom_ref = jnp.log(1 - HOM_ALT_RATE)
    log_het = jnp.log(0.5)

    ins_tot = jnp.sum(alt_obs[:, INSERT_SLOTS], axis=1)
    del_tot = jnp.sum(alt_obs[:, DELETE_SLOTS], axis=1)

    noindel = log_ins * ins_tot + log_del * del_tot + log_ref_rate * ref_obs

    # most frequent alt = candidate variant allele
    max_idx = jnp.argmax(alt_obs, axis=1)
    max_val = jnp.max(alt_obs, axis=1)
    is_ins_max = max_idx < 3
    rem_ins = ins_tot - jnp.where(is_ins_max, max_val, 0)
    rem_del = del_tot - jnp.where(is_ins_max, 0, max_val)

    het = (log_het * (ref_obs + max_val) + log_ins * rem_ins + log_del * rem_del)
    hom = (log_hom_alt * max_val + log_hom_ref * ref_obs +
           log_ins * rem_ins + log_del * rem_del)

    # second most frequent alt for alt-het
    masked = jnp.where(jax.nn.one_hot(max_idx, N_SIGNAL, dtype=bool),
                       -1, alt_obs)
    max2_idx = jnp.argmax(masked, axis=1)
    max2_val = jnp.max(masked, axis=1)
    max2_val = jnp.maximum(max2_val, 0)
    is_ins_max2 = max2_idx < 3
    rem_ins2 = rem_ins - jnp.where(is_ins_max2, max2_val, 0)
    rem_del2 = rem_del - jnp.where(is_ins_max2, 0, max2_val)
    althet = (log_het * (max_val + max2_val) + log_hom_ref * ref_obs +
              log_ins * rem_ins2 + log_del * rem_del2)

    stacked = jnp.stack([
        log_hom_prior + hom, log_het_prior + het,
        log_noindel_prior + noindel, log_althet_prior + althet], axis=0)
    return jax.scipy.special.logsumexp(stacked, axis=0)


def context_log_lhood(log_ins, log_del, log_noisy, log_theta,
                      ref_obs, alt_obs, instance_count):
    """contextLogLhood: noisy/clean mixture summed over loci."""
    log_ref_rate = jnp.log(1 - jnp.exp(log_ins) - jnp.exp(log_del))
    log_clean = jnp.log(CLEAN_LOCUS_INDEL_RATE)
    log_clean_ref = jnp.log(1 - CLEAN_LOCUS_INDEL_RATE)
    log_clean_locus = jnp.log1p(-jnp.exp(log_noisy))

    noisy_mix = _obs_log_lhood(log_ins, log_del, log_ref_rate,
                               ref_obs, alt_obs, log_theta)
    clean_mix = _obs_log_lhood(log_clean, log_clean, log_clean_ref,
                               ref_obs, alt_obs, log_theta)
    mix = jnp.logaddexp(log_clean_locus + clean_mix, log_noisy + noisy_mix)
    return jnp.sum(mix * instance_count)


def _rate_smoother(a, max_log):
    trigger = jnp.log(1e-3) if max_log == MAX_LOG_RATE else jnp.log(0.8)
    a = jnp.where(a > trigger, jnp.log1p(a - trigger) + trigger, a)
    return jnp.where(a > max_log, max_log - jnp.abs(a - max_log), a)


@dataclass
class FitResult:
    log_error_rate: float
    log_noisy_locus_rate: float
    log_insert_rate: float
    log_delete_rate: float
    acceptable: bool
    n_instances: int


def fit_context(counts: ContextCounts, log_theta: float,
                n_steps: int = 600, lr: float = 0.05) -> FitResult:
    """ML fit of (ln insert, ln delete, ln noisy-locus) rates with the
    reference's smoother reparameterization; theta locked."""
    import optax

    if counts.total_instances == 0:
        return FitResult(-np.inf, -np.inf, -np.inf, -np.inf, False, 0)

    ref_obs = jnp.asarray(counts.ref_obs, jnp.float64)
    alt_obs = jnp.asarray(counts.alt_obs, jnp.float64)
    inst = jnp.asarray(counts.instance_count, jnp.float64)
    lt = jnp.float64(log_theta)

    def neg_lhood(params):
        li = _rate_smoother(params[0], MAX_LOG_RATE)
        ld = _rate_smoother(params[1], MAX_LOG_RATE)
        ln = _rate_smoother(params[2], MAX_LOG_LOCUS_RATE)
        return -context_log_lhood(li, ld, ln, lt, ref_obs, alt_obs, inst)

    params = jnp.array([np.log(1e-3), np.log(1e-3), np.log(0.5)])
    opt = optax.adam(lr)
    state = opt.init(params)
    vg = jax.jit(jax.value_and_grad(neg_lhood))

    @jax.jit
    def step(params, state):
        v, g = jax.value_and_grad(neg_lhood)(params)
        updates, state = opt.update(g, state)
        return optax.apply_updates(params, updates), state, v

    best = None
    for _ in range(n_steps):
        params, state, v = step(params, state)
        if best is None or float(v) < best[0]:
            best = (float(v), np.asarray(params))
    del vg
    p = best[1]
    li = float(_rate_smoother(p[0], MAX_LOG_RATE))
    ld = float(_rate_smoother(p[1], MAX_LOG_RATE))
    ln = float(_rate_smoother(p[2], MAX_LOG_LOCUS_RATE))
    log_err = (li + ld) / 2.0
    return FitResult(log_err, ln, li, ld, True, counts.total_instances)


def _linear_fit(x, x1, y1, x2, y2):
    return ((x2 - x) * y1 + (x - x1) * y2) / (x2 - x1)


def estimate_indel_error_model(
    counts_by_context: dict[tuple[int, int], ContextCounts],
    thetas: dict[int, np.ndarray] | None = None,
    sample_name: str = "Sample000",
    min_instances: int = 100,
):
    """Full estimation pipeline -> model dict in the engine's JSON
    format (estimateIndelErrorRates + generateIndelErrorModelJson).
    Returns (model_dict, acceptable)."""
    from .indel_genotype import THETA_TABLES
    if thetas is None:
        thetas = THETA_TABLES

    from .error_model import adaptive_default_error_model
    static = adaptive_default_error_model()

    motifs = []
    acceptable = True

    def fallback(fit: FitResult, ps: int, rc: int) -> FitResult:
        """Static-model substitution when a context fit fails
        (strelkaGermlineWorkflow.py:280-301 validation rule)."""
        if fit.acceptable and fit.n_instances >= min_instances and \
                np.isfinite(fit.log_error_rate):
            return fit
        rate = float(static.get_rate(ps, rc, "I"))
        return FitResult(np.log(rate), np.log(1e-9), np.log(rate),
                         np.log(rate), False, fit.n_instances)

    # non-STR context (1, 1)
    non_str = fit_context(counts_by_context.get((1, 1), ContextCounts()),
                          float(np.log(thetas[1][0])))
    non_str = fallback(non_str, 1, 1)
    acceptable &= non_str.acceptable

    for ps, high in MAX_REPEAT_COUNTS.items():
        theta = thetas[ps]
        motifs.append({"repeatPatternSize": ps, "repeatCount": 1,
                       "indelRate": float(np.exp(non_str.log_error_rate)),
                       "noisyLocusRate": float(np.exp(non_str.log_noisy_locus_rate))})
        low = fit_context(counts_by_context.get((ps, LOW_REPEAT_COUNT), ContextCounts()),
                          float(np.log(theta[LOW_REPEAT_COUNT - 1])))
        hi = fit_context(counts_by_context.get((ps, high), ContextCounts()),
                         float(np.log(theta[high - 1])))
        acceptable &= low.acceptable and hi.acceptable
        low = fallback(low, ps, LOW_REPEAT_COUNT)
        hi = fallback(hi, ps, high)
        for rc in range(LOW_REPEAT_COUNT, high + 1):
            if rc >= high:
                le, ln = hi.log_error_rate, hi.log_noisy_locus_rate
            else:
                le = _linear_fit(rc, LOW_REPEAT_COUNT, low.log_error_rate,
                                 high, hi.log_error_rate)
                ln = _linear_fit(rc, LOW_REPEAT_COUNT, low.log_noisy_locus_rate,
                                 high, hi.log_noisy_locus_rate)
            motifs.append({"repeatPatternSize": ps, "repeatCount": rc,
                           "indelRate": float(np.exp(le)),
                           "noisyLocusRate": float(np.exp(ln))})

    model = {"sample": [{"sampleName": sample_name, "motif": motifs,
                         "isStatic": False}]}
    return model, acceptable
