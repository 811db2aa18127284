"""Somatic SNV strand-grid model (tumor/normal joint calling).

Reference: applications/strelka/position_somatic_snv_strand_grid.cpp,
position_somatic_snv_strand_grid_lhood_cached.cpp, qscore_calculator.cpp
calculate_result_set_grid:46-209, strelka_digt_states.hh (DIGT_GRID:
21 pre-strand frequency states = {REF=0, HOM=1, HET=0.5} + 18 grid
fractions; + 9 tumor strand states).

Vectorized design: every state is just an expected non-ref allele
frequency f, and each basecall contributes
    obs==ref:  ln((1-e)(1-f) + (e/3) f)
    obs!=ref:  ln((1-e) f    + (e/3)(1-f))
so the whole [loci, 21] likelihood tensor is one outer product over the
frequency grid. The (Gn x somatic x Fn x Ft) joint posterior becomes a
masked logsumexp against precomputed prior tensors — vmapped over loci
instead of the reference's per-position nested loops.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# --- state space (strelka_digt_states.hh) ---------------------------------
HET_RES = 9
HET_COUNT = HET_RES * 2 + 1
PRESTRAND_SIZE = 2 + HET_COUNT          # 21
STRAND_STATE_SIZE = HET_RES             # 9
GRID_SIZE = PRESTRAND_SIZE + STRAND_STATE_SIZE
RATIO_INCREMENT = 0.5 / (HET_RES + 1)   # 0.05

REF, HOM, HET = 0, 1, 2  # SOMATIC_DIGT
NON_SOMATIC, SOMATIC = 0, 1


def fraction_from_index(i: int) -> float:
    """strelka_digt_states.cpp get_fraction_from_index."""
    if i == REF:
        return 0.0
    if i == HOM:
        return 1.0
    if i == HET:
        return 0.5
    if i < 3 + HET_RES:
        return RATIO_INCREMENT * (i - 3 + 1)
    return RATIO_INCREMENT * (i - 3 + 2)


FRACTIONS = np.array([fraction_from_index(i) for i in range(PRESTRAND_SIZE)])
STRAND_FRACTIONS = np.array([(i + 1) * RATIO_INCREMENT for i in range(HET_RES)])


# --- per-sample frequency-grid likelihoods --------------------------------

_QTAB_SIZE = 128


@functools.lru_cache(maxsize=1)
def _freq_grid_tables():
    """[Q, F] / [Q, S] f32 log-contribution tables per basecall qscore
    (numpy, cached outside any trace; see CLAUDE.md lru_cache note).
    Values match the inline f32 formulas bit for bit."""
    q = np.arange(_QTAB_SIZE, dtype=np.float32)
    with np.errstate(divide="ignore"):
        e = np.power(np.float32(10.0), -q / np.float32(10.0),
                     dtype=np.float32)
        ce = (np.float32(1.0) - e).astype(np.float32)
        f = np.asarray(FRACTIONS, np.float32)
        r = np.asarray(STRAND_FRACTIONS, np.float32)
        ref_t = np.log(ce[:, None] * (1 - f) + (e[:, None] / 3.0) * f
                       ).astype(np.float32)
        alt_t = np.log(ce[:, None] * f + (e[:, None] / 3.0) * (1 - f)
                       ).astype(np.float32)
        on_ref = np.log(ce[:, None] * (1 - r) + (e[:, None] / 3.0) * r
                        ).astype(np.float32)
        on_alt = np.log(ce[:, None] * r + (e[:, None] / 3.0) * (1 - r)
                        ).astype(np.float32)
        off_ref = (np.log(ce)[:, None] * np.ones_like(r)).astype(np.float32)
        off_alt = ((np.log(e) + np.log(np.float32(1.0 / 3.0)))[:, None]
                   * np.ones_like(r)).astype(np.float32)
    return ref_t, alt_t, on_ref, on_alt, off_ref, off_alt


@functools.lru_cache(maxsize=1)
def _freq_grid_matmul_tables():
    """Tables for the histogram->matmul formulation, with the three
    -inf entries (q=0: ln(1-e)=ln 0) zeroed out of the matmul and
    re-applied exactly afterwards (numpy, cached outside any trace)."""
    ref_t, alt_t, on_ref, on_alt, off_ref, off_alt = _freq_grid_tables()
    ref_m = ref_t.copy()
    alt_m = alt_t.copy()
    off_ref_m = off_ref.copy()
    ref_m[0, 0] = 0.0        # ref call, f=0 state (REF) at q=0
    alt_m[0, 1] = 0.0        # alt call, f=1 state (HOM) at q=0
    off_ref_m[0, :] = 0.0    # off-strand ref call at q=0
    return ref_m, alt_m, on_ref, on_alt, off_ref_m, off_alt


@jax.jit
def freq_grid_lhoods(base_id, qual, mask, is_fwd, ref_gt):
    """[L, GRID_SIZE] log lhoods for a pileup tile.

    base_id/qual/mask/is_fwd: [L, D]; ref_gt: [L].
    States 0..20 = symmetric frequency grid; 21..29 = strand states
    (max over fwd-only / rev-only noise, get_strand_ratio_lhood_spi).

    TPU-first formulation of het_ratio_cache (het_ratio_cache.hh:40-46):
    each call's contribution depends only on (qscore, is_alt, strand),
    so the tile reduces to per-locus qscore histograms followed by
    [L,Q] x [Q,F] matmuls against precomputed log-contribution tables —
    MXU work instead of per-call transcendentals. The q=0 -inf entries
    (ln(1-e) = ln 0) are excluded from the matmul and re-applied
    exactly afterwards.
    """
    L, D = base_id.shape
    q_idx = jnp.clip(qual.astype(jnp.int32), 0, _QTAB_SIZE - 1)
    (ref_m, alt_m, t_on_ref, t_on_alt, off_ref_m, t_off_alt) = (
        jnp.asarray(t) for t in _freq_grid_matmul_tables())
    is_ref = (base_id == ref_gt[:, None]) & mask
    is_alt = (base_id != ref_gt[:, None]) & mask
    valid = is_ref | is_alt
    # class packing: (is_alt << 1) | is_fwd; invalid lanes -> overflow bin
    cls = (is_alt.astype(jnp.int32) << 1) | is_fwd.astype(jnp.int32)
    idx = jnp.where(valid, q_idx * 4 + cls, 4 * _QTAB_SIZE)
    hist = jnp.zeros((L, 4 * _QTAB_SIZE + 1), jnp.float32)
    hist = hist.at[jnp.arange(L)[:, None], idx].add(1.0)
    h = hist[:, :4 * _QTAB_SIZE].reshape(L, _QTAB_SIZE, 4)
    h_ref_rev, h_ref_fwd = h[:, :, 0], h[:, :, 1]
    h_alt_rev, h_alt_fwd = h[:, :, 2], h[:, :, 3]
    h_ref = h_ref_rev + h_ref_fwd
    h_alt = h_alt_rev + h_alt_fwd

    lh = h_ref @ ref_m + h_alt @ alt_m                              # [L, F]
    # strand states: on-strand noise at ratio r, off strand pure ref
    lh_fwd = (h_ref_fwd @ t_on_ref + h_alt_fwd @ t_on_alt
              + h_ref_rev @ off_ref_m + h_alt_rev @ t_off_alt)       # [L, S]
    lh_rev = (h_ref_rev @ t_on_ref + h_alt_rev @ t_on_alt
              + h_ref_fwd @ off_ref_m + h_alt_fwd @ t_off_alt)

    # exact -inf re-application for the q=0 ln(0) entries
    ninf = jnp.float32(-jnp.inf)
    q0_ref_fwd = h_ref_fwd[:, 0] > 0
    q0_ref_rev = h_ref_rev[:, 0] > 0
    q0_alt = (h_alt_fwd[:, 0] + h_alt_rev[:, 0]) > 0
    lh = lh.at[:, 0].set(jnp.where(q0_ref_fwd | q0_ref_rev, ninf,
                                   lh[:, 0]))
    lh = lh.at[:, 1].set(jnp.where(q0_alt, ninf, lh[:, 1]))
    lh_fwd = jnp.where(q0_ref_rev[:, None], ninf, lh_fwd)
    lh_rev = jnp.where(q0_ref_fwd[:, None], ninf, lh_rev)

    ln_half = jnp.float32(np.log(0.5))
    strand = jnp.logaddexp(lh_fwd, lh_rev) + ln_half
    return jnp.concatenate([lh, strand], axis=-1)                    # [L, 30]


# --- joint posterior prior tensors ----------------------------------------

@functools.lru_cache(maxsize=8)
def build_joint_prior(contam_tolerance: float, shared_error_rate: float,
                      somatic_rate: float, theta: float,
                      sse_strand_fraction: float = 0.5):
    """Precompute the (ngt, tgt, fn, ft) log-prior tensor with -inf at
    excluded combinations (qscore_calculator.cpp:67-142) plus the
    (ngt, tgt) genotype prior.

    ln_sse uses only the non-strand-specific portion of the shared
    error rate while the complement uses the full rate
    (somatic_snv_caller_strand_grid ctor,
    position_somatic_snv_strand_grid.cpp:43-55)."""
    log_error_mod = -np.log(PRESTRAND_SIZE - 1)
    ln_half = np.log(0.5)
    ln_sse = np.log(shared_error_rate * (1.0 - sse_strand_fraction))
    ln_csse = np.log1p(-shared_error_rate)

    pf = np.full((3, 2, PRESTRAND_SIZE, PRESTRAND_SIZE), -np.inf)
    for ngt in range(3):
        for fti in range(PRESTRAND_SIZE):
            ft = FRACTIONS[fti]
            consider_contam = contam_tolerance * ft >= RATIO_INCREMENT
            for fni in range(PRESTRAND_SIZE):
                # non-somatic: Fn == Ft
                if fni == fti:
                    pf[ngt, NON_SOMATIC, fni, fti] = (
                        ln_csse if fni == ngt else ln_sse + log_error_mod)
                else:
                    # somatic: Fn != Ft
                    if ngt != REF:
                        if fni == ngt:
                            pf[ngt, SOMATIC, fni, fti] = log_error_mod
                    else:
                        if not consider_contam:
                            if fni == 0:
                                pf[ngt, SOMATIC, fni, fti] = log_error_mod
                        else:
                            if fni == ngt or fni == 3:  # Fn=0 or Fn=0.05
                                pf[ngt, SOMATIC, fni, fti] = (
                                    log_error_mod + ln_half)
    # genotype priors
    g = np.empty(3)
    g[REF] = np.log1p(-(3.0 * theta) / 2.0)
    g[HOM] = np.log(theta / 2.0)
    g[HET] = np.log(theta)
    lnmatch = np.log1p(-somatic_rate)
    lnmismatch = np.log(somatic_rate)
    gp = g[:, None] + np.array([lnmatch, lnmismatch])[None, :]  # [3, 2]
    del ln_half
    # return numpy (NOT jnp): this function is lru_cached and may be
    # first called inside a jit trace — caching tracers leaks them
    return pf.astype(np.float32), gp.astype(np.float32)


class SomaticSnvResult(NamedTuple):
    qphred: jnp.ndarray            # [L] Q(somatic)
    from_ntype_qphred: jnp.ndarray # [L] Q(somatic & normal=ntype)
    ntype: jnp.ndarray             # [L] normal genotype index (REF/HOM/HET)
    max_gt: jnp.ndarray            # [L] DDIGT joint state
    strand_bias: jnp.ndarray       # [L]
    nonsomatic_qphred: jnp.ndarray # [L]


# Device-launch row cap for the joint posterior. The tunneled TPU
# backend DETERMINISTICALLY miscompiles the [L,3,2,F,F] broadcast +
# logsumexp at L=32768 (row-local math returns different values for
# bit-identical rows depending on batch height: q collapses to a
# smooth 1..21 cloud on ~14% of rows, reproduced in f32 and f64, while
# L<=16384 is bit-identical to CPU; see docs/tpu_backend_shape_bug.md).
# All production entry points route through somatic_snv_call_capped so
# no posterior launch exceeds this height; 8192 keeps a 2x margin
# below the measured cliff.
SNV_CALL_ROW_CAP = 8192


def somatic_snv_call_capped(normal_lhood, tumor_lhood, **kw) -> "SomaticSnvResult":
    """somatic_snv_call with the batch axis chunked to SNV_CALL_ROW_CAP
    rows per device launch (results concatenated on device; identical
    per-row math — the call is row-local)."""
    L = normal_lhood.shape[0]
    if L <= SNV_CALL_ROW_CAP:
        return somatic_snv_call(normal_lhood, tumor_lhood, **kw)
    parts = [somatic_snv_call(normal_lhood[i:i + SNV_CALL_ROW_CAP],
                              tumor_lhood[i:i + SNV_CALL_ROW_CAP], **kw)
             for i in range(0, L, SNV_CALL_ROW_CAP)]
    return SomaticSnvResult(*[jnp.concatenate([getattr(p, f) for p in parts])
                              for f in SomaticSnvResult._fields])


@functools.partial(jax.jit, static_argnames=("contam_tolerance",
                                             "shared_error_rate",
                                             "somatic_rate", "theta",
                                             "sse_strand_fraction"))
def somatic_snv_call(normal_lhood, tumor_lhood,
                     contam_tolerance=0.15, shared_error_rate=5e-10,
                     somatic_rate=1e-4, theta=0.001,
                     sse_strand_fraction=0.0) -> SomaticSnvResult:
    """Joint somatic posterior over batched loci.

    normal_lhood/tumor_lhood: [L, GRID_SIZE] from freq_grid_lhoods.
    Strand-bias-split shared error: strand fraction defaults applied by
    caller via shared_error_rate (ln_sse uses the no-strand portion,
    somatic_snv_caller_strand_grid ctor).
    """
    pf, gp = build_joint_prior(contam_tolerance, shared_error_rate,
                               somatic_rate, theta, sse_strand_fraction)
    pf = jnp.asarray(pf)
    gp = jnp.asarray(gp)
    nl = normal_lhood[:, :PRESTRAND_SIZE]
    tl = tumor_lhood[:, :PRESTRAND_SIZE]
    # [L, 3, 2, fn, ft]
    s = pf[None] + nl[:, None, None, :, None] + tl[:, None, None, None, :]
    lse = jax.scipy.special.logsumexp(s.reshape(s.shape[0], 3, 2, -1), axis=-1)
    log_post = lse + gp[None]                                   # [L, 3, 2]

    # posterior normalization in f64 (the reference stores post_prob as
    # double, qscore_calculator.cpp:183-207; f32 cannot represent
    # 1 - 1e-12 complements needed for from_ntype scores)
    flat = log_post.reshape(-1, 6).astype(jnp.float64)
    mx = jnp.max(flat, axis=-1, keepdims=True)
    p = jnp.exp(flat - mx)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    p = p.reshape(-1, 3, 2)

    nonsom = jnp.sum(p[:, :, NON_SOMATIC], axis=-1)
    som_given_n = p[:, :, SOMATIC]
    # err[n] = everything except (n, SOMATIC), summed explicitly for
    # precision (complement-sum, prob_comp semantics)
    total_som = jnp.sum(som_given_n, axis=-1, keepdims=True)
    err_som_and_ngt = nonsom[:, None] + (total_som - som_given_n)  # [L, 3]
    ntype = jnp.argmin(err_som_and_ngt, axis=-1)
    min_err = jnp.min(err_som_and_ngt, axis=-1)

    tiny = jnp.finfo(jnp.float64).tiny
    q = jnp.minimum(jnp.floor(-10 * jnp.log10(jnp.maximum(nonsom, tiny)) + 0.5), 999)
    qn = jnp.minimum(jnp.floor(-10 * jnp.log10(jnp.maximum(min_err, tiny)) + 0.5), 999)

    max_flat = jnp.argmax(log_post.reshape(-1, 6), axis=-1)

    # strand bias: max strand-state lhood minus max symmetric het-grid
    symm = jnp.max(tumor_lhood[:, 3:PRESTRAND_SIZE], axis=-1)
    strand = jnp.max(tumor_lhood[:, PRESTRAND_SIZE:], axis=-1)
    sb = jnp.maximum(0.0, strand - symm)

    # nonsomatic quality (gvcf_nonsomatic_gvcf_prior): uniform prior,
    # restricted 'valid' tumor freq states
    valid_t = (FRACTIONS >= 0.1 - 1e-4) & (FRACTIONS <= 0.9 + 1e-4)
    valid_t |= np.arange(PRESTRAND_SIZE) < 2  # REF/HOM always valid
    vmask = jnp.asarray(valid_t)
    eq_prior = jnp.where(vmask, 0.0, -jnp.inf)                   # fn == ft
    pp_diag = nl + tl + eq_prior[None]
    is_ref_or_hom = jnp.asarray(np.arange(PRESTRAND_SIZE) < 2)
    off_prior = jnp.where(vmask[None, :],
                          jnp.where(is_ref_or_hom[:, None], np.log(0.5),
                                    -jnp.inf),
                          -jnp.inf)
    pp_off = nl[:, :, None] + tl[:, None, :] + off_prior[None]
    denom = jnp.logaddexp(
        jax.scipy.special.logsumexp(pp_diag, axis=-1),
        jax.scipy.special.logsumexp(
            jnp.where(jnp.eye(PRESTRAND_SIZE, dtype=bool)[None], -jnp.inf,
                      pp_off).reshape(pp_off.shape[0], -1), axis=-1))
    num = jax.scipy.special.logsumexp(pp_diag, axis=-1)
    nonsom_frac = jnp.exp(num - denom)
    qns = jnp.minimum(jnp.floor(-10 * jnp.log10(
        jnp.maximum(1.0 - nonsom_frac, tiny)) + 0.5), 999)

    return SomaticSnvResult(
        qphred=q.astype(jnp.int32),
        from_ntype_qphred=qn.astype(jnp.int32),
        ntype=ntype.astype(jnp.int32),
        max_gt=max_flat.astype(jnp.int32),
        strand_bias=sb,
        nonsomatic_qphred=qns.astype(jnp.int32),
    )
