"""Batched diploid SNV genotyping model.

TPU-native re-design of the reference's per-position SNP caller
(reference: blt_common/position_snp_call_pprob_digt.cpp
get_diploid_gt_lhood / calculate_result_set /
position_snp_call_pprob_digt). The per-basecall loops become one
einsum over padded [loci, depth] pileup tiles:

    lhood[l,g] = sum_d  val[l,d, expect2(obs[l,d], g)]

with val[0]=ln(e/3), val[1]=ln(ce + (1-ce)/3) - ln 2, val[2]=ln(1-e),
expressed as W[l,d,(obs,k)] @ T[(obs,k),g] so the genotype reduction
rides the MXU. Strand-bias recomputation and the polymorphic/genomic
prior products are all batched over loci.
"""
from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import digt

LN_ONE_THIRD = float(np.log(1.0 / 3.0))
LN_ONE_HALF = float(np.log(0.5))


# ---------------------------------------------------------------------------
# priors (pprob_digt_caller ctor: get_genomic_prior / get_poly_prior /
# haploid variants + finish_prior averaging for ref=N)
# ---------------------------------------------------------------------------

def _genomic_prior(ref_gt: int, theta: float) -> np.ndarray:
    prior = np.zeros(digt.SIZE)
    s = 0.0
    for gt in range(digt.SIZE):
        if gt == ref_gt:
            continue
        p = theta / 3.0
        if digt.IS_HET[gt]:
            if digt.EXPECT[gt, ref_gt] <= 0.0:
                p *= theta
        else:
            p *= 0.5
        prior[gt] = p
        s += p
    prior[ref_gt] = 1.0 - s
    return prior


def _haploid_genomic_prior(ref_gt: int, theta: float) -> np.ndarray:
    prior = np.zeros(digt.SIZE)
    s = 0.0
    for gt in range(digt.SIZE):
        if gt == ref_gt:
            continue
        prior[gt] = 0.0 if digt.IS_HET[gt] else theta / 3.0
        s += prior[gt]
    prior[ref_gt] = 1.0 - s
    return prior


def _poly_prior(ref_gt: int, theta: float) -> np.ndarray:
    prior = np.zeros(digt.SIZE)
    ctheta = 1.0 - theta
    for gt in range(digt.SIZE):
        if gt == ref_gt:
            prior[gt] = 0.25 * ctheta
        elif digt.IS_HET[gt]:
            if digt.EXPECT[gt, ref_gt] <= 0.0:
                prior[gt] = theta / 3.0
            else:
                prior[gt] = 0.5 / 3.0 * ctheta
        else:
            prior[gt] = 0.25 / 3.0 * ctheta
    return prior


def _haploid_poly_prior(ref_gt: int, theta: float) -> np.ndarray:
    prior = np.zeros(digt.SIZE)
    for gt in range(digt.SIZE):
        if gt == ref_gt:
            prior[gt] = 0.5
        elif digt.IS_HET[gt]:
            prior[gt] = 0.0
        else:
            prior[gt] = 0.5 / 3.0
    return prior


@functools.lru_cache(maxsize=8)
def make_ln_priors(theta: float):
    """[5, 10] ln prior tables indexed by ref base id (4 = N = average).

    Returns dict with 'genome', 'poly', 'genome_haploid', 'poly_haploid'.
    """
    out = {}
    for key, fn in (
        ("genome", _genomic_prior), ("poly", _poly_prior),
        ("genome_haploid", _haploid_genomic_prior),
        ("poly_haploid", _haploid_poly_prior),
    ):
        table = np.stack([fn(r, theta) for r in range(digt.N_BASE)])
        navg = table.mean(axis=0)
        navg /= navg.sum()
        table = np.vstack([table, navg[None, :]])
        with np.errstate(divide="ignore"):
            out[key] = np.log(table)
    return out


# ---------------------------------------------------------------------------
# the (obs, k) -> gt selection tensor for the einsum formulation
# ---------------------------------------------------------------------------

def _build_t12() -> np.ndarray:
    """T[(obs*3 + k), g] = 1 iff expect2(obs, g) == k."""
    t = np.zeros((digt.N_BASE * 3, digt.SIZE), dtype=np.float32)
    for obs in range(digt.N_BASE):
        for g in range(digt.SIZE):
            k = digt.EXPECT2[g, obs]
            t[obs * 3 + k, g] = 1.0
    return t


T12 = _build_t12()


class SnvPileupTile(NamedTuple):
    """Padded pileup tile: [L, D] arrays."""
    base_id: jnp.ndarray   # int8/int32 in 0..3 (invalid lanes masked)
    qual: jnp.ndarray      # int32 phred
    is_fwd: jnp.ndarray    # bool
    mask: jnp.ndarray      # bool — lane holds a used basecall
    ref_gt: jnp.ndarray    # [L] int32, 0..4 (4 = N)


class SnvCallResult(NamedTuple):
    lhood: jnp.ndarray           # [L, 10] genotype log likelihoods
    genome_pprob: jnp.ndarray    # [L, 10] genomic posterior (linear)
    poly_pprob: jnp.ndarray      # [L, 10] polymorphic posterior (linear)
    genome_max_gt: jnp.ndarray   # [L]
    poly_max_gt: jnp.ndarray     # [L]
    snv_qphred: jnp.ndarray      # [L] Q(snp) from genomic ref pprob
    genome_max_gt_qphred: jnp.ndarray  # [L]
    poly_max_gt_qphred: jnp.ndarray    # [L]
    phred_loghood: jnp.ndarray   # [L, 10] PL values
    strand_bias: jnp.ndarray     # [L]
    # [L] ln of the genomic ref-genotype posterior; summed over samples
    # it becomes site QUAL (starling_pos_processor.cpp:688-691
    # homRefLogProb += std::log(dgt.genome.ref_pprob)). Floored at the
    # f64 smallest-normal (the reference's double underflows to -inf a
    # few decades later; unreachable at realistic depths).
    ln_ref_pprob: jnp.ndarray = None


def _call_vals(qual, eprob_floor: float = 1e-35):
    """Per-call val[·,·,3] table (get_diploid_gt_lhood val[0..2]).

    float32 to match the reference's blt_float_t accumulation.
    """
    e = jnp.power(10.0, -qual.astype(jnp.float32) / 10.0)
    ce = 1.0 - e
    v0 = jnp.log(jnp.maximum(e, eprob_floor)) + LN_ONE_THIRD
    v1 = jnp.log(ce + (1.0 - ce) / 3.0) + LN_ONE_HALF
    v2 = jnp.log(jnp.maximum(ce, eprob_floor))
    return jnp.stack([v0, v1, v2], axis=-1)


_SNV_QTAB_SIZE = 128


@functools.lru_cache(maxsize=1)
def _snv_qtab():
    """[(Q*4), 10] per-(qscore, obs-base) genotype log-lhood
    contribution table: tab[q*4+b, g] = val(q)[expect2(g, b)]
    (get_diploid_gt_lhood; numpy, cached outside any trace)."""
    q = np.arange(_SNV_QTAB_SIZE, dtype=np.float32)
    e = np.power(np.float32(10.0), -q / np.float32(10.0), dtype=np.float32)
    ce = (np.float32(1.0) - e).astype(np.float32)
    floor = np.float32(1e-35)
    v = np.stack([
        np.log(np.maximum(e, floor)) + np.float32(LN_ONE_THIRD),
        np.log(ce + (1.0 - ce) / np.float32(3.0)) + np.float32(LN_ONE_HALF),
        np.log(np.maximum(ce, floor)),
    ], axis=-1).astype(np.float32)                                  # [Q,3]
    exp2 = np.asarray(digt.EXPECT2, np.int64)                       # [10,4]
    tab = np.empty((_SNV_QTAB_SIZE * digt.N_BASE, digt.SIZE),
                   np.float32)
    for b in range(digt.N_BASE):
        tab[b::digt.N_BASE, :] = v[:, exp2[:, b]]
    return tab


@functools.lru_cache(maxsize=1)
def _e0_tab():
    """[4, 10] f32 indicator: expect2(g, b) == 0 (the mismatch cell).
    s_mis[l, b] @ _e0_tab() adds the dependent-eprob mismatch-term
    delta to every genotype that mismatches base b."""
    exp2 = np.asarray(digt.EXPECT2)                    # [10, 4] by (g, b)
    return (exp2 == 0).T.astype(np.float32)            # [4, 10]


def dependent_eprob_deltas(base_id, qual, used, fwd, neighbor_mm,
                           ssd_no: float, ssd_one: float):
    """Dependent basecall-error adjustment deltas
    (blt_common/adjust_joint_eprob.cpp; enabled by default in the
    germline caller, starling_shared.hh:34-35). Returns
    (s_delta f32 [L, 4], plane_fn) where s_delta[l, b] sums
    ln(de)-ln(e) over used calls of base b at site l, and
    plane_fn(rows) gathers the per-call [len(rows), D] delta plane for
    a row subset (rows=None -> all rows). Most sites have no
    multi-call (strand, base) group, so s_delta is overwhelmingly zero
    and the unadjusted likelihoods stay bit-identical."""
    L, D = base_id.shape
    nb = neighbor_mm
    if nb is None:
        # reference default when not measured
        # (starling_pos_processor_base.cpp:1242-1243)
        nb = np.zeros((L, D), dtype=bool)

    from ..io.native import dependent_eprob_delta_native

    def compute(b, q, u, f, n, want_plane):
        res = dependent_eprob_delta_native(b, q, u, f, n, ssd_no,
                                           ssd_one,
                                           want_plane=want_plane)
        if res is not None:
            return res
        return _dependent_eprob_python(b, q, u, f, n, ssd_no, ssd_one)

    # the [L, 4] sums are all the production hist path needs; the
    # [*, D] per-call plane (strand-bias SNP subsets, RNA full tiles)
    # is computed lazily per row subset — a fresh whole-region [L, D]
    # f32 plane page-faults for ~1s/Mb on this VM class
    s_delta, _ = compute(base_id, qual, used, fwd, nb, False)

    def plane_fn(rows=None):
        if rows is None:
            return compute(base_id, qual, used, fwd, nb, True)[1]
        return compute(
            np.ascontiguousarray(base_id[rows]),
            np.ascontiguousarray(qual[rows]),
            np.ascontiguousarray(used[rows]),
            np.ascontiguousarray(fwd[rows]),
            np.ascontiguousarray(nb[rows]), True)[1]

    return s_delta, plane_fn


def _dependent_eprob_python(base_id, qual, used, fwd, nbmm,
                            ssd_no, ssd_one):
    """Pure-python fallback (slow; the semantic twin of
    native/depeprob.cpp)."""
    import math
    L, D = base_id.shape
    s_delta = np.zeros((L, 4), np.float32)
    plane = np.zeros((L, D), np.float32)
    ln_ran = math.log(0.75)
    elig = used & (base_id >= 0) & (base_id < 4) & (qual >= 3)
    gid = np.where(elig, fwd.astype(np.int64) + 2 * base_id, -1)
    counts = np.zeros((L, 8), np.int32)
    li, di = np.nonzero(elig)
    np.add.at(counts, (li, gid[li, di]), 1)
    for l in np.nonzero((counts >= 2).any(axis=1))[0]:
        for g in range(8):
            if counts[l, g] < 2:
                continue
            mem = [d for d in range(D) if gid[l, d] == g]
            num = den = 0.0
            for d in mem:
                e = 10.0 ** (-qual[l, d] / 10.0)
                w = ln_ran - math.log(e)
                den += w
                if nbmm[l, d]:
                    num += w
            mfrac = num / den if den > 0 else 0.0
            vexp_frac = (1 - mfrac) * ssd_no + mfrac * ssd_one
            mem.sort(key=lambda d: -qual[l, d])
            vexp = 1.0
            for d in mem:
                e = 10.0 ** (-qual[l, d] / 10.0)
                val = e ** vexp
                frac = (1 - val) / (1 - e)
                de = max(e, frac * val + (1 - frac) * 0.75)
                delta = np.float32(math.log(de) - math.log(e))
                s_delta[l, g >> 1] += delta
                plane[l, d] = delta
                vexp *= 1 - vexp_frac
    return s_delta, plane


def _masked_lhood_hist(base_id, qual, mask):
    """lhood[l,g] as a (qscore, base) histogram matmul — the germline
    analog of the somatic het_ratio_cache formulation: contributions
    depend only on (q, obs), so the [L,D] tile reduces to [L, Q*4]
    counts x the cached contribution table (MXU work on TPU)."""
    L, D = base_id.shape
    q_idx = jnp.clip(qual.astype(jnp.int32), 0, _SNV_QTAB_SIZE - 1)
    b = base_id.astype(jnp.int32)
    valid = mask & (b >= 0) & (b < digt.N_BASE)
    idx = jnp.where(valid, q_idx * digt.N_BASE + b,
                    _SNV_QTAB_SIZE * digt.N_BASE)
    hist = jnp.zeros((L, _SNV_QTAB_SIZE * digt.N_BASE + 1), jnp.float32)
    hist = hist.at[jnp.arange(L)[:, None], idx].add(1.0)
    tab = jnp.asarray(_snv_qtab())
    return hist[:, :_SNV_QTAB_SIZE * digt.N_BASE] @ tab             # [L,10]


def _masked_lhood(base_id, vals, mask, force_ref=None, ref_gt=None,
                  qual=None):
    """lhood[l,g] via the W @ T12 einsum (or the histogram matmul when
    qual is provided and no per-call forcing is needed).

    When force_ref is given (bool [L,D]), those calls use the genotype
    column fixed to ref_gt (strand-bias recomputation semantics,
    position_snp_call_pprob_digt.cpp:356-361).
    """
    if force_ref is None and qual is not None:
        return _masked_lhood_hist(base_id, qual, mask)
    L, D = base_id.shape
    obs_onehot = jax.nn.one_hot(base_id, digt.N_BASE, dtype=vals.dtype)  # [L,D,4]
    w = obs_onehot[..., :, None] * vals[..., None, :]                     # [L,D,4,3]
    w = w.reshape(L, D, digt.N_BASE * 3)
    w = w * mask[..., None].astype(vals.dtype)
    t12 = jnp.asarray(T12, dtype=vals.dtype)
    # HIGHEST precision: keep f32 accumulation exact on the MXU (the
    # selection matmul is tiny; throughput is dominated elsewhere)
    lhood_free = jnp.einsum("ldm,mg->lg", w, t12,
                            precision=jax.lax.Precision.HIGHEST)           # [L,10]
    if force_ref is None:
        return lhood_free
    # forced calls contribute val[expect2(obs, ref_gt)], const over g
    ref_clamped = jnp.minimum(ref_gt, digt.N_BASE - 1)
    exp2 = jnp.asarray(digt.EXPECT2, dtype=jnp.int32)                      # [10,4]
    k_forced = exp2[ref_clamped[:, None], base_id]                         # [L,D]
    v_forced = jnp.take_along_axis(vals, k_forced[..., None], axis=-1)[..., 0]
    use_forced = force_ref & mask
    use_free = (~force_ref) & mask
    lhood_f = jnp.einsum(
        "ldm,mg->lg",
        (obs_onehot[..., :, None] * vals[..., None, :]).reshape(L, D, 12)
        * use_free[..., None].astype(vals.dtype),
        t12,
        precision=jax.lax.Precision.HIGHEST,
    )
    forced_sum = jnp.sum(v_forced * use_forced.astype(vals.dtype), axis=1)
    return lhood_f + forced_sum[:, None]


def _result_set(lhood, ln_prior, ref_gt):
    """posterior + Q from lhood and prior (calculate_result_set).

    Posterior math in float64 like the reference (pprob is double).
    """
    pp = lhood.astype(jnp.float64) + ln_prior
    mx = jnp.max(pp, axis=-1, keepdims=True)
    p = jnp.exp(pp - mx)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    max_gt = jnp.argmax(pp, axis=-1)
    ref_pprob = jnp.take_along_axis(p, ref_gt[:, None], axis=-1)[:, 0]
    # prob_comp: 1 - p[max] as sum of complement
    total = jnp.sum(p, axis=-1)
    pmax = jnp.take_along_axis(p, max_gt[:, None], axis=-1)[:, 0]
    comp = jnp.maximum(total - pmax, 0.0)
    tiny = jnp.finfo(jnp.float64).tiny
    # round-half-up (reference error_prob_to_qphred uses floor(x+0.5))
    q_ref = jnp.minimum(jnp.floor(-10.0 * jnp.log10(jnp.maximum(ref_pprob, tiny)) + 0.5), 999)
    q_max = jnp.minimum(jnp.floor(-10.0 * jnp.log10(jnp.maximum(comp, tiny)) + 0.5), 999)
    ln_ref = jnp.log(jnp.maximum(ref_pprob, tiny))
    return p, max_gt, q_ref.astype(jnp.int32), q_max.astype(jnp.int32), ln_ref


def _het_vf_extension_lhoods(base_id, qual, mask, extension: float,
                             increment: float, force_ref=None, ref_gt=None,
                             dep_delta=None):
    """Het-ratio extension terms for RNA mode.

    Vectorized increment_het_ratio_lhood
    (position_snp_call_pprob_digt.cpp:262-385): for each het-ratio step
    r in (0.5, 0.5+extension], accumulate the biased-het likelihoods
    lhood_high/lhood_low for every het genotype. Returns [n_ratio*2, L,
    10] stacked log-lhood terms (to be logsumexp'd with the base
    lhood), plus the subgenotype count 1+2*n_steps.
    """
    n_steps = 1 + int(extension / increment)
    ratio_inc = extension / n_steps
    e = jnp.power(10.0, -qual.astype(jnp.float32) / 10.0)
    e = jnp.clip(e, 1e-35, None)
    ce = 1.0 - e
    bias = jnp.asarray(digt.EXPECT2_BIAS, dtype=jnp.int32)   # [10, 4]
    key = bias[:, base_id]                                    # [10, L, D]
    if force_ref is not None:
        # strand-specific recomputation: forced calls key against the
        # reference genotype (increment_het_ratio_lhood:305-311)
        ref_clamped = jnp.minimum(ref_gt, digt.N_BASE - 1)
        key_forced = bias[ref_clamped[:, None], base_id]      # [L, D]
        key = jnp.where(force_ref[None], key_forced[None], key)
    terms = []
    for i in range(n_steps):
        r = 0.5 + (i + 1) * ratio_inc
        cr = 1.0 - r
        v0 = jnp.log(e) + LN_ONE_THIRD
        if dep_delta is not None:
            # dependent-eprob adjustment applies to the mismatch term
            # only (increment_het_ratio_lhood:297 uses epi.de)
            v0 = v0 + dep_delta
        v1 = jnp.log(ce * r + (1.0 - ce) / 3.0 * cr)
        v2 = jnp.log(ce * cr + (1.0 - ce) / 3.0 * r)
        # same eprob floor as _call_vals v2: without it, q=0 padding
        # entries under strand-forced ref keys (key==3) hit ln(0) and
        # -inf * mask-0 poisons the sum to nan (RNA-mode SB regression)
        v3 = jnp.log(jnp.maximum(ce, 1e-35))
        vals4 = jnp.stack([v0, v1, v2, v3], axis=0)           # [4, L, D]
        low_remap = jnp.asarray([0, 2, 1, 3], dtype=jnp.int32)
        Ld, Dd = base_id.shape
        li = jnp.arange(Ld)[None, :, None]
        di = jnp.arange(Dd)[None, None, :]
        vh = vals4[key, li, di]                                # [10, L, D]
        vl = vals4[low_remap[key], li, di]
        m = mask[None].astype(vh.dtype)
        terms.append(jnp.sum(vh * m, axis=-1).T)              # [L, 10]
        terms.append(jnp.sum(vl * m, axis=-1).T)
    return jnp.stack(terms, axis=0), 1 + 2 * n_steps


def _strand_bias(tile: SnvPileupTile, vals, mask, ref_clamped, tgt, lt,
                 het_vf_extension: float, het_vf_increment: float,
                 dep_delta=None):
    """max(lhood_fwd[tgt], lhood_rev[tgt]) - lhood[tgt] per row
    (position_snp_call_pprob_digt.cpp:520-534)."""
    def strand_lhood(force_ref):
        lh = _masked_lhood(tile.base_id.astype(jnp.int32), vals, mask,
                           force_ref=force_ref, ref_gt=ref_clamped)
        if het_vf_extension > 0:
            ext, n_sub = _het_vf_extension_lhoods(
                tile.base_id.astype(jnp.int32), tile.qual, mask,
                het_vf_extension, het_vf_increment,
                force_ref=force_ref, ref_gt=ref_clamped,
                dep_delta=dep_delta)
            het_lh = jax.scipy.special.logsumexp(
                jnp.concatenate([lh[None], ext], axis=0), axis=0) \
                - jnp.log(jnp.float32(n_sub))
            lh = jnp.where(jnp.asarray(digt.IS_HET)[None, :], het_lh, lh)
        return lh
    lhood_fwd = strand_lhood(~tile.is_fwd)
    lhood_rev = strand_lhood(tile.is_fwd)
    lf = jnp.take_along_axis(lhood_fwd, tgt[:, None], axis=-1)[:, 0]
    lr = jnp.take_along_axis(lhood_rev, tgt[:, None], axis=-1)[:, 0]
    return jnp.maximum(lf, lr) - lt


@functools.partial(jax.jit, static_argnames=("het_vf_extension",
                                             "het_vf_increment"))
def snv_strand_bias_tile(tile: SnvPileupTile, tgt, lt,
                         dep_delta=None,
                         het_vf_extension: float = 0.0,
                         het_vf_increment: float = 0.0501):
    """Strand bias for a gathered subset of SNP rows.

    tgt: [L] genome max genotype per row; lt: [L] base lhood at tgt.
    """
    vals = _call_vals(tile.qual)
    if dep_delta is not None:
        vals = vals.at[..., 0].add(dep_delta)
    ref_clamped = jnp.minimum(tile.ref_gt.astype(jnp.int32),
                              digt.N_BASE - 1)
    return _strand_bias(tile, vals, tile.mask, ref_clamped,
                        tgt.astype(jnp.int32), lt,
                        het_vf_extension, het_vf_increment,
                        dep_delta=dep_delta)


def _tile_tail(lhood, ref_gt, is_haploid, priors):
    """Posterior tail shared by call_snv_tile and call_snv_hist_tile:
    priors, genomic/polymorphic result sets, and PLs from the [L, 10]
    genotype log-likelihoods (identical traced ops in both entries,
    preserving bit-parity between the two paths)."""
    gen_prior = jnp.asarray(priors["genome"])[ref_gt]
    poly_prior = jnp.asarray(priors["poly"])[ref_gt]
    if is_haploid is not None:
        gen_prior = jnp.where(
            is_haploid[:, None], jnp.asarray(priors["genome_haploid"])[ref_gt], gen_prior)
        poly_prior = jnp.where(
            is_haploid[:, None], jnp.asarray(priors["poly_haploid"])[ref_gt], poly_prior)

    ref_clamped = jnp.minimum(ref_gt, digt.N_BASE - 1)
    g_p, g_max, g_qref, g_qmax, g_lnref = _result_set(lhood, gen_prior, ref_clamped)
    p_p, p_max, _p_qref, p_qmax, _p_lnref = _result_set(lhood, poly_prior, ref_clamped)

    # PLs (position_snp_call_pprob_digt.cpp:498-511); haploid loci
    # normalize against the hom-only max (gtcount=N_BASE, :501)
    lmax = jnp.max(lhood, axis=-1, keepdims=True)
    if is_haploid is not None:
        hom_max = jnp.max(lhood[:, :digt.N_BASE], axis=-1, keepdims=True)
        lmax = jnp.where(is_haploid[:, None], hom_max, lmax)
    pl = jnp.clip(jnp.floor(-10.0 * (lhood - lmax) / np.log(10.0) + 0.5),
                  0, 999).astype(jnp.int32)
    return g_p, p_p, g_max, p_max, g_qref, g_qmax, p_qmax, pl, g_lnref


@functools.partial(jax.jit, static_argnames=("theta",))
def call_snv_hist_tile(hist, ref_gt, is_haploid=None,
                       theta: float = 0.001,
                       s_mis=None) -> SnvCallResult:
    """call_snv_tile's main pass from a precomputed (qscore, base)
    histogram (hist int8/f32 [L, _SNV_QTAB_SIZE*4], host-counted by
    native/snvhist.cpp). Bit-identical to
    call_snv_tile(..., compute_sb=False) with het_vf_extension=0: the
    counts are exact integers, so the [L, Q*4] @ qtab matmul and the
    shared posterior tail see identical inputs."""
    priors = make_ln_priors(theta)
    ref_gt = ref_gt.astype(jnp.int32)
    lhood = hist.astype(jnp.float32) @ jnp.asarray(_snv_qtab())
    if s_mis is not None:
        # dependent-eprob mismatch-term deltas (adjust_joint_eprob):
        # s_mis[l, b] is zero at unadjusted sites, so those stay
        # bit-identical
        lhood = lhood + s_mis @ jnp.asarray(_e0_tab())
    (g_p, p_p, g_max, p_max, g_qref, g_qmax, p_qmax, pl,
     g_lnref) = _tile_tail(lhood, ref_gt, is_haploid, priors)
    sb = jnp.zeros(lhood.shape[0], dtype=lhood.dtype)
    return SnvCallResult(
        lhood=lhood, genome_pprob=g_p, poly_pprob=p_p,
        genome_max_gt=g_max, poly_max_gt=p_max,
        snv_qphred=g_qref, genome_max_gt_qphred=g_qmax,
        poly_max_gt_qphred=p_qmax, phred_loghood=pl, strand_bias=sb,
        ln_ref_pprob=g_lnref,
    )


@functools.partial(jax.jit, static_argnames=("theta", "het_vf_extension",
                                             "het_vf_increment",
                                             "compute_sb"))
def call_snv_tile(tile: SnvPileupTile, theta: float = 0.001,
                  is_haploid: jnp.ndarray | None = None,
                  het_vf_extension: float = 0.0,
                  het_vf_increment: float = 0.0501,
                  compute_sb: bool = True,
                  dep_delta=None, dep_smis=None) -> SnvCallResult:
    """Batched equivalent of position_snp_call_pprob_digt over a tile.

    is_haploid: optional [L] bool selecting haploid priors per locus
    (ploidy regions, ploidy_util.hh).
    het_vf_extension: RNA-mode het variant-frequency extension
    (workflow passes 0.45 for RNA; 0 disables).
    compute_sb: run the per-strand forced-ref recomputation for every
    row. The reference only computes strand bias at is_snp() rows
    (position_snp_call_pprob_digt.cpp:524); the chunked driver passes
    False here and runs snv_strand_bias_tile on the SNP subset — two
    of the three full-tile likelihood passes vanish.
    """
    priors = make_ln_priors(theta)
    ref_gt = tile.ref_gt.astype(jnp.int32)
    vals = _call_vals(tile.qual)
    mask = tile.mask

    lhood = _masked_lhood(tile.base_id.astype(jnp.int32), vals, mask,
                          qual=tile.qual)
    if dep_delta is not None:
        # dependent-eprob adjustment (adjust_joint_eprob): the per-call
        # deltas fold into the mismatch term only; aggregate them per
        # (site, base) and route through the expect2==0 indicator.
        # vals gets the per-call fold for the strand-bias recompute.
        b32 = tile.base_id.astype(jnp.int32)
        oh = (b32[..., None] == jnp.arange(digt.N_BASE)) & mask[..., None]
        s_mis = jnp.sum(jnp.where(oh, dep_delta[..., None], 0.0), axis=1)
        lhood = lhood + s_mis @ jnp.asarray(_e0_tab())
        vals = vals.at[..., 0].add(dep_delta)
    elif dep_smis is not None:
        # precomputed [L, 4] sums (the cheap form): valid when no path
        # below needs per-call deltas
        lhood = lhood + dep_smis @ jnp.asarray(_e0_tab())

    if het_vf_extension > 0:
        ext_terms, n_subgt = _het_vf_extension_lhoods(
            tile.base_id.astype(jnp.int32), tile.qual, mask,
            het_vf_extension, het_vf_increment, dep_delta=dep_delta)
        stacked = jnp.concatenate([lhood[None], ext_terms], axis=0)
        het_lhood = jax.scipy.special.logsumexp(stacked, axis=0) \
            - jnp.log(jnp.float32(n_subgt))
        is_het = jnp.asarray(digt.IS_HET)
        lhood = jnp.where(is_het[None, :], het_lhood, lhood)

    (g_p, p_p, g_max, p_max, g_qref, g_qmax, p_qmax, pl,
     g_lnref) = _tile_tail(lhood, ref_gt, is_haploid, priors)

    # strand bias: forced-ref recomputation per strand (:520-534),
    # including the het-VF extension when enabled (:525-527)
    if compute_sb:
        tgt = g_max
        ref_clamped = jnp.minimum(ref_gt, digt.N_BASE - 1)
        lt = jnp.take_along_axis(lhood, tgt[:, None], axis=-1)[:, 0]
        sb = _strand_bias(tile, vals, mask, ref_clamped, tgt, lt,
                          het_vf_extension, het_vf_increment,
                          dep_delta=dep_delta)
    else:
        sb = jnp.zeros(lhood.shape[0], dtype=lhood.dtype)

    return SnvCallResult(
        lhood=lhood, genome_pprob=g_p, poly_pprob=p_p,
        genome_max_gt=g_max, poly_max_gt=p_max,
        snv_qphred=g_qref, genome_max_gt_qphred=g_qmax,
        poly_max_gt_qphred=p_qmax, phred_loghood=pl, strand_bias=sb,
        ln_ref_pprob=g_lnref,
    )


def _np_snv_hist(base, qual, mask, out):
    """numpy fallback for native snv_hist: identical integer counts
    (out int8 [L, Q*4], zeroed; guarded by D <= 127 so cells cannot
    overflow)."""
    b = base.astype(np.int32)
    q = np.clip(qual.astype(np.int32), 0, _SNV_QTAB_SIZE - 1)
    valid = mask & (b >= 0) & (b < digt.N_BASE)
    rows, cols = np.nonzero(valid)
    np.add.at(out, (rows, q[rows, cols] * digt.N_BASE + b[rows, cols]),
              np.int8(1))


# fixed chunk shapes: XLA compile time grows superlinearly with the
# position extent (46s at L=200k on CPU vs 1.3s at 32k), so long
# regions run as fixed-shape tiles that hit the jit cache
SNV_TILE_L = 32768
SNV_TILE_D_PAD = 32
# strand-bias subset tile (SNP rows per launch)
SNV_SB_TILE = 512

# device-launch tally for the occupancy artifacts (enabled with
# STRELKA_TPU_LAUNCH_STATS; dumped by realign_batch's atexit hook):
# {("tile"|"sb", L_tile, D_pad): count}
LAUNCH_STATS: dict | None = (
    {} if __import__("os").environ.get("STRELKA_TPU_LAUNCH_STATS")
    else None)


def _tally(kind, Lt, Dt):
    if LAUNCH_STATS is not None:
        k = (kind, int(Lt), int(Dt))
        LAUNCH_STATS[k] = LAUNCH_STATS.get(k, 0) + 1


def _call_snv_tile_native(base, qual, mask, ref_gt, theta, haploid,
                          s_delta):
    """Native whole-region SNV call (histogram + posterior tail) —
    see native/snvcall.cpp for the canonical accumulation-order
    definition. Returns an SnvCallResult of host arrays (strand_bias
    zeros; the SNP-subset SB pass runs afterward as usual) or None
    when the native library is unavailable."""
    from ..io.native import snv_call_native, snv_hist_native
    L, D = base.shape
    hist = np.zeros((L, _SNV_QTAB_SIZE * digt.N_BASE), np.int8)
    if not snv_hist_native(base, qual, mask, _SNV_QTAB_SIZE, hist):
        _np_snv_hist(base, qual, mask, hist)
    pr = make_ln_priors(theta)
    res = snv_call_native(
        hist, ref_gt, s_delta, haploid, _snv_qtab(),
        np.asarray(_e0_tab()), pr["genome"], pr["poly"],
        pr["genome_haploid"], pr["poly_haploid"])
    if res is None:
        return None
    lhood, g_max, p_max, snv_q, g_qmax, p_qmax, pl, ln_ref = res
    return SnvCallResult(
        lhood=lhood, genome_pprob=None, poly_pprob=None,
        genome_max_gt=g_max, poly_max_gt=p_max,
        snv_qphred=snv_q, genome_max_gt_qphred=g_qmax,
        poly_max_gt_qphred=p_qmax, phred_loghood=pl,
        strand_bias=np.zeros(L, np.float64), ln_ref_pprob=ln_ref)


def call_snv_tile_chunked(tile: SnvPileupTile, theta: float = 0.001,
                          is_haploid=None,
                          het_vf_extension: float = 0.0,
                          het_vf_increment: float = 0.0501,
                          dep=None) -> SnvCallResult:
    """call_snv_tile over fixed [SNV_TILE_L, D-bucket] chunks.

    Inputs are numpy/jax [L, D] arrays of any extent; the result is a
    SnvCallResult of host numpy arrays trimmed back to L rows. One
    compile per depth bucket, reused across all chunks and segments.

    dep: optional (s_delta [L, 4] f32, plane_fn(rows) -> [n, D] f32)
    dependent-eprob deltas from dependent_eprob_deltas; None disables
    the adjustment.
    """
    base = np.asarray(tile.base_id)
    L, D = base.shape
    qual = np.asarray(tile.qual)
    fwd = np.asarray(tile.is_fwd)
    mask = np.asarray(tile.mask)
    ref_gt = np.asarray(tile.ref_gt)
    hap = None if is_haploid is None else np.asarray(is_haploid)
    s_delta = dep[0] if dep is not None else None
    plane_fn = dep[1] if dep is not None else None

    # CPU-backend fast path: the histogram is sparse, so the native
    # sequential gather-sum + posterior tail (native/snvcall.cpp)
    # replaces the whole device chain — no tiling, no pulls. The XLA
    # tile path stays canonical on device backends and under
    # STRELKA_TPU_SNV_DEVICE=1 (the virtual-mesh dryrun forces it so
    # sharded and unsharded runs share one accumulation order).
    out = None
    if (het_vf_extension == 0.0 and D <= 127
            and __import__("os").environ.get("STRELKA_TPU_SNV_DEVICE")
            != "1"
            and jax.default_backend() == "cpu"):
        from ..parallel import mesh as _pmesh
        if _pmesh.engine_mesh() is None:
            out = _call_snv_tile_native(base, qual, mask, ref_gt, theta,
                                        hap, s_delta)
    if out is not None:
        pass
    elif L <= SNV_TILE_L:
        dd = sm = None
        if dep is not None:
            if het_vf_extension > 0:
                dd = jnp.asarray(plane_fn())  # RNA needs per-call deltas
            else:
                sm = jnp.asarray(s_delta)
        _tally("tile", L, D)
        res = call_snv_tile(tile, theta, is_haploid,
                            het_vf_extension, het_vf_increment,
                            compute_sb=False, dep_delta=dd, dep_smis=sm)
        out = SnvCallResult(*[np.asarray(x) for x in res])
    else:
        # Device backends pay a fixed per-launch dispatch cost (over
        # the tunneled dev chip, ~30ms RTT per snv-tile launch — 943
        # launches dominated SOAK_r04's device interaction), so chunks
        # are 4x taller there: same bytes moved, 4x fewer round trips.
        # Rows are independent, so the chunk height never changes
        # results.
        TL = SNV_TILE_L
        if jax.default_backend() != "cpu":
            TL = int(os.environ.get("STRELKA_TPU_SNV_TILE_L",
                                    SNV_TILE_L * 4))
        Db = ((D + SNV_TILE_D_PAD - 1) // SNV_TILE_D_PAD) * SNV_TILE_D_PAD

        # staging buffers come from a page-resident arena pool (fresh
        # np.full allocations fault in at ~50MB/s on this VM class).
        # jax CPU zero-copies the int8/bool views, so each chunk's
        # views are kept alive in `pending` until its results are
        # pulled — the pool's refcount check then guarantees an arena
        # is never re-carved while a launch still reads it.
        from ..io.native import (_carve, _carve_zeroed, _carve_size,
                                 _STAGE_POOL)
        specs = [((TL, Db), dt)
                 for dt in (base.dtype, qual.dtype, np.bool_, np.bool_)]
        arena_nbytes = _carve_size(specs)

        def staged_chunk(rows, t0, t1):
            arena = _STAGE_POOL.acquire(arena_nbytes)
            vb, vq, vf, vm = _carve_zeroed(arena, specs)
            vb[:rows, :D] = base[t0:t1]
            vq[:rows, :D] = qual[t0:t1]
            vf[:rows, :D] = fwd[t0:t1]
            vm[:rows, :D] = mask[t0:t1]
            return vb, vq, vf, vm

        # device->host traffic is the bottleneck at scale (fresh numpy
        # buffers page-fault slowly on this class of VM): pull only the
        # fields the gVCF pipeline consumes — the [L] vectors, int32
        # PLs, and lhood-at-max-gt (for strand bias). The full [L,10]
        # lhood/pprob matrices stay on device.
        _PULL = ("genome_max_gt", "poly_max_gt", "snv_qphred",
                 "genome_max_gt_qphred", "poly_max_gt_qphred",
                 "phred_loghood", "ln_ref_pprob")
        # pipelined dispatch: jax dispatch is async, so device compute
        # of chunk k overlaps host padding of k+1..; results are pulled
        # a few chunks behind dispatch to bound staging memory, and
        # written straight into pooled output buffers (fresh
        # concatenate allocations page-fault slowly on this VM class)
        # 4x-taller device chunks keep the same staging footprint by
        # halving the in-flight window twice
        MAX_INFLIGHT = 8 if TL == SNV_TILE_L else 2
        pending = []
        outbufs: dict = {}

        def pull_one():
            res, lt, rows, c0, _keep = pending.pop(0)
            pulls = [(f, np.asarray(getattr(res, f))) for f in _PULL]
            pulls.append(("_lt", np.asarray(lt)))
            if not outbufs:
                from ..io.native import _carve, _carve_size, _TILE_POOL
                specs = [((L,) + a.shape[1:], a.dtype) for _f, a in pulls]
                arena = _TILE_POOL.acquire(_carve_size(specs))
                for (f, _a), v in zip(pulls, _carve(arena, specs)):
                    outbufs[f] = v
            for f, a in pulls:
                outbufs[f][c0:c0 + rows] = a[:rows]

        # full chunks of a D-bucket-padded contiguous tile need no
        # staging at all: row slices are contiguous and feed the
        # launch directly (int8/bool zero-copy on the CPU backend; the
        # tile is pinned by `pending` until its results are pulled)
        direct_ok = (D == Db
                     and base.flags.c_contiguous
                     and qual.flags.c_contiguous
                     and fwd.flags.c_contiguous
                     and mask.flags.c_contiguous)

        # histogram fast path: the digt likelihood depends on the tile
        # only through per-site (qscore, base) counts, so the [L, D]
        # upload + XLA scatter (serial on CPU — the top host cost at
        # scale) collapses to a native host count + [L, Q*4] int8
        # zero-copy launch (call_snv_hist_tile; counts are exact
        # integers, results bit-identical). RNA's het-VF extension
        # needs per-call subsampling weights — full tiles stay on that
        # path.
        hist_ok = (het_vf_extension == 0.0 and D <= 127
                   and base.flags.c_contiguous
                   and qual.flags.c_contiguous
                   and mask.flags.c_contiguous)
        if hist_ok:
            from ..io.native import snv_hist_native
            hist_cols = _SNV_QTAB_SIZE * digt.N_BASE
            hspecs = [((TL, hist_cols), np.int8)]
            hist_nbytes = _carve_size(hspecs)

        # engine mesh (--mesh): dp-shard the position axis of each
        # chunk over the local device mesh — positions are independent,
        # so XLA partitions the genotyping program with no collectives
        from ..parallel import mesh as pmesh
        _to_dev = pmesh.chunk_sharder()

        for t0 in range(0, L, TL):
            t1 = min(t0 + TL, L)
            rows = t1 - t0
            if hist_ok:
                arena = _STAGE_POOL.acquire(hist_nbytes)
                # native snv_hist zeroes its rows itself (threaded,
                # cache-warm); only the padding tail needs clearing
                hbuf = _carve(arena, hspecs)[0]
                if rows < TL:
                    hbuf[rows:] = 0
                if not snv_hist_native(base[t0:t1], qual[t0:t1],
                                       mask[t0:t1], _SNV_QTAB_SIZE,
                                       hbuf[:rows]):
                    hbuf[:rows] = 0
                    _np_snv_hist(base[t0:t1], qual[t0:t1], mask[t0:t1],
                                 hbuf[:rows])
                if rows == TL:
                    rg = ref_gt[t0:t1]
                    h = None if hap is None else hap[t0:t1]
                else:
                    rg = np.full(TL, 4, dtype=ref_gt.dtype)
                    rg[:rows] = ref_gt[t0:t1]
                    h = None
                    if hap is not None:
                        h = np.zeros(TL, dtype=bool)
                        h[:rows] = hap[t0:t1]
                sub_hap = None if h is None else _to_dev(h)
                sm = None
                if s_delta is not None:
                    sm = np.zeros((TL, 4), np.float32)
                    sm[:rows] = s_delta[t0:t1]
                    sm = _to_dev(sm)
                _tally("tile", TL, Db)
                res = call_snv_hist_tile(_to_dev(hbuf), _to_dev(rg),
                                         sub_hap, theta, s_mis=sm)
                lt_dev = jnp.take_along_axis(
                    res.lhood, res.genome_max_gt[:, None], axis=-1)[:, 0]
                pending.append((res, lt_dev, rows, t0, (hbuf, rg, h)))
                if len(pending) >= MAX_INFLIGHT:
                    pull_one()
                continue
            if direct_ok and rows == TL:
                vb = base[t0:t1]
                vq = qual[t0:t1]
                vf = fwd[t0:t1]
                vm = mask[t0:t1]
                rg = ref_gt[t0:t1]
                h = None if hap is None else hap[t0:t1]
            else:
                vb, vq, vf, vm = staged_chunk(rows, t0, t1)
                rg = np.full(TL, 4, dtype=ref_gt.dtype)
                rg[:rows] = ref_gt[t0:t1]
                h = None
                if hap is not None:
                    h = np.zeros(TL, dtype=bool)
                    h[:rows] = hap[t0:t1]
            sub = SnvPileupTile(
                base_id=_to_dev(vb),
                qual=_to_dev(vq),
                is_fwd=_to_dev(vf),
                mask=_to_dev(vm),
                ref_gt=_to_dev(rg))
            sub_hap = None if h is None else _to_dev(h)
            dd = None
            if plane_fn is not None:
                rows_idx = np.arange(t0, t1)
                dpad = np.zeros((TL, Db), np.float32)
                dpad[:rows, :D] = plane_fn(rows_idx)
                dd = _to_dev(dpad)
            _tally("tile", TL, Db)
            res = call_snv_tile(sub, theta, sub_hap,
                                het_vf_extension, het_vf_increment,
                                compute_sb=False, dep_delta=dd)
            lt_dev = jnp.take_along_axis(
                res.lhood, res.genome_max_gt[:, None], axis=-1)[:, 0]
            pending.append((res, lt_dev, rows, t0, (vb, vq, vf, vm)))
            if len(pending) >= MAX_INFLIGHT:
                pull_one()
        while pending:
            pull_one()
        lt_all = outbufs["_lt"]
        out = SnvCallResult(
            lhood=None, genome_pprob=None, poly_pprob=None,
            genome_max_gt=outbufs["genome_max_gt"],
            poly_max_gt=outbufs["poly_max_gt"],
            snv_qphred=outbufs["snv_qphred"],
            genome_max_gt_qphred=outbufs["genome_max_gt_qphred"],
            poly_max_gt_qphred=outbufs["poly_max_gt_qphred"],
            phred_loghood=outbufs["phred_loghood"],
            strand_bias=None,
            ln_ref_pprob=outbufs["ln_ref_pprob"])

    # strand bias on the SNP subset only (is_snp gate, reference :524)
    snp_rows = np.nonzero(np.asarray(out.snv_qphred) != 0)[0]
    sb = np.zeros(L, dtype=np.float64)
    if len(snp_rows):
        Dsb = ((D + SNV_TILE_D_PAD - 1) // SNV_TILE_D_PAD) * SNV_TILE_D_PAD
        if out.lhood is not None:
            lt = np.take_along_axis(
                np.asarray(out.lhood)[snp_rows],
                np.asarray(out.genome_max_gt)[snp_rows][:, None],
                axis=-1)[:, 0]
        else:
            lt = lt_all[snp_rows]
        for t0 in range(0, len(snp_rows), SNV_SB_TILE):
            rows = snp_rows[t0:t0 + SNV_SB_TILE]
            n = len(rows)

            def padr(a, fill):
                if a.ndim == 2:
                    o = np.full((SNV_SB_TILE, Dsb), fill, dtype=a.dtype)
                    o[:n, :D] = a[rows]
                else:
                    o = np.full(SNV_SB_TILE, fill, dtype=a.dtype)
                    o[:n] = a[rows]
                return o
            sub = SnvPileupTile(
                base_id=jnp.asarray(padr(base, 0)),
                qual=jnp.asarray(padr(qual, 0)),
                is_fwd=jnp.asarray(padr(fwd, False)),
                mask=jnp.asarray(padr(mask, False)),
                ref_gt=jnp.asarray(padr(ref_gt, 4)))
            tgt_pad = np.zeros(SNV_SB_TILE, dtype=np.int32)
            tgt_pad[:n] = np.asarray(out.genome_max_gt)[rows]
            lt_pad = np.zeros(SNV_SB_TILE, dtype=lt.dtype)
            lt_pad[:n] = lt[t0:t0 + n]
            dd = None
            if plane_fn is not None:
                dpad = np.zeros((SNV_SB_TILE, Dsb), np.float32)
                dpad[:n, :D] = plane_fn(rows)
                dd = jnp.asarray(dpad)
            _tally("sb", SNV_SB_TILE, Dsb)
            vals = snv_strand_bias_tile(
                sub, jnp.asarray(tgt_pad), jnp.asarray(lt_pad),
                dd, het_vf_extension, het_vf_increment)
            sb[rows] = np.asarray(vals)[:n]
    return out._replace(strand_bias=sb)
