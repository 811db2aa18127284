"""Model-level site simulators for statistical caller validation.

Reference: applications/starling/starling_sim_test.{hh,cpp} and
applications/strelka/strelka_sim_test.hh — generate synthetic pileups
directly from the error model and drive the calling models without
BAMs. Used by tests to validate caller statistics (sensitivity at
depth, Q-score calibration) end to end at the model layer.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class SimOptions:
    depth: float = 30.0
    qscore: int = 30
    ref_base: int = 0


def simulate_site_pileup(rng: np.random.Generator, gt_bases: tuple[int, int],
                         opt: SimOptions):
    """One diploid site pileup (base_ids, quals, is_fwd) with
    sequencing errors at the phred rate (starling_sim_test pile gen)."""
    depth = rng.poisson(opt.depth)
    e = 10.0 ** (-opt.qscore / 10.0)
    true_bases = rng.choice(np.array(gt_bases), size=depth)
    is_err = rng.random(depth) < e
    err_base = (true_bases + rng.integers(1, 4, depth)) % 4
    bases = np.where(is_err, err_base, true_bases)
    quals = np.full(depth, opt.qscore, dtype=np.int32)
    fwd = rng.random(depth) < 0.5
    return bases.astype(np.int32), quals, fwd


def simulate_germline_sites(rng, n_sites: int, gt_bases, opt: SimOptions):
    """Padded [n_sites, D] tile arrays for the batched SNV caller."""
    cols = [simulate_site_pileup(rng, gt_bases, opt) for _ in range(n_sites)]
    D = max(max(len(c[0]) for c in cols), 1)
    base = np.zeros((n_sites, D), np.int32)
    qual = np.zeros((n_sites, D), np.int32)
    fwd = np.zeros((n_sites, D), bool)
    mask = np.zeros((n_sites, D), bool)
    for i, (b, q, f) in enumerate(cols):
        base[i, :len(b)] = b
        qual[i, :len(b)] = q
        fwd[i, :len(b)] = f
        mask[i, :len(b)] = True
    return base, qual, fwd, mask


def simulate_somatic_site(rng, normal_gt: tuple[int, int],
                          tumor_alt_freq: float, alt_base: int,
                          normal_opt: SimOptions, tumor_opt: SimOptions):
    """Tumor/normal pileup pair: normal drawn from its genotype, tumor
    from a continuous alt fraction (strelka_sim_test somatic mode)."""
    nb, nq, nf = simulate_site_pileup(rng, normal_gt, normal_opt)
    depth = rng.poisson(tumor_opt.depth)
    e = 10.0 ** (-tumor_opt.qscore / 10.0)
    is_alt = rng.random(depth) < tumor_alt_freq
    true_bases = np.where(is_alt, alt_base, tumor_opt.ref_base)
    is_err = rng.random(depth) < e
    err_base = (true_bases + rng.integers(1, 4, depth)) % 4
    tb = np.where(is_err, err_base, true_bases).astype(np.int32)
    tq = np.full(depth, tumor_opt.qscore, dtype=np.int32)
    tf = rng.random(depth) < 0.5
    return (nb, nq, nf), (tb, tq, tf)
