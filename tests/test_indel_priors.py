"""Per-sample top-allele prior mapping (getPriorIndex,
starling_pos_processor.cpp:1250-1320 + topAlleleIndexInSample from
rankOrthogonalAllelesInSample)."""
import numpy as np

from strelka_tpu.models import indel_genotype as ig

PRIORS6 = np.array([0.0, 10.0, 20.0, 30.0, 40.0, 50.0])
# indices:        HOMREF HOM0  HET0  HOM1  HET1  HET01


def _by_gt(tri, ploidy, A):
    ga = ig.genotype_alleles(ploidy, A)
    return {tuple(int(x) for x in ga[g]): tri[g] for g in range(len(ga))}


def test_top0_mapping_diploid_two_alts():
    m = _by_gt(ig.ag_genotype_priors_to_triangular(PRIORS6, 3, 2, top=0),
               2, 3)
    assert m[(0, 0)] == 0.0
    assert m[(1, 1)] == 10.0    # HOM of top allele -> HOM0
    assert m[(0, 1)] == 20.0    # HET of top allele -> HET0
    assert m[(2, 2)] == 30.0    # HOM of other -> HOM1
    assert m[(0, 2)] == 40.0    # HET of other -> HET1
    assert m[(1, 2)] == 50.0    # het-alt -> HET01


def test_top1_mapping_swaps_hom_het_roles():
    """When the sample's top-supported alt is the group's SECOND
    allele, HOM0/HET0 attach to it (getPriorIndex keyed off
    topAlleleIndexInSample, NOT allele order)."""
    m = _by_gt(ig.ag_genotype_priors_to_triangular(PRIORS6, 3, 2, top=1),
               2, 3)
    assert m[(2, 2)] == 10.0    # HOM0 now on allele 2
    assert m[(0, 2)] == 20.0    # HET0 on allele 2
    assert m[(1, 1)] == 30.0    # HOM1 on allele 1
    assert m[(0, 1)] == 40.0    # HET1 on allele 1
    assert m[(1, 2)] == 50.0


def test_top_param_haploid():
    m0 = _by_gt(ig.ag_genotype_priors_to_triangular(PRIORS6, 3, 1, top=0),
                1, 3)
    m1 = _by_gt(ig.ag_genotype_priors_to_triangular(PRIORS6, 3, 1, top=1),
                1, 3)
    assert m0[(1, 1)] == 10.0 and m0[(2, 2)] == 30.0
    assert m1[(2, 2)] == 10.0 and m1[(1, 1)] == 30.0


def test_single_alt_unchanged():
    t = ig.ag_genotype_priors_to_triangular(PRIORS6, 2, 2, top=0)
    m = _by_gt(t, 2, 2)
    assert m[(0, 0)] == 0.0 and m[(0, 1)] == 20.0 and m[(1, 1)] == 10.0
