"""batch_genotype_lhoods must be BITWISE identical to the per-locus
genotype math it replaces: genotype_log_lhoods, the caller's
confident-count block, and the top-allele support sums."""
import numpy as np
import pytest

from strelka_tpu.models import indel_genotype as ig


def _per_locus(al, rl, nna, ins, dels, ploidy, min_flank):
    info = ig.AlleleInfo(insert_len=np.asarray(ins),
                         delete_len=np.asarray(dels))
    lh = np.asarray(ig.genotype_log_lhoods(
        al, np.ones(len(al), bool), rl, nna, info, ploidy, min_flank))
    integ = al + ig.CORRECT_MAPPING_LOG_PRIOR
    rb = np.asarray(nna)[:, None] * ig.LN_RANDOM_BASE_MATCH
    a2 = np.logaddexp(integ, rb)
    a2 = a2 - a2.max(axis=1, keepdims=True)
    p = np.exp(a2)
    p /= p.sum(axis=1, keepdims=True)
    conf = p >= 0.51
    b3 = al - al.max(axis=1, keepdims=True)
    q = np.exp(b3)
    sup = (q / q.sum(axis=1, keepdims=True)).sum(axis=0)
    return lh, conf, sup


@pytest.mark.parametrize("ploidy,A", [(2, 2), (2, 3), (1, 2), (1, 3)])
def test_batch_bitwise_equals_per_locus(ploidy, A):
    rng = np.random.default_rng(ploidy * 10 + A)
    entries = []
    oracle = []
    for _ in range(23):
        R = int(rng.integers(1, 120))
        al = rng.normal(scale=30, size=(R, A))
        al[:, 0] += rng.normal(scale=5)
        rl = rng.integers(30, 150, R).astype(np.int64)
        nna = rng.integers(20, 150, R).astype(np.int64)
        ins = rng.integers(0, 8, A - 1)
        dels = rng.integers(0, 8, A - 1)
        entries.append((al, rl, nna, ins, dels))
        oracle.append(_per_locus(al, rl, nna, ins, dels, ploidy, 6))
    out = ig.batch_genotype_lhoods(entries, ploidy, A, 6)
    assert len(out) == len(entries)
    for (lh, conf, sup), (olh, oconf, osup) in zip(out, oracle):
        np.testing.assert_array_equal(lh, olh)
        np.testing.assert_array_equal(conf, oconf)
        np.testing.assert_array_equal(sup, osup)
