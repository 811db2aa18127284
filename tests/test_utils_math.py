"""Unit tests for utils/logsum + utils/ranges (blt_util logSumUtil /
prob_util / known_pos_range2 / RegionTracker analogs)."""
import math

import numpy as np
import pytest

from strelka_tpu.utils import logsum as ls
from strelka_tpu.utils.ranges import PosRange, RegionTracker


def test_log_sum_matches_direct():
    xs = np.array([-1.0, -700.0, 0.0, -0.5])
    ys = np.array([-2.0, -701.0, -0.1, -0.5])
    got = ls.log_sum(xs, ys)
    for g, x, y in zip(got, xs, ys):
        want = math.log(math.exp(x - max(x, y)) + math.exp(y - max(x, y))) \
            + max(x, y)
        assert g == pytest.approx(want, rel=1e-12)


def test_normalize_ln_distro_and_prob_comp():
    lnp = np.log(np.array([[0.7, 0.2, 0.1], [0.05, 0.9, 0.05]]))
    p, amax = ls.normalize_ln_distro(lnp + 123.0)  # shift-invariant
    assert np.allclose(p, [[0.7, 0.2, 0.1], [0.05, 0.9, 0.05]])
    assert list(amax) == [0, 1]
    comp = ls.prob_comp(p, amax)
    assert comp == pytest.approx([0.3, 0.1])


def test_jnp_normalize_matches_numpy():
    import jax.numpy as jnp
    lnp = np.random.default_rng(0).normal(size=(4, 10))
    p_np, a_np = ls.normalize_ln_distro(lnp)
    p_j, a_j = ls.jnp_normalize_ln_distro(jnp.asarray(lnp))
    assert np.allclose(p_np, np.asarray(p_j), atol=1e-12)
    assert np.array_equal(a_np, np.asarray(a_j))


def test_pos_range():
    a = PosRange(10, 20)
    assert len(a) == 10
    assert a.intersects(PosRange(19, 25))
    assert not a.intersects(PosRange(20, 25))
    assert a.contains_pos(10) and not a.contains_pos(20)
    u = a.union(PosRange(15, 30))
    assert (u.begin, u.end) == (10, 30)


def test_region_tracker_merges_adjacent():
    rt = RegionTracker()
    rt.add(10, 20)
    rt.add(20, 30)     # adjacent -> merged
    rt.add(40, 50)
    assert rt.is_intersect_region(10)
    assert rt.is_intersect_region(29)
    assert not rt.is_intersect_region(30)
    assert rt.is_range_intersect(25, 45)
    assert not rt.is_range_intersect(30, 40)
    assert list(rt.intervals()) == [(10, 30), (40, 50)]
    rt.clear()
    assert list(rt.intervals()) == []
