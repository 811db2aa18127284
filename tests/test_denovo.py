"""De novo trio scoring tests (deNovoQualityScore/denovo.py analog)."""
import numpy as np
import pytest

from strelka_tpu.workflow.denovo import denovo_posterior, transmission_matrix


def test_transmission_matrix():
    t = transmission_matrix(mu=0)
    # homref x homref -> child homref
    assert t[0, 0, 0] == 1.0
    # het x het -> 1/4, 1/2, 1/4
    np.testing.assert_allclose(t[1, 1], [0.25, 0.5, 0.25])
    # homalt x homref -> child het
    assert t[2, 0, 1] == 1.0
    # rows sum to 1
    np.testing.assert_allclose(t.sum(axis=2), 1.0)


def test_denovo_detection():
    # confident het child, confident homref parents -> de novo
    child_pl = [[200, 0, 200]]
    parent_pl = [[0, 200, 400]]
    p = denovo_posterior(child_pl, parent_pl, parent_pl)
    assert p[0] > 0.99
    # inherited het (mother het) -> not de novo
    mother_het = [[200, 0, 200]]
    p2 = denovo_posterior(child_pl, mother_het, parent_pl)
    assert p2[0] < 0.01
    # weak child evidence -> low de novo posterior
    child_weak = [[0, 10, 60]]
    p3 = denovo_posterior(child_weak, parent_pl, parent_pl)
    assert p3[0] < p[0]


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
