"""Statistical tests used by candidacy and filtering logic.

Reference: blt_util/binomial_test.hh|cpp (one-sided exact binomial via
boost), blt_util/fisher_exact_test.*, blt_util/fastRanksum.hh. Here we
use scipy on host; candidacy min-count thresholds are precomputed into
lookup tables (mirroring min_count_binom_gte_cache.hh) so the device
pipeline only does integer compares.
"""
from __future__ import annotations

import numpy as np
from scipy import stats as _sps


def binomial_exact_pval_gte(error_rate: float, n_success: int, n_trials: int) -> float:
    """P(X >= n_success) one-sided exact binomial (binomial_test.hh).

    get_binomial_gte_n_success_exact_pvalue in the reference.
    """
    if n_success <= 0:
        return 1.0
    return float(_sps.binom.sf(n_success - 1, n_trials, error_rate))


def is_reject_binomial_gte(alpha: float, error_rate: float, n_success: int, n_trials: int) -> bool:
    """Reject null (observations are noise) when pval < alpha."""
    return binomial_exact_pval_gte(error_rate, n_success, n_trials) < alpha


class MinCountBinomGteCache:
    """min n_success to reject at alpha, cached by n_trials.

    Reference: blt_util/min_count_binom_gte_cache.hh|cpp — used by indel
    candidacy so the hot path is one integer comparison.
    """

    def __init__(self, alpha: float):
        self._alpha = alpha
        self._cache: dict[tuple[float, int], int] = {}

    def get_min_count_approx(self, error_rate: float, n_trials: int) -> int:
        key = (error_rate, n_trials)
        v = self._cache.get(key)
        if v is None:
            # smallest k with sf(k-1, n, p) < alpha
            k = int(_sps.binom.isf(self._alpha, n_trials, error_rate)) + 1
            while k > 1 and _sps.binom.sf(k - 2, n_trials, error_rate) < self._alpha:
                k -= 1
            while _sps.binom.sf(k - 1, n_trials, error_rate) >= self._alpha:
                k += 1
            self._cache[key] = v = k
        return v

    def is_reject_null(self, error_rate: float, n_success: int, n_trials: int) -> bool:
        return n_success >= self.get_min_count_approx(error_rate, n_trials)


def fisher_exact_twosided(a: int, b: int, c: int, d: int) -> float:
    """2x2 Fisher exact test p-value (fisher_exact_test.hh)."""
    return float(_sps.fisher_exact([[a, b], [c, d]])[1])


def mann_whitney_u_from_groups(x: np.ndarray, y: np.ndarray) -> float:
    """Z-score style ranksum statistic (blt_util/fastRanksum.hh get_u_stat)."""
    if len(x) == 0 or len(y) == 0:
        return 0.0
    res = _sps.mannwhitneyu(x, y, alternative="two-sided", method="asymptotic")
    # convert to z via normal approximation
    n1, n2 = len(x), len(y)
    mu = n1 * n2 / 2.0
    sigma = np.sqrt(n1 * n2 * (n1 + n2 + 1) / 12.0)
    if sigma == 0:
        return 0.0
    return float((res.statistic - mu) / sigma)
