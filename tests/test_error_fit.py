"""Error-model estimation tests: simulate loci with known error rates
and verify the vectorized ML fit recovers them (the reference validates
its estimator the same way in principle, via simulator apps)."""
import numpy as np
import pytest

from strelka_tpu.models import error_fit as ef


def simulate_context(rng, n_loci, depth, error_rate, noisy_rate,
                     theta=0.001):
    """Simulate (ref, alt[6]) observations under the model-3 generative
    process: noisy loci get indel errors at error_rate, clean at 1e-8;
    a small fraction of loci carry true het/hom indels at theta."""
    ref = np.zeros(n_loci, np.int64)
    alt = np.zeros((n_loci, 6), np.int64)
    for i in range(n_loci):
        d = depth
        r = rng.random()
        if r < theta / 2:      # hom indel
            alt[i, 0] = rng.binomial(d, 0.99)
            ref[i] = d - alt[i, 0]
        elif r < theta * 1.5:  # het indel
            alt[i, 0] = rng.binomial(d, 0.5)
            ref[i] = d - alt[i, 0]
        else:
            is_noisy = rng.random() < noisy_rate
            e = error_rate if is_noisy else 1e-8
            n_ins = rng.binomial(d, e)
            n_del = rng.binomial(d, e)
            alt[i, 0] = n_ins
            alt[i, 3] = n_del
            ref[i] = d - n_ins - n_del
    return ef.dedupe_counts(ref, alt)


def test_fit_recovers_error_rate():
    rng = np.random.default_rng(0)
    true_rate = 5e-3
    counts = simulate_context(rng, 4000, 30, true_rate, noisy_rate=1.0)
    fit = ef.fit_context(counts, np.log(0.001))
    assert fit.acceptable
    est = np.exp(fit.log_error_rate)
    assert 0.5 * true_rate < est < 2.0 * true_rate, est


def test_fit_recovers_noisy_fraction():
    rng = np.random.default_rng(1)
    counts = simulate_context(rng, 5000, 40, 2e-2, noisy_rate=0.3)
    fit = ef.fit_context(counts, np.log(0.002))
    noisy = np.exp(fit.log_noisy_locus_rate)
    assert 0.1 < noisy < 0.6, noisy
    est = np.exp(fit.log_error_rate)
    assert 0.4 * 2e-2 < est < 2.5 * 2e-2, est


def test_full_model_generation():
    rng = np.random.default_rng(2)
    counts_by_ctx = {}
    for key, rate in [((1, 1), 1e-4), ((1, 2), 5e-4), ((1, 16), 2e-2),
                      ((2, 2), 1e-3), ((2, 9), 1e-2)]:
        counts_by_ctx[key] = simulate_context(rng, 1500, 30, rate, 1.0)
    model, ok = ef.estimate_indel_error_model(counts_by_ctx)
    assert ok
    motifs = {(m["repeatPatternSize"], m["repeatCount"]): m["indelRate"]
              for m in model["sample"][0]["motif"]}
    # rates increase with repeat count (log-linear interpolation)
    hpol = [motifs[(1, c)] for c in range(2, 17)]
    assert all(b >= a * 0.99 for a, b in zip(hpol, hpol[1:]))
    assert 5e-3 < motifs[(1, 16)] < 8e-2
    # loadable by the runtime error model
    import json, tempfile, os
    from strelka_tpu.models.error_model import load_error_model_json
    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f:
        json.dump(model, f)
        path = f.name
    rates = load_error_model_json(path)
    os.unlink(path)
    assert "Sample000" in rates
    assert rates["Sample000"].get_rate(1, 16, "I") == pytest.approx(
        motifs[(1, 16)])


def test_context_tracks():
    from strelka_tpu.io.fasta import encode_bases
    from strelka_tpu.pipeline.allele_counts import str_context_tracks
    ref = encode_bases("CGTAAAAAGTACACACGT")
    tr = str_context_tracks(ref)
    assert tr[1][3] == 5      # AAAAA starting at 3
    assert tr[1][4] == 4
    assert tr[1][0] == 1
    assert tr[2][10] == 3     # ACACAC starting at 10
    # hpol track within the dinuc region is 1
    assert tr[1][10] == 1


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


def test_theta_json_matches_builtin_tables():
    """The shipped theta.json equals the compiled-in GenotypePriorSet
    tables; the loader parses it."""
    import numpy as np

    from strelka_tpu.models.indel_genotype import (DINUC_THETA, HPOL_THETA,
                                                   load_theta_json)
    tables = load_theta_json(
        "/root/reference/src/config/indelErrorModel/models/theta.json")
    np.testing.assert_allclose(tables[1], HPOL_THETA)
    np.testing.assert_allclose(tables[2], DINUC_THETA)


def test_shipped_indel_error_model_loads():
    from strelka_tpu.models.error_model import IndelErrorModel
    m = IndelErrorModel(1, model_files=[
        "/root/reference/src/config/indelErrorModel/models/indelErrorModel.json"])
    ins, d = m.get_rates(0, 1, 8, 9, True)
    assert 0 < float(ins) < 1 and 0 < float(d) < 1
