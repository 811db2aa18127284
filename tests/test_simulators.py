"""Statistical caller validation via model-level simulators (the
reference's starlingSiteSimulator / strelkaSiteSimulator test role)."""
import numpy as np
import pytest

import jax.numpy as jnp

from strelka_tpu import sim
from strelka_tpu.models import digt, snv_digt, somatic_snv as ss


def test_germline_caller_statistics():
    rng = np.random.default_rng(42)
    opt = sim.SimOptions(depth=30, qscore=30, ref_base=0)
    # het sites A/C over ref A
    base, qual, fwd, mask = sim.simulate_germline_sites(rng, 200, (0, 1), opt)
    tile = snv_digt.SnvPileupTile(
        base_id=jnp.asarray(base), qual=jnp.asarray(qual),
        is_fwd=jnp.asarray(fwd), mask=jnp.asarray(mask),
        ref_gt=jnp.zeros(200, jnp.int32))
    res = snv_digt.call_snv_tile(tile)
    gts = np.asarray(res.genome_max_gt)
    het_rate = (gts == digt.LABELS.index("AC")).mean()
    assert het_rate > 0.97, het_rate
    # hom-ref sites: almost no false variants
    base, qual, fwd, mask = sim.simulate_germline_sites(rng, 300, (0, 0), opt)
    tile = snv_digt.SnvPileupTile(
        base_id=jnp.asarray(base), qual=jnp.asarray(qual),
        is_fwd=jnp.asarray(fwd), mask=jnp.asarray(mask),
        ref_gt=jnp.zeros(300, jnp.int32))
    res = snv_digt.call_snv_tile(tile)
    fp = (np.asarray(res.snv_qphred) >= 30).mean()
    assert fp < 0.01, fp


def test_somatic_caller_statistics():
    rng = np.random.default_rng(7)
    nopt = sim.SimOptions(depth=30, qscore=30, ref_base=0)
    topt = sim.SimOptions(depth=60, qscore=30, ref_base=0)

    def run_pair(tumor_freq, n=60):
        qs = []
        for _ in range(n):
            (nb, nq, nf), (tb, tq, tf) = sim.simulate_somatic_site(
                rng, (0, 0), tumor_freq, alt_base=2,
                normal_opt=nopt, tumor_opt=topt)
            def tile(b, q, f, D=128):
                bb = np.full(D, -1, np.int32)
                qq = np.zeros(D, np.int32)
                ff = np.zeros(D, bool)
                mm = np.zeros(D, bool)
                n_calls = min(len(b), D)
                bb[:n_calls] = b[:n_calls]
                qq[:n_calls] = q[:n_calls]
                ff[:n_calls] = f[:n_calls]
                mm[:n_calls] = True
                return (jnp.asarray(bb[None]), jnp.asarray(qq[None]),
                        jnp.asarray(ff[None]), jnp.asarray(mm[None]))
            nbj, nqj, nfj, nmj = tile(nb, nq, nf)
            tbj, tqj, tfj, tmj = tile(tb, tq, tf)
            nlh = ss.freq_grid_lhoods(nbj, nqj, nmj, nfj, jnp.zeros(1, jnp.int32))
            tlh = ss.freq_grid_lhoods(tbj, tqj, tmj, tfj, jnp.zeros(1, jnp.int32))
            r = ss.somatic_snv_call(nlh, tlh)
            qs.append(int(r.qphred[0]))
        return np.array(qs)

    q_som = run_pair(0.3)
    q_null = run_pair(0.0)
    # sensitivity: 30% VAF at 60x should call nearly always at Q>=15
    assert (q_som >= 15).mean() > 0.9, (q_som >= 15).mean()
    # specificity: no tumor alt -> almost never Q>=15
    assert (q_null >= 15).mean() < 0.05, (q_null >= 15).mean()


def test_qval_distro_file(tmp_path):
    # qval_distro file format: "qval count" lines, '#' comments
    # (strelka_sim_test.cpp:126-203)
    p = tmp_path / "qvals.txt"
    p.write_text("# qval count\n30 90\n20 10\n")
    qd = sim.QvalDistro.from_file(str(p))
    rng = np.random.default_rng(0)
    s = qd.sample(rng, 20_000)
    assert set(np.unique(s)) == {20, 30}
    assert abs((s == 30).mean() - 0.9) < 0.02
    # constant fallback
    s2 = sim.QvalDistro(25).sample(rng, 5)
    assert (s2 == 25).all()
    with pytest.raises(ValueError):
        empty = tmp_path / "empty.txt"
        empty.write_text("# nothing\n")
        sim.QvalDistro.from_file(str(empty))


def test_sim_sample_pile_stranded_counts():
    rng = np.random.default_rng(1)
    qd = sim.QvalDistro(40)
    tot = alt = fwd = 0
    for _ in range(200):
        b, q, f = sim.sim_sample_pile(rng, 40, qd, 0, 2, 0.5)
        tot += len(b)
        alt += int((b == 2).sum())
        fwd += int(f.sum())
        assert (q == 40).all()
    assert abs(alt / tot - 0.5) < 0.03   # alt freq honored
    assert abs(fwd / tot - 0.5) < 0.03   # strand split honored


def test_germline_indel_genotyping_calibration():
    # model-layer indel simulation: genotype accuracy and Q-score
    # calibration at depth 30, error 1e-3
    rng = np.random.default_rng(5)
    opt = sim.IndelSimOptions(depth=30, error_rate=1e-3, read_len=100,
                              delete_len=1)
    for true_gt, gt_index in ((0, 0), (1, 1), (2, 2)):
        hits = 0
        n = 50
        for _ in range(n):
            lh, rl, na = sim.simulate_indel_locus(rng, true_gt, opt)
            max_gt, q_ref, q_gt = sim.call_simulated_indel_locus(
                lh, rl, na, opt)
            hits += max_gt == gt_index
            if true_gt > 0:
                assert q_ref >= 20  # non-ref loci leave ref confidently
        assert hits / n > 0.9, (true_gt, hits / n)


def test_germline_indel_qscore_calibration_ref_sites():
    # hom-ref loci must almost never produce confident variant calls:
    # the empirical miscall rate at Q>=30 stays under 10^-(30/10)*margin
    rng = np.random.default_rng(6)
    opt = sim.IndelSimOptions(depth=30, error_rate=2e-3, read_len=100,
                              delete_len=1)
    n = 400
    confident_miscalls = 0
    for _ in range(n):
        lh, rl, na = sim.simulate_indel_locus(rng, 0, opt)
        max_gt, q_ref, q_gt = sim.call_simulated_indel_locus(lh, rl, na, opt)
        if max_gt != 0 and q_gt >= 30:
            confident_miscalls += 1
    assert confident_miscalls <= 2, confident_miscalls


def _somatic_q(sites, D=192):
    """Batch simulated T/N sites through the somatic SNV grid caller."""
    n = len(sites)

    def tile(picks):
        bb = np.full((n, D), -1, np.int32)
        qq = np.zeros((n, D), np.int32)
        ff = np.zeros((n, D), bool)
        mm = np.zeros((n, D), bool)
        for i, (b, q, f) in enumerate(picks):
            k = min(len(b), D)
            bb[i, :k] = b[:k]
            qq[i, :k] = q[:k]
            ff[i, :k] = f[:k]
            mm[i, :k] = True
        return (jnp.asarray(bb), jnp.asarray(qq), jnp.asarray(ff),
                jnp.asarray(mm))

    nb, nq, nf, nm = tile([s.normal for s in sites])
    tb, tq, tf, tm = tile([s.tumor for s in sites])
    ref_gt = jnp.zeros(n, jnp.int32)
    nlh = ss.freq_grid_lhoods(nb, nq, nm, nf, ref_gt)
    tlh = ss.freq_grid_lhoods(tb, tq, tm, tf, ref_gt)
    return np.asarray(ss.somatic_snv_call(nlh, tlh).qphred)


def test_somatic_grid_state_simulation():
    rng = np.random.default_rng(8)

    def run(mode, **kw):
        opt = sim.StrelkaSimOptions(total_sites=40, ncov=35, tcov=60,
                                    mode=mode, **kw)
        return _somatic_q(list(sim.simulate_strelka_sites(rng, opt)))

    q_som = run(sim.SIM_SOMATIC, tumor_purity=1.0)
    q_ref = run(sim.SIM_REF)
    q_germ = run(sim.SIM_GERMLINE)
    opt = sim.StrelkaSimOptions(total_sites=60, ncov=35, tcov=60,
                                mode=sim.SIM_NOISE)
    noise_sites = list(sim.simulate_strelka_sites(rng, opt))
    q_noise = _somatic_q(noise_sites)
    # somatic states detected; ref/germline rejected outright
    assert (q_som >= 15).mean() > 0.9, q_som
    assert (q_ref >= 15).mean() < 0.05, q_ref
    assert (q_germ >= 15).mean() < 0.05, q_germ
    # shared noise clearly visible in the normal is rejected by the
    # joint grid (the reason the 2D grid exists); only noise faint
    # enough to hide in the normal's binomial fluctuation can
    # masquerade as somatic
    hi = np.array([s.normal_alt_freq >= 0.3 for s in noise_sites])
    assert hi.sum() >= 20
    assert (q_noise[hi] >= 15).mean() < 0.1, q_noise[hi]
    assert (q_noise >= 15).mean() < (q_som >= 15).mean() / 2


def test_somatic_purity_depth_sweep():
    # sensitivity rises with depth and purity; full purity at 60x is
    # near-perfect, half purity at 30x is measurably weaker
    rng = np.random.default_rng(9)

    def sens(tcov, purity, n=40):
        opt = sim.StrelkaSimOptions(total_sites=n, ncov=35, tcov=tcov,
                                    mode=sim.SIM_SOMATIC,
                                    tumor_purity=purity)
        q = _somatic_q(list(sim.simulate_strelka_sites(rng, opt)))
        return (q >= 15).mean()

    s_hi = sens(60, 1.0)
    s_lo = sens(30, 0.5)
    assert s_hi > 0.9, s_hi
    assert s_lo < s_hi + 1e-9, (s_lo, s_hi)


def test_random_mode_draws_states_per_site():
    # elevated priors so every state appears; the reference's frozen
    # SIM_RANDOM mode bug (strelka_sim_test.cpp:300-316) would leave
    # only one state after the first non-REF site
    rng = np.random.default_rng(10)
    opt = sim.StrelkaSimOptions(total_sites=400, ncov=10, tcov=10,
                                shared_site_error_rate=0.2,
                                ssnv_prior=0.2, bsnp_diploid_theta=0.2)
    modes = {s.mode for s in sim.simulate_strelka_sites(rng, opt)}
    assert modes == {sim.SIM_REF, sim.SIM_NOISE, sim.SIM_SOMATIC,
                     sim.SIM_GERMLINE}


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
