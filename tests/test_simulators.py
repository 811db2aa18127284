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


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
