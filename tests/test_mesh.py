"""Device-mesh sharding tests on the 8 virtual CPU devices
(conftest.py sets xla_force_host_platform_device_count=8)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from strelka_tpu.parallel import mesh as pm


@pytest.fixture(scope="module")
def devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs


def test_make_mesh_shapes(devices):
    m = pm.make_mesh(devices)
    assert m.devices.size == 8
    assert set(m.axis_names) == {"dp", "sp"}
    m2 = pm.make_mesh(devices, dp=8, sp=1)
    assert m2.devices.shape == (8, 1)


def test_dryrun_compiles_and_runs(devices):
    # the driver's dryrun_multichip goes through this path
    pm.dryrun(8)


def test_sharded_scoring_matches_single_device(devices):
    rng = np.random.default_rng(0)
    B, R, L4, W = 8, 16, 64, 32
    delta = rng.normal(size=(B, R, L4)).astype(np.float32)
    lnmis = rng.normal(size=(B, R)).astype(np.float32)
    win = rng.normal(size=(B, W, L4)).astype(np.float32)

    best_ref, s_ref = pm._score_and_reduce(
        jnp.asarray(delta), jnp.asarray(lnmis), jnp.asarray(win))

    m = pm.make_mesh(devices, dp=4, sp=2)
    from jax.sharding import NamedSharding, PartitionSpec as P
    sharded = jax.jit(
        pm._score_and_reduce,
        in_shardings=(NamedSharding(m, P("dp", None, None)),
                      NamedSharding(m, P("dp", None)),
                      NamedSharding(m, P("dp", "sp", None))),
    )
    best_sh, s_sh = sharded(jnp.asarray(delta), jnp.asarray(lnmis),
                            jnp.asarray(win))
    # f32 matmul partial-sum order differs across shards: ulp-level
    np.testing.assert_allclose(np.asarray(best_sh), np.asarray(best_ref),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(s_sh), np.asarray(s_ref),
                               rtol=1e-3, atol=1e-3)
