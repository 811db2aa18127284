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


def test_engine_mesh_matches_single_device(tmp_path):
    """--mesh sharding of the production scoring launches must be
    record-identical to the single-device path (8 virtual CPU devices
    via conftest)."""
    import gzip
    import os

    import pytest

    DEMO = "/root/reference/src/demo/data"
    if not os.path.exists(DEMO):
        pytest.skip("no demo data")
    from strelka_tpu.parallel import mesh as pmesh
    from strelka_tpu.workflow.somatic import run_somatic

    def run(out, mesh_args):
        rc = run_somatic([
            "--reference", f"{DEMO}/demo20.fa",
            "--normal-align-file", f"{DEMO}/NA12892_demo20.bam",
            "--tumor-align-file", f"{DEMO}/NA12891_demo20.bam",
            "--output-dir", str(out), "--exome", *mesh_args])
        assert rc == 0
        with gzip.open(out / "somatic.snvs.vcf.gz", "rt") as f:
            return [l for l in f
                    if not l.startswith(("##cmdline", "##startTime",
                                         "##fileDate"))]

    try:
        plain = run(tmp_path / "plain", [])
        meshed = run(tmp_path / "mesh", ["--mesh", "4"])
        assert pmesh.engine_mesh() is not None
        assert pmesh.engine_mesh().shape["dp"] == 4
        assert meshed == plain
    finally:
        pmesh.set_engine_mesh(None)


def test_engine_mesh_from_spec_parsing():
    from strelka_tpu.parallel import mesh as pm
    assert pm.engine_mesh_from_spec(None) is None
    assert pm.engine_mesh_from_spec("") is None
    m = pm.engine_mesh_from_spec("auto")
    assert m.shape["dp"] >= 1 and m.shape["sp"] == 1
    m4 = pm.engine_mesh_from_spec("4")
    assert m4.shape["dp"] == 4
    m22 = pm.engine_mesh_from_spec("2x2")
    assert m22.shape["dp"] == 2 and m22.shape["sp"] == 2


def test_engine_mesh_chunked_snv_identical():
    """call_snv_tile_chunked with the position axis dp-sharded over the
    virtual mesh returns exactly the unsharded results (positions are
    independent; no cross-shard math)."""
    import numpy as np

    from strelka_tpu.models import snv_digt as sd
    from strelka_tpu.parallel import mesh as pm

    rng = np.random.default_rng(3)
    L = sd.SNV_TILE_L * 2 + 1000  # 2 full chunks + partial tail
    D = 32
    ref = rng.integers(0, 4, L).astype(np.int32)
    base = np.broadcast_to(ref[:, None], (L, D)).astype(np.int8).copy()
    idx = rng.choice(L, 200, replace=False)
    base[idx, :10] = (ref[idx][:, None] + 1) % 4
    tile = sd.SnvPileupTile(
        base_id=base,
        qual=np.full((L, D), 35, np.int16),
        is_fwd=(rng.random((L, D)) < 0.5),
        mask=(rng.random((L, D)) < 0.7),
        ref_gt=ref)
    # force the device path for the unsharded run: this test proves
    # mesh invariance of the DEVICE pipeline, and the CPU-backend
    # native caller has its own accumulation order (ulp-level SB
    # differences via lt; native/snvcall.cpp module doc)
    import os
    os.environ["STRELKA_TPU_SNV_DEVICE"] = "1"
    try:
        plain = sd.call_snv_tile_chunked(tile)
        pm.set_engine_mesh(pm.engine_mesh_from_spec("4"))
        meshed = sd.call_snv_tile_chunked(tile)
    finally:
        pm.set_engine_mesh(None)
        os.environ.pop("STRELKA_TPU_SNV_DEVICE", None)
    for f in ("genome_max_gt", "poly_max_gt", "snv_qphred",
              "genome_max_gt_qphred", "poly_max_gt_qphred",
              "phred_loghood", "strand_bias"):
        a = np.asarray(getattr(plain, f))
        b = np.asarray(getattr(meshed, f))
        assert np.array_equal(a, b), f


def test_sharded_best_offsets_sp_axis_exact(devices):
    """sp-sharding the offset-window axis of the production scoring
    kernel must reproduce the unsharded (best, argmax-offset) pair
    EXACTLY — including argmax's first-occurrence tie-break when
    padding windows (code 4, zero contribution) tie a real offset."""
    from strelka_tpu.ops import pallas_readlik as pk

    rng = np.random.default_rng(7)
    B, R, L, W = 8, 16, 32, 64
    codes = rng.integers(0, 5, (B, R, L)).astype(np.int8)
    delta = rng.uniform(0.5, 20, (B, R, L)).astype(np.float32)
    delta[codes >= 4] = 0.0
    lnmis = rng.normal(-50, 5, (B, R)).astype(np.float32)
    win = rng.integers(0, 5, (B, L, W)).astype(np.int8)
    win[:, :, W // 2:] = 4  # padding offsets -> guaranteed score ties
    # make some reads all-N so every window ties at lnmis exactly
    codes[:, :2] = 4
    delta[:, :2] = 0.0

    ref_best, ref_off = pk.exact_best_offsets(
        jnp.asarray(codes), jnp.asarray(delta), jnp.asarray(lnmis),
        jnp.asarray(win))

    # the exact limb formulation is accumulation-order independent, so
    # sharded == unsharded holds bitwise at ANY shard width (the old
    # f32-HIGHEST path was only stable for shards >= 32 on CPU XLA)
    for dp, sp, ndev in ((4, 2, 8), (2, 2, 4), (1, 4, 4)):
        m = pm.make_mesh(devices[:ndev], dp=dp, sp=sp)
        fn = pm.sharded_best_offsets(pk.exact_best_offsets, m)
        best, off = fn(jnp.asarray(codes), jnp.asarray(delta),
                       jnp.asarray(lnmis), jnp.asarray(win))
        assert np.array_equal(np.asarray(best), np.asarray(ref_best)), (dp, sp)
        assert np.array_equal(np.asarray(off), np.asarray(ref_off)), (dp, sp)


def test_mesh_germline_synth_byte_identical(tmp_path):
    """Full germline CLI on synthetic SNV+indel data: --mesh 4 output
    is byte-identical to the unmeshed run (sharded SNV genotyping,
    realign scoring, and somatic-free gvcf assembly all covered)."""
    import gzip
    import os
    import sys

    sys.path.insert(0, "/root/repo")
    from benchmarks import synth
    from strelka_tpu.io.bam import BamHeader
    from strelka_tpu.io.bam_writer import write_bam
    from strelka_tpu.workflow.germline import run_germline

    refs, batch, _ = synth.generate(L=200_000, depth=25, snv_every=800,
                                    indel_every=1100, seed=21)
    fa = tmp_path / "ref.fa"
    fa.write_text(">syn\n" + refs + "\n")
    bam = str(tmp_path / "s.bam")
    write_bam(bam, BamHeader(text="", ref_names=["syn"],
                             ref_lengths=[len(refs)]), batch)

    def run(tag, extra):
        out = tmp_path / tag
        run_germline(["--reference", str(fa), "--align-file", bam,
                      "--exome", "--output-dir", str(out), *extra])
        lines = {}
        for name in ("variants.vcf.gz", "genome.S1.vcf.gz"):
            lines[name] = [
                l for l in gzip.open(out / name, "rt")
                if not l.startswith(("##cmdline", "##startTime",
                                     "##fileDate"))]
        return lines

    from strelka_tpu.parallel import mesh as pm
    try:
        plain = run("plain", [])
        meshed = run("mesh", ["--mesh", "4"])
    finally:
        pm.set_engine_mesh(None)
    assert plain == meshed
    assert len(plain["variants.vcf.gz"]) > 100
