"""Device-mesh sharding of the calling compute.

TPU-native replacement for the reference's process-level genome-segment
parallelism (reference: pyflow fan-out, strelkaSharedWorkflow.py:219-227,
workflowUtil.py:182-219). Locus/read tiles are sharded over a
jax.sharding.Mesh:

  axis 'dp' — data parallel over locus tiles (the analog of genome
              segments; each shard holds different active-region work)
  axis 'sp' — sequence parallel over the offset window of the
              read x haplotype scoring matmul (the analog of splitting
              a long DP wavefront); the max-over-offsets reduction
              crosses 'sp' shards, so XLA inserts an all-reduce(max)
              over ICI.

gVCF text emission stays on hosts (SURVEY.md §5) — only likelihood
tensors live on the mesh.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import snv_digt


def make_mesh(devices=None, dp: int | None = None, sp: int | None = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dp is None or sp is None:
        # favor dp; sp gets factor 2 when available
        sp = 2 if n % 2 == 0 and n > 1 else 1
        dp = n // sp
    assert dp * sp == n, (dp, sp, n)
    arr = np.array(devices).reshape(dp, sp)
    return Mesh(arr, ("dp", "sp"))


def _score_and_reduce(delta, lnmis_sum, windows):
    """Core scoring matmul + offset reduction.

    delta [B, R, L4], windows [B, W, L4] (haplotype windows already
    gathered, offset axis W shardable), -> per-read best score [B, R]
    and full score matrix [B, R, W].
    """
    s = jnp.einsum("brk,bwk->brw", delta, windows,
                   preferred_element_type=jnp.float32)
    s = s + lnmis_sum[..., None]
    return jnp.max(s, axis=-1), s


def _region_step(snv_base, snv_qual, snv_fwd, snv_mask, snv_ref,
                 delta, lnmis_sum, windows):
    """One fused 'call step' over sharded tiles: batched SNV genotyping
    + read x haplotype scoring. This is the per-iteration device program
    of the engine (the analog of a framework's training step)."""
    tile = snv_digt.SnvPileupTile(
        base_id=snv_base, qual=snv_qual, is_fwd=snv_fwd,
        mask=snv_mask, ref_gt=snv_ref)
    snv_res = snv_digt.call_snv_tile(tile, theta=0.001)
    best, _ = _score_and_reduce(delta, lnmis_sum, windows)
    return snv_res.snv_qphred, snv_res.genome_max_gt, best


def make_sharded_call_step(mesh: Mesh):
    """jit the region call step with dp/sp shardings over `mesh`."""
    dp = P("dp")
    snv_spec = NamedSharding(mesh, P("dp", None))
    ref_spec = NamedSharding(mesh, dp)
    delta_spec = NamedSharding(mesh, P("dp", None, None))
    lnmis_spec = NamedSharding(mesh, P("dp", None))
    win_spec = NamedSharding(mesh, P("dp", "sp", None))
    out_specs = (ref_spec, ref_spec, NamedSharding(mesh, P("dp", None)))
    return jax.jit(
        _region_step,
        in_shardings=(snv_spec, snv_spec, snv_spec, snv_spec, ref_spec,
                      delta_spec, lnmis_spec, win_spec),
        out_shardings=out_specs,
    )


def example_region_inputs(n_loci=64, depth=32, n_tiles=8, reads=16,
                          read_l4=128 * 4, n_windows=64, rng_seed=0):
    """Tiny example inputs for compile checks (shapes divisible by
    typical mesh factors)."""
    rng = np.random.default_rng(rng_seed)
    snv_base = jnp.asarray(rng.integers(0, 4, (n_loci, depth)), jnp.int32)
    snv_qual = jnp.asarray(rng.integers(10, 41, (n_loci, depth)), jnp.int32)
    snv_fwd = jnp.asarray(rng.random((n_loci, depth)) < 0.5)
    snv_mask = jnp.asarray(rng.random((n_loci, depth)) < 0.9)
    snv_ref = jnp.asarray(rng.integers(0, 4, n_loci), jnp.int32)
    delta = jnp.asarray(rng.normal(size=(n_tiles, reads, read_l4)), jnp.float32)
    lnmis = jnp.asarray(rng.normal(size=(n_tiles, reads)), jnp.float32)
    windows = jnp.asarray(rng.random((n_tiles, n_windows, read_l4)) < 0.25,
                          jnp.float32)
    return (snv_base, snv_qual, snv_fwd, snv_mask, snv_ref,
            delta, lnmis, windows)


def dryrun(n_devices: int) -> None:
    """Compile + run one sharded call step on an n-device mesh."""
    devs = jax.devices()[:n_devices]
    mesh = make_mesh(devs)
    step = make_sharded_call_step(mesh)
    args = example_region_inputs(
        n_loci=max(8, n_devices) * 8, n_tiles=max(8, n_devices))
    with mesh:
        q, gt, best = step(*args)
        jax.block_until_ready((q, gt, best))
    assert q.shape[0] == args[0].shape[0]


# --- engine mesh: opt-in multi-device sharding of the production call
# path (CLI --mesh). The fan-out default stays one device per process
# (the analog of the reference's one core per process); the engine mesh
# instead spreads each process's kernel launches over all local
# devices, dp-sharding the batch axis (no cross-shard collectives in
# the scoring kernel: offsets reduce within a shard).

_ENGINE_MESH: Mesh | None = None
_SHARDED_KERNELS: dict = {}


def set_engine_mesh(mesh: Mesh | None) -> None:
    global _ENGINE_MESH
    _ENGINE_MESH = mesh
    _SHARDED_KERNELS.clear()


def engine_mesh() -> Mesh | None:
    return _ENGINE_MESH


def engine_mesh_from_spec(spec: str | None) -> Mesh | None:
    """--mesh parsing: "auto" = all local devices (dp only),
    "N" = first N devices, "DPxSP" = explicit factors."""
    if not spec:
        return None
    devs = jax.devices()
    if spec == "auto":
        return Mesh(np.array(devs).reshape(len(devs), 1), ("dp", "sp"))
    if "x" in spec:
        dp, sp = (int(x) for x in spec.split("x"))
        return Mesh(np.array(devs[:dp * sp]).reshape(dp, sp), ("dp", "sp"))
    n = int(spec)
    return Mesh(np.array(devs[:n]).reshape(n, 1), ("dp", "sp"))


def chunk_sharder():
    """Device-put helper for fixed-shape position chunks: with an
    engine mesh set, arrays are placed with their leading (position)
    axis sharded over every mesh device — positions are independent,
    so XLA partitions the downstream genotyping/grid programs with no
    collectives. Without a mesh it is jnp.asarray."""
    mesh = _ENGINE_MESH
    if mesh is None:
        return jnp.asarray
    axes = ("dp", "sp")

    def put(a):
        # device_put on the raw host array shards host->devices in one
        # step; jnp.asarray first would commit to the default device
        # and force a second full transfer on reshard
        sh = NamedSharding(mesh, P(axes, *([None] * (np.ndim(a) - 1))))
        return jax.device_put(a, sh)

    return put


def sharded_best_offsets(kernel, mesh: Mesh):
    """Wrap a best-offsets kernel (codes, delta, lnmis, win_t) -> (best,
    off) to run sharded over `mesh`:

      dp — leading batch (locus-hap pair) axis; pairs are independent,
           no collectives.
      sp — the offset axis of `win_t` [B, L, W] (sequence parallelism
           over the scoring wavefront): each sp shard scores a
           contiguous slice of offsets, then the global best is an
           all_gather + max over sp with argmax's first-occurrence
           tie-break (padding windows can tie the best real offset, so
           the combine must keep the LOWEST winning offset to match
           the unsharded jnp.argmax byte-for-byte).
    """
    key = (kernel, id(mesh))
    fn = _SHARDED_KERNELS.get(key)
    if fn is None:
        b3 = P("dp", None, None)
        b2 = P("dp", None)
        sp = mesh.shape.get("sp", 1)
        if sp == 1:
            inner = kernel
            win_spec = b3
        else:
            win_spec = P("dp", None, "sp")

            def inner(codes, delta, lnmis, win):
                best, off = kernel(codes, delta, lnmis, win)
                w_local = win.shape[2]
                off = off + jax.lax.axis_index("sp").astype(off.dtype) * w_local
                bests = jax.lax.all_gather(best, "sp")   # [sp, B, R]
                offs = jax.lax.all_gather(off, "sp")
                gbest = jnp.max(bests, axis=0)
                big = jnp.iinfo(offs.dtype).max
                goff = jnp.min(
                    jnp.where(bests == gbest[None], offs, big), axis=0)
                return gbest, goff

        # jit is LOAD-BEARING: a bare shard_map callable re-traces and
        # re-compiles on every invocation (the round-4 sharded "compile
        # storm" — hundreds of one-shot XLA programs per region run);
        # jit gives it a shape-keyed executable cache like every other
        # kernel launch
        wrapped = jax.jit(jax.shard_map(inner, mesh=mesh,
                                        in_specs=(b3, b3, b2, win_spec),
                                        out_specs=(b2, b2),
                                        check_vma=False))
        _SHARDED_KERNELS[key] = fn = wrapped
    return fn
