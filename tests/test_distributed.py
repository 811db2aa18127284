"""jax.distributed multi-host tests: two coordinated CPU processes
(gloo collectives) call the germline workflow with cross-host segment
assignment via init_distributed (runner.py:276), then the ordered merge
reproduces the single-process output byte-for-byte (SURVEY §2.5
'distributed comm backend'; reference analog: pyflow cross-node task
distribution, pyflow.py RunMode sge)."""
import gzip
import os
import socket
import subprocess
import sys

DEMO = "/root/reference/src/demo/data"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WRAP = ("import jax; jax.config.update('jax_platforms','cpu');"
        "from strelka_tpu.workflow.germline import run_germline;"
        "import sys; sys.exit(run_germline(sys.argv[1:]))")

PSUM_WORKER = """
import os, sys
import jax
jax.config.update('jax_platforms', 'cpu')
sys.path.insert(0, {repo!r})
from strelka_tpu.parallel import runner as rn
pid, cnt = rn.init_distributed()
assert cnt == 2, cnt
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
mesh = Mesh(np.array(jax.devices()), ('dp',))
# one 'reads processed' count per process, summed across hosts (the
# cross-host reduction for counts/depth merges)
local = np.array([100.0 * (pid + 1)])
arr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P('dp')), local, (cnt,))
total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
val = float(np.asarray(jax.device_get(total.addressable_data(0))))
assert val == 300.0, val
print('PSUM_OK', pid, val, flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn(args, env_extra, cwd=REPO):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.update(env_extra)
    return subprocess.Popen([sys.executable, "-c", WRAP] + args,
                            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                            text=True, env=env, cwd=cwd)


def _dist_env(port, pid):
    return {
        "STRELKA_TPU_COORDINATOR": f"localhost:{port}",
        "STRELKA_TPU_NUM_PROCESSES": "2",
        "STRELKA_TPU_PROCESS_ID": str(pid),
    }


def records(path):
    with gzip.open(path, "rt") as f:
        return [l for l in f if not l.startswith("#")]


def test_two_host_distributed_run_matches_single_process(tmp_path):
    base = ["--reference", f"{DEMO}/demo20.fa",
            "--align-file", f"{DEMO}/NA12891_demo20.bam",
            "--align-file", f"{DEMO}/NA12892_demo20.bam",
            "--exome", "--max-region-size", "1500"]

    single = str(tmp_path / "single")
    p = _spawn(base + ["--output-dir", single], {})
    out, err = p.communicate(timeout=300)
    assert p.returncode == 0, err[-2000:]

    # two coordinated processes; segment shares come from
    # jax.process_index()/process_count() inside init_distributed —
    # no --process-index flags anywhere
    port = _free_port()
    multi = str(tmp_path / "multi")
    procs = [_spawn(base + ["--output-dir", multi], _dist_env(port, pid))
             for pid in (0, 1)]
    errs = [p.communicate(timeout=300) for p in procs]
    for p, (out, err) in zip(procs, errs):
        assert p.returncode == 0, err[-2000:]

    p = _spawn(base + ["--output-dir", multi, "--merge-only"], {})
    out, err = p.communicate(timeout=300)
    assert p.returncode == 0, err[-2000:]

    for name in ("variants.vcf.gz", "genome.S1.vcf.gz", "genome.S2.vcf.gz"):
        a = records(os.path.join(single, name))
        b = records(os.path.join(multi, name))
        assert len(a) > 0 and a == b, name


def test_cross_host_psum_of_counts(tmp_path):
    port = _free_port()
    procs = []
    for pid in (0, 1):
        env = dict(os.environ)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
        env.update(_dist_env(port, pid))
        procs.append(subprocess.Popen(
            [sys.executable, "-c", PSUM_WORKER.format(repo=REPO)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=REPO))
    for p in procs:
        out, err = p.communicate(timeout=180)
        assert p.returncode == 0, err[-2000:]
        assert "PSUM_OK" in out, out
