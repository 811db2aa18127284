"""Multi-process fan-out: two --process-index workers + --merge-only
produce output identical to a single-process run (the pyflow-style
process-level data parallelism, SURVEY §2.5)."""
import gzip
import os
import subprocess
import sys

DEMO = "/root/reference/src/demo/data"
WRAP = ("import jax; jax.config.update('jax_platforms','cpu');"
        "from strelka_tpu.workflow.somatic import run_somatic;"
        "import sys; sys.exit(run_somatic(sys.argv[1:]))")


def run_cli(args):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run([sys.executable, "-c", WRAP] + args,
                       capture_output=True, text=True, env=env,
                       cwd=os.path.dirname(os.path.dirname(__file__)))
    assert r.returncode == 0, r.stderr[-2000:]


def records(path):
    with gzip.open(path, "rt") as f:
        return [l for l in f if not l.startswith("#")]


def test_two_worker_fanout_matches_single_process(tmp_path):
    base = ["--reference", f"{DEMO}/demo20.fa",
            "--normal-align-file", f"{DEMO}/NA12892_demo20.bam",
            "--tumor-align-file", f"{DEMO}/NA12891_demo20.bam",
            "--exome", "--max-region-size", "1500"]

    single = str(tmp_path / "single")
    run_cli(base + ["--output-dir", single])

    multi = str(tmp_path / "multi")
    for idx in ("0", "1"):
        run_cli(base + ["--output-dir", multi,
                        "--process-index", idx, "--process-count", "2"])
    run_cli(base + ["--output-dir", multi, "--merge-only"])

    for kind in ("snvs", "indels"):
        a = records(os.path.join(single, f"somatic.{kind}.vcf.gz"))
        b = records(os.path.join(multi, f"somatic.{kind}.vcf.gz"))
        assert a == b, kind
