"""--jobs local fan-out (pyflow local-mode analog) + hardware sizing.

Reference: pyflow local RunMode (one process per task, retry) driven by
runWorkflow.py -j N; estimateHardware.py core/memory detection.
"""
import gzip
import os
import subprocess
import sys

import pytest

from strelka_tpu.parallel import hardware

DEMO = "/root/reference/src/demo/data"


def test_hardware_estimates():
    assert hardware.core_count() >= 1
    assert hardware.mem_total_mb() > 0
    j = hardware.suggest_jobs()
    assert 1 <= j <= hardware.core_count()
    # memory-capped: huge per-job requirement collapses to 1
    assert hardware.suggest_jobs(mem_per_job_mb=10 ** 9) == 1


@pytest.mark.skipif(not os.path.exists(DEMO), reason="no demo data")
def test_jobs_fanout_matches_single_process(tmp_path):
    base = ["--reference", f"{DEMO}/demo20.fa",
            "--align-file", f"{DEMO}/NA12892_demo20.bam",
            "--exome", "--max-region-size", "1500", "--platform", "cpu"]
    env = dict(os.environ)
    single = tmp_path / "single"
    multi = tmp_path / "multi"
    r1 = subprocess.run(
        [sys.executable, "-m", "strelka_tpu.workflow.germline", *base,
         "--output-dir", str(single)], env=env, capture_output=True)
    assert r1.returncode == 0, r1.stderr.decode()[-2000:]
    r2 = subprocess.run(
        [sys.executable, "-m", "strelka_tpu.workflow.germline", *base,
         "--output-dir", str(multi), "--jobs", "2"], env=env,
        capture_output=True)
    assert r2.returncode == 0, r2.stderr.decode()[-2000:]

    def records(p):
        with gzip.open(p, "rt") as f:
            return [l for l in f if not l.startswith("#")]

    assert records(single / "genome.S1.vcf.gz") == \
        records(multi / "genome.S1.vcf.gz")
    assert records(single / "variants.vcf.gz") == \
        records(multi / "variants.vcf.gz")
