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


@pytest.mark.skipif(not os.path.exists(DEMO), reason="no demo data")
def test_cluster_submit_wraps_workers(tmp_path):
    """--cluster-submit (pyflow sge-mode analog): every worker command
    runs through the blocking submit wrapper; output matches a plain
    run."""
    sub = tmp_path / "submit.sh"
    log = tmp_path / "submits.log"
    sub.write_text("#!/bin/sh\necho \"$@\" >> %s\nexec \"$@\"\n" % log)
    sub.chmod(0o755)
    out = tmp_path / "out"
    base = ["--reference", f"{DEMO}/demo20.fa",
            "--align-file", f"{DEMO}/NA12892_demo20.bam",
            "--exome", "--max-region-size", "1500", "--platform", "cpu"]
    r = subprocess.run(
        [sys.executable, "-m", "strelka_tpu.workflow.germline", *base,
         "--output-dir", str(out), "--jobs", "2",
         "--cluster-submit", str(sub)],
        env=dict(os.environ), capture_output=True)
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    lines = log.read_text().splitlines()
    assert len(lines) == 2  # one submission per worker, none for merge
    assert all("--process-index" in l for l in lines)
    with gzip.open(out / "variants.vcf.gz", "rt") as f:
        assert sum(1 for l in f if not l.startswith("#")) > 0


@pytest.mark.skipif(not os.path.exists(DEMO), reason="no demo data")
def test_cluster_async_lost_worker_requeued(tmp_path):
    """Non-blocking cluster mode (pyflow qsub/qstat analog,
    pyflow.py:939-967,1424-1435): a fake scheduler DROPS one worker
    mid-run (kills it without writing an exit status); the runner's
    poll loop detects the lost job, re-queues it, and the run
    completes byte-identical to a plain run."""
    jobdir = tmp_path / "sched"
    jobdir.mkdir()
    submit = tmp_path / "fake_qsub.py"
    submit.write_text(f"""#!/usr/bin/env python3
import os, subprocess, sys, time, glob
jobdir = {str(jobdir)!r}
shell = sys.argv[-1]
n = len(glob.glob(os.path.join(jobdir, '*.pid'))) + 1
# sabotage: the FIRST submitted job is killed 2s in, before it can
# write its rc file (a scheduler-lost worker)
if n == 1 and not os.path.exists(os.path.join(jobdir, 'sabotaged')):
    open(os.path.join(jobdir, 'sabotaged'), 'w').close()
    shell = '(' + shell.split(';')[0] + ') & P=$!; sleep 2; kill -9 $P'
p = subprocess.Popen(['/bin/sh', '-c', shell],
                     start_new_session=True)
open(os.path.join(jobdir, f'{{n}}.pid'), 'w').write(str(p.pid))
print(f'Your job {{n}} has been submitted')
""")
    status = tmp_path / "fake_qstat.py"
    status.write_text(f"""#!/usr/bin/env python3
import os, sys
jobdir = {str(jobdir)!r}
pid = int(open(os.path.join(jobdir, sys.argv[1] + '.pid')).read())
try:
    os.kill(pid, 0)
    print('running')
except ProcessLookupError:
    print('done')
    sys.exit(1)
""")
    base = ["--reference", f"{DEMO}/demo20.fa",
            "--align-file", f"{DEMO}/NA12892_demo20.bam",
            "--exome", "--max-region-size", "1500", "--platform", "cpu"]
    env = dict(os.environ)
    env["STRELKA_TPU_CLUSTER_POLL_S"] = "0.3"
    single = tmp_path / "single"
    clus = tmp_path / "clus"
    r1 = subprocess.run(
        [sys.executable, "-m", "strelka_tpu.workflow.germline", *base,
         "--output-dir", str(single)], env=env, capture_output=True)
    assert r1.returncode == 0, r1.stderr.decode()[-2000:]
    r2 = subprocess.run(
        [sys.executable, "-m", "strelka_tpu.workflow.germline", *base,
         "--output-dir", str(clus), "--jobs", "2",
         "--cluster-submit", f"{sys.executable} {submit}",
         "--cluster-status", f"{sys.executable} {status}",
         "--retry-max", "2", "--retry-wait", "0.2"], env=env,
        capture_output=True)
    assert r2.returncode == 0, (r2.stderr.decode()[-3000:])
    assert b"re-queueing" in r2.stderr, r2.stderr.decode()[-2000:]

    def records(p):
        with gzip.open(p, "rt") as f:
            return [l for l in f if not l.startswith("#")]

    assert records(single / "genome.S1.vcf.gz") == \
        records(clus / "genome.S1.vcf.gz")
    assert records(single / "variants.vcf.gz") == \
        records(clus / "variants.vcf.gz")
