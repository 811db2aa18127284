"""Region-sharded run orchestration: the pyflow replacement.

Reference: redist pyflow-1.1.20 (task DAG, retry :939-967, resume from
task-state files :2489-2538,2825), workflowUtil.py getNextGenomeSegment
:182-219 (12Mb segments) + small-contig binning :335-366, and
strelkaSharedWorkflow.py merge/concat tasks :102-148.

TPU-native redesign: instead of one OS process per genome segment, a
single engine process iterates segment tasks (each one a batched device
program), with
  - a checkpointed segment cursor (JSON task-state file) enabling
    interrupt/resume,
  - per-task retry with backoff,
  - run-stats accumulation merged across segments,
  - multi-host operation by deterministic round-robin assignment of
    segments to hosts (jax.process_index) with per-host output shards
    concatenated in segment order (order-critical text merge stays on
    hosts, SURVEY.md §5).
"""
from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

SCAN_SIZE = 12_000_000          # scanSizeMb (strelkaSharedOptions.py:161)
MIN_SEGMENT_GROUP_SIZE = 200_000  # small-contig grouping target


@dataclass(frozen=True)
class GenomeSegment:
    chrom: str
    begin: int
    end: int

    @property
    def label(self) -> str:
        return f"{self.chrom}_{self.begin}_{self.end}"


def make_genome_segments(chrom_sizes: dict[str, int],
                         scan_size: int = SCAN_SIZE) -> list[GenomeSegment]:
    """Split chromosomes into ~scan_size segments with near-equal sizes
    (workflowUtil.py getNextGenomeSegment semantics)."""
    segments = []
    for chrom, size in chrom_sizes.items():
        n_seg = max(1, (size + scan_size - 1) // scan_size)
        base = size // n_seg
        extra = size % n_seg
        pos = 0
        for i in range(n_seg):
            seg_len = base + (1 if i < extra else 0)
            segments.append(GenomeSegment(chrom, pos, pos + seg_len))
            pos += seg_len
    return segments


def group_segments(segments: list[GenomeSegment],
                   min_group: int = MIN_SEGMENT_GROUP_SIZE):
    """Group small segments into >=min_group work units
    (workflowUtil.py:335-366)."""
    groups: list[list[GenomeSegment]] = []
    cur: list[GenomeSegment] = []
    cur_size = 0
    for seg in segments:
        cur.append(seg)
        cur_size += seg.end - seg.begin
        if cur_size >= min_group:
            groups.append(cur)
            cur = []
            cur_size = 0
    if cur:
        groups.append(cur)
    return groups


def merge_group_spans(groups, halo: int,
                      chrom_lengths: dict[str, int] | None = None):
    """Union of the halo'd genome spans a set of segment groups touches,
    merged per chromosome: the minimal input-read footprint of one
    fan-out process (reference: starling_run.cpp:335-342 supplemental
    region border around each per-process segment)."""
    by_chrom: dict[str, list[tuple[int, int]]] = {}
    for group in groups:
        for seg in group:
            clen = (chrom_lengths or {}).get(seg.chrom)
            beg = max(0, seg.begin - halo)
            end = seg.end + halo if clen is None else min(seg.end + halo, clen)
            by_chrom.setdefault(seg.chrom, []).append((beg, end))
    spans = []
    for chrom, sp in by_chrom.items():
        sp.sort()
        merged: list[list[int]] = []
        for beg, end in sp:
            if merged and beg <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], end)
            else:
                merged.append([beg, end])
        spans.extend((chrom, b, e) for b, e in merged)
    return spans


@dataclass
class RunStats:
    """reference: appstats/RunStats.hh RunStatsData + MergeRunStats."""
    lifetime_sec: float = 0.0
    candidate_indels: int = 0
    noncandidate_indels: int = 0
    segments_completed: int = 0
    reads_processed: int = 0
    extra: dict = field(default_factory=dict)

    def merge(self, other: "RunStats") -> None:
        self.lifetime_sec += other.lifetime_sec
        self.candidate_indels += other.candidate_indels
        self.noncandidate_indels += other.noncandidate_indels
        self.segments_completed += other.segments_completed
        self.reads_processed += other.reads_processed
        for k, v in other.extra.items():
            self.extra[k] = self.extra.get(k, 0) + v

    def to_dict(self):
        return {
            "lifetime_sec": self.lifetime_sec,
            "candidate_indels": self.candidate_indels,
            "noncandidate_indels": self.noncandidate_indels,
            "segments_completed": self.segments_completed,
            "reads_processed": self.reads_processed,
            **self.extra,
        }

    def to_xml(self) -> str:
        """runStats.xml-style report (the reference serializes
        RunStatsData via a boost XML archive into statsDir/runStats.xml,
        strelkaSharedWorkflow.py:250; same field names, simplified
        envelope)."""
        from xml.sax.saxutils import escape
        rows = "".join(
            f"    <{escape(str(k))}>{escape(str(v))}</{escape(str(k))}>\n"
            for k, v in self.to_dict().items())
        return ("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n"
                "<runStats>\n  <runStatsData>\n"
                f"{rows}"
                "  </runStatsData>\n</runStats>\n")


class TaskStateFile:
    """Checkpointed task completion state (pyflow task-state analog)."""

    def __init__(self, path: str):
        self.path = path
        self._done: dict[str, dict] = {}
        if os.path.exists(path):
            with open(path) as f:
                for line in f:
                    if line.strip():
                        rec = json.loads(line)
                        self._done[rec["task"]] = rec

    def is_complete(self, label: str) -> bool:
        return label in self._done

    def record(self, label: str, info: dict | None = None) -> None:
        rec = {"task": label, "time": time.time(), **(info or {})}
        self._done[label] = rec
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    @property
    def completed(self):
        return dict(self._done)


class SegmentRunner:
    """Run a per-segment function over grouped genome segments with
    retry + resume + stats; multi-host segment assignment by process
    index."""

    def __init__(self, workspace_dir: str, max_retries: int = 2,
                 retry_wait_sec: float = 1.0,
                 process_index: int = 0, process_count: int = 1):
        os.makedirs(workspace_dir, exist_ok=True)
        self.workspace = workspace_dir
        self.state = TaskStateFile(os.path.join(
            workspace_dir, f"taskstate.p{process_index}.jsonl"))
        self.max_retries = max_retries
        self.retry_wait = retry_wait_sec
        self.process_index = process_index
        self.process_count = process_count
        self.stats = RunStats()
        # per-worker leveled log (pyflow_log.txt analog, one per worker)
        from ..utils.flowlog import open_flow_log
        self.log = open_flow_log(workspace_dir, process_index)

    def assigned(self, groups: list) -> list[tuple[int, list]]:
        return [(i, g) for i, g in enumerate(groups)
                if i % self.process_count == self.process_index]

    def dry_run(self, groups: list, out=None) -> int:
        """pyflow --dryRun analog: list this host's task schedule
        (label, segment spans, resume state) without executing.
        Returns the number of tasks that WOULD run."""
        import sys
        out = out or sys.stderr
        n_pending = 0
        for gi, group in self.assigned(groups):
            label = f"seg_{gi}"
            done = self.state.is_complete(label)
            spans = ",".join(f"{s.chrom}:{s.begin}-{s.end}" for s in group)
            print(f"[dryrun] task {label} [{spans}] "
                  f"{'COMPLETE (resume skips)' if done else 'PENDING'}",
                  file=out)
            n_pending += 0 if done else 1
        print(f"[dryrun] {n_pending} pending task(s) on process "
              f"{self.process_index}/{self.process_count}", file=out)
        return n_pending

    def run(self, groups: list, task_fn, on_complete=None) -> RunStats:
        """task_fn(group) -> (result, RunStats|None); results passed to
        on_complete(group_index, result) in order for this host."""
        t0 = time.time()
        for gi, group in self.assigned(groups):
            label = f"seg_{gi}"
            if self.state.is_complete(label):
                self.log.info("task %s already complete (resume skips)",
                              label)
                continue
            attempt = 0
            task_t0 = time.time()
            spans = ",".join(f"{s.chrom}:{s.begin}-{s.end}" for s in group)
            self.log.info("task %s begin [%s]", label, spans)
            while True:
                try:
                    result, seg_stats = task_fn(group)
                    break
                except Exception as e:  # noqa: BLE001 — retry any task error
                    attempt += 1
                    if attempt > self.max_retries:
                        self.log.error(
                            "task %s failed after %d attempts: %s",
                            label, attempt, e)
                        raise RuntimeError(
                            f"task {label} failed after {attempt} attempts: {e}"
                        ) from e
                    self.log.warning("task %s attempt %d failed (%s); "
                                     "retrying in %.1fs", label, attempt, e,
                                     self.retry_wait * attempt)
                    time.sleep(self.retry_wait * attempt)
            task_dt = time.time() - task_t0
            self.log.info("task %s complete in %.2fs (attempts=%d)",
                          label, task_dt, attempt + 1)
            if seg_stats is not None:
                self.stats.merge(seg_stats)
            self.stats.segments_completed += 1
            if on_complete is not None:
                on_complete(gi, result)
            # per-task wall time in the state file (SegmentTimeTracker
            # analog; pyflow writes per-task timing logs)
            self.state.record(label, {"wall_sec": round(task_dt, 3),
                                      "attempts": attempt + 1})
        self.stats.lifetime_sec += time.time() - t0
        self.write_stats()
        return self.stats

    def write_stats(self):
        with open(os.path.join(self.workspace,
                               f"runStats.p{self.process_index}.json"), "w") as f:
            json.dump(self.stats.to_dict(), f, indent=1)


def merge_run_stats(workspace_dir: str) -> RunStats:
    """MergeRunStats analog over all host shards."""
    total = RunStats()
    for name in sorted(os.listdir(workspace_dir)):
        if name.startswith("runStats.p") and name.endswith(".json"):
            with open(os.path.join(workspace_dir, name)) as f:
                d = json.load(f)
            rs = RunStats(
                lifetime_sec=d.pop("lifetime_sec", 0.0),
                candidate_indels=d.pop("candidate_indels", 0),
                noncandidate_indels=d.pop("noncandidate_indels", 0),
                segments_completed=d.pop("segments_completed", 0),
                reads_processed=d.pop("reads_processed", 0),
                extra=d,
            )
            total.merge(rs)
    return total


def init_distributed() -> tuple[int, int]:
    """Initialize jax.distributed when environment indicates a
    multi-process run; returns (process_index, process_count)."""
    import jax
    coord = os.environ.get("STRELKA_TPU_COORDINATOR")
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["STRELKA_TPU_NUM_PROCESSES"]),
            process_id=int(os.environ["STRELKA_TPU_PROCESS_ID"]),
        )
    try:
        return jax.process_index(), jax.process_count()
    except Exception:  # noqa: BLE001
        return 0, 1


def run_local_jobs(module: str, argv: list[str], jobs,
                   cluster_submit: str | None = None,
                   call_mem_mb: int | None = None,
                   cluster_status: str | None = None,
                   retry_max: int = 1, retry_wait: float = 5.0,
                   retry_window: float = 360.0) -> int:
    """pyflow local/sge-mode analog: spawn `jobs` worker processes of
    the same workflow CLI (each taking every jobs-th segment group via
    --process-index/--process-count), retry failures once, then run the
    ordered merge (reference: pyflow.py RunMode local/sge + per-task
    retry pyflow.py:939-967; merge strelkaSharedWorkflow.py:102-148).

    cluster_submit: optional submit command wrapping each worker (the
    sge qsub driver analog, pyflow.py:1424-1435) — either a prefix
    ("qsub -sync y -b y") or a template containing "{cmd}".

    Without cluster_status the submit command must BLOCK until the job
    exits and propagate its exit status. WITH cluster_status the submit
    is NON-BLOCKING (prints a job id, last token of its first stdout
    line, like qsub) and workers are monitored by polling
    `cluster_status <job_id>` (the qstat analog,
    pyflow.py:1480-1570): while it exits 0 printing 'running' or
    'queued' the job is alive; any other exit/output means the job has
    left the scheduler, and the worker's own exit code is read from a
    per-task rc file its wrapper writes. A scheduler-lost worker (no
    rc file) or a failed worker is re-queued up to retry_max times,
    sleeping retry_wait between tries, while within retry_window
    seconds of its first submission (RetryParam semantics,
    pyflow.py:1195-1213); taskstate resume makes re-queued workers
    skip finished segments.
    """
    import shlex
    import subprocess
    import sys

    from .hardware import LOCAL_JOB_MEM_MB, suggest_jobs

    mem_per_job = call_mem_mb or LOCAL_JOB_MEM_MB
    n = (suggest_jobs(mem_per_job) if str(jobs) in ("auto", "0")
         else int(jobs))
    if n <= 1:
        return -1  # caller falls through to the single-process path

    child_argv: list[str] = []
    skip = False
    for a in argv:
        if skip:
            skip = False
            continue
        if a in ("--jobs", "--cluster-submit", "--cluster-status",
                 "--retry-max", "--retry-wait", "--retry-window"):
            skip = True
            continue
        if a.startswith(("--jobs=", "--cluster-submit=",
                         "--cluster-status=", "--retry-max=",
                         "--retry-wait=", "--retry-window=")):
            continue
        child_argv.append(a)

    env = dict(os.environ)
    if "STRELKA_TPU_COMPILE_CACHE" not in env:
        # share one persistent XLA compile cache across workers: the
        # fixed tile shapes make every worker's jit set identical, so
        # later workers (and the retry round) skip compilation
        import tempfile
        env["STRELKA_TPU_COMPILE_CACHE"] = os.path.join(
            tempfile.gettempdir(), "strelka_tpu_jitcache")

    # per-worker stream capture (pyflow per-task stderr logs analog):
    # everything a worker prints lands in workspace/logs/, so one
    # worker's failure is diagnosable from one file
    out_dir = None
    for j, a in enumerate(child_argv):
        if a == "--output-dir" and j + 1 < len(child_argv):
            out_dir = child_argv[j + 1]
        elif a.startswith("--output-dir="):
            out_dir = a.split("=", 1)[1]
    log_dir = None
    if out_dir:
        log_dir = os.path.join(out_dir, "workspace", "logs")
        os.makedirs(log_dir, exist_ok=True)

    def stream_path(i):
        return (os.path.join(log_dir, f"worker.p{i}.stderr.log")
                if log_dir else None)

    def spawn(i):
        cmd = [sys.executable, "-m", module, *child_argv,
               "--process-index", str(i), "--process-count", str(n)]
        if cluster_submit:
            if "{cmd}" in cluster_submit:
                cmd = shlex.split(
                    cluster_submit.replace("{cmd}", shlex.join(cmd)))
            else:
                cmd = shlex.split(cluster_submit) + cmd
        sp = stream_path(i)
        if sp:
            with open(sp, "ab") as lf:
                return subprocess.Popen(cmd, env=env, stdout=lf, stderr=lf)
        return subprocess.Popen(cmd, env=env)

    if cluster_submit and cluster_status:
        rc = _run_cluster_async(
            module, child_argv, n, env, cluster_submit, cluster_status,
            log_dir, stream_path, retry_max, retry_wait, retry_window)
        if rc != 0:
            return rc
    else:
        # STRELKA_TPU_SPAWN_STAGGER=<sec>: offset worker starts. The
        # tunneled TPU backend serializes remote compiles and can
        # refuse simultaneous fresh-client dials under load; staggered
        # spawns let worker 0 warm the shared compile cache first
        stagger = float(os.environ.get("STRELKA_TPU_SPAWN_STAGGER", "0")
                        or 0)
        procs = {}
        for i in range(n):
            if i and stagger > 0:
                time.sleep(stagger)
            procs[i] = spawn(i)
        failed = []
        for i, pr in procs.items():
            if pr.wait() != 0:
                failed.append(i)
        for i in failed:  # one retry round; resume skips done segments
            if spawn(i).wait() != 0:
                print(f"worker {i}/{n} failed twice; aborting merge",
                      file=sys.stderr)
                sp = stream_path(i)
                if sp:
                    from ..utils.flowlog import tail
                    print(f"--- last lines of {sp} ---\n{tail(sp)}",
                          file=sys.stderr)
                return 1
    merge = subprocess.run(
        [sys.executable, "-m", module, *child_argv,
         "--merge-only", "--process-count", str(n)])
    return merge.returncode


def _run_cluster_async(module, child_argv, n, env, cluster_submit,
                       cluster_status, log_dir, stream_path,
                       retry_max, retry_wait, retry_window) -> int:
    """Non-blocking cluster scheduling: submit every worker, poll the
    scheduler with exponential backoff (ExpWaiter analog,
    pyflow.py:1536), and re-queue failed or scheduler-lost workers
    within their retry window. See run_local_jobs docstring."""
    import shlex
    import subprocess
    import sys
    import tempfile
    import time

    rc_dir = log_dir or tempfile.mkdtemp(prefix="strelka_cluster_")

    def rc_path(i):
        return os.path.join(rc_dir, f"worker.p{i}.rc")

    def submit(i):
        worker = [sys.executable, "-m", module, *child_argv,
                  "--process-index", str(i), "--process-count", str(n)]
        sp = stream_path(i)
        redir = f" >> {shlex.quote(sp)} 2>&1" if sp else ""
        # the wrapper records the worker's exit status; a missing rc
        # file after the scheduler forgets the job = lost worker
        shell = (f"{shlex.join(worker)}{redir}; "
                 f"echo $? > {shlex.quote(rc_path(i))}")
        if os.path.exists(rc_path(i)):
            os.unlink(rc_path(i))
        if "{cmd}" in cluster_submit:
            cmd = shlex.split(cluster_submit.replace("{cmd}", shell))
        else:
            cmd = shlex.split(cluster_submit) + [shell]
        res = subprocess.run(cmd, env=env, capture_output=True, text=True)
        if res.returncode != 0 or not res.stdout.strip():
            print(f"cluster submit failed for worker {i}: "
                  f"{res.stderr.strip()[:500]}", file=sys.stderr)
            return None
        return res.stdout.strip().splitlines()[0].split()[-1]

    def status_alive(job_id):
        res = subprocess.run(shlex.split(cluster_status) + [job_id],
                             env=env, capture_output=True, text=True)
        if res.returncode != 0:
            return False
        tok = res.stdout.split()
        return bool(tok) and tok[0] in ("running", "queued", "r", "qw")

    poll0 = float(os.environ.get("STRELKA_TPU_CLUSTER_POLL_S", "1.0"))
    jobs = {}
    for i in range(n):
        jid = submit(i)
        if jid is None:
            return 1
        jobs[i] = {"id": jid, "retries": 0, "t0": time.time(),
                   "poll": poll0, "next": time.time() + poll0}
    done, hard_failed = set(), set()
    while len(done) + len(hard_failed) < n:
        now = time.time()
        for i, j in jobs.items():
            if i in done or i in hard_failed or now < j["next"]:
                continue
            if status_alive(j["id"]):
                j["poll"] = min(j["poll"] * 1.7, 60.0)
                j["next"] = now + j["poll"]
                continue
            # job left the scheduler: read its exit status
            rc = None
            if os.path.exists(rc_path(i)):
                try:
                    rc = int(open(rc_path(i)).read().strip() or "1")
                except ValueError:
                    rc = 1
            if rc == 0:
                done.add(i)
                continue
            kind = "failed" if rc is not None else "lost by scheduler"
            elapsed = now - j["t0"]
            if (j["retries"] < retry_max
                    and (retry_window <= 0 or elapsed < retry_window)):
                j["retries"] += 1
                print(f"worker {i}/{n} {kind}; re-queueing "
                      f"(retry {j['retries']}/{retry_max})",
                      file=sys.stderr)
                time.sleep(retry_wait)
                jid = submit(i)
                if jid is None:
                    hard_failed.add(i)
                    continue
                j["id"] = jid
                j["poll"] = poll0
                j["next"] = time.time() + poll0
            else:
                print(f"worker {i}/{n} {kind}; retries exhausted",
                      file=sys.stderr)
                hard_failed.add(i)
        time.sleep(min(0.05, poll0))
    if hard_failed:
        for i in sorted(hard_failed):
            sp = stream_path(i)
            if sp and os.path.exists(sp):
                from ..utils.flowlog import tail
                print(f"--- last lines of {sp} ---\n{tail(sp)}",
                      file=sys.stderr)
        return 1
    return 0
