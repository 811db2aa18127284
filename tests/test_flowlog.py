"""Per-worker leveled logging (pyflow log analog): SegmentRunner task
lifecycle lines, retry warnings, merged workflow.log with
warning/error surfacing, and failure tails."""
import logging
import os

from strelka_tpu.parallel import runner as rn
from strelka_tpu.utils import flowlog


def _groups():
    segs = rn.make_genome_segments({"c1": 400_000}, scan_size=100_000)
    return rn.group_segments(segs, min_group=100_000)


def test_runner_logs_task_lifecycle(tmp_path):
    ws = str(tmp_path / "ws")
    r = rn.SegmentRunner(ws, process_index=0, process_count=1)
    r.run(_groups(), lambda g: (None, None))
    log = open(flowlog.worker_log_path(ws, 0)).read()
    assert "[INFO] task seg_0 begin" in log
    assert "task seg_0 complete" in log
    assert "[c1:0-100000]" in log


def test_retry_logged_as_warning_and_surfaced(tmp_path, capsys):
    ws = str(tmp_path / "ws")
    r = rn.SegmentRunner(ws, process_index=0, process_count=1,
                         retry_wait_sec=0.0)
    calls = {"n": 0}

    def flaky(group):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("transient io error")
        return None, None

    r.run(_groups()[:1], flaky)
    log = open(flowlog.worker_log_path(ws, 0)).read()
    assert "[WARNING] task seg_0 attempt 1 failed" in log
    assert "transient io error" in log

    out = str(tmp_path / "workflow.log")
    surfaced = flowlog.merge_worker_logs(ws, out)
    assert any("transient io error" in w for w in surfaced["warnings"])
    assert not surfaced["errors"]
    assert "task seg_0 complete" in open(out).read()


def test_final_failure_logged_as_error(tmp_path):
    ws = str(tmp_path / "ws")
    r = rn.SegmentRunner(ws, process_index=0, process_count=1,
                         max_retries=0, retry_wait_sec=0.0)

    def broken(group):
        raise ValueError("corrupt input")

    try:
        r.run(_groups()[:1], broken)
        raise AssertionError("expected failure")
    except RuntimeError:
        pass
    surfaced = flowlog.merge_worker_logs(ws, str(tmp_path / "wf.log"))
    assert any("corrupt input" in e for e in surfaced["errors"])


def test_multi_worker_logs_merge_in_order(tmp_path):
    ws = str(tmp_path / "ws")
    for i in (1, 0):
        lg = flowlog.open_flow_log(ws, i)
        lg.info("hello from worker %d", i)
        for h in lg.handlers:
            h.close()
    out = str(tmp_path / "workflow.log")
    flowlog.merge_worker_logs(ws, out)
    text = open(out).read()
    assert text.index("worker.p0.log") < text.index("worker.p1.log")
    assert "hello from worker 0" in text and "hello from worker 1" in text


def test_tail_returns_last_lines(tmp_path):
    p = tmp_path / "big.log"
    p.write_text("\n".join(f"line{i}" for i in range(10_000)) + "\n")
    t = flowlog.tail(str(p), n_lines=5)
    assert t.splitlines() == [f"line{i}" for i in range(9995, 10_000)]


def test_mirror_level_respects_stderr(tmp_path, capsys):
    ws = str(tmp_path / "ws")
    lg = flowlog.open_flow_log(ws, 0, mirror_level=logging.WARNING)
    lg.info("quiet info")
    lg.warning("loud warning")
    err = capsys.readouterr().err
    assert "quiet info" not in err
    assert "loud warning" in err
