"""Runner tests: segmentation, retry, checkpoint/resume, stats merge
(pyflow-equivalent semantics, SURVEY.md §5 failure detection items)."""
import numpy as np
import pytest

from strelka_tpu.parallel import runner as rn


def test_genome_segmentation():
    segs = rn.make_genome_segments({"chr1": 30_000_000, "chrM": 16_000},
                                   scan_size=12_000_000)
    chr1 = [s for s in segs if s.chrom == "chr1"]
    assert len(chr1) == 3
    assert chr1[0].begin == 0 and chr1[-1].end == 30_000_000
    sizes = [s.end - s.begin for s in chr1]
    assert max(sizes) - min(sizes) <= 1
    assert any(s.chrom == "chrM" for s in segs)


def test_grouping():
    segs = [rn.GenomeSegment(f"c{i}", 0, 50_000) for i in range(10)]
    groups = rn.group_segments(segs, min_group=200_000)
    assert sum(len(g) for g in groups) == 10
    assert all(sum(s.end - s.begin for s in g) >= 200_000
               for g in groups[:-1])


def test_retry_and_resume(tmp_path):
    calls = {"n": 0}

    def flaky(group):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("transient failure")
        return f"done-{group[0].label}", rn.RunStats(reads_processed=5)

    groups = [[rn.GenomeSegment("c", 0, 100)], [rn.GenomeSegment("c", 100, 200)]]
    results = {}
    r1 = rn.SegmentRunner(str(tmp_path), max_retries=2, retry_wait_sec=0.01)
    stats = r1.run(groups, flaky, on_complete=lambda gi, r: results.__setitem__(gi, r))
    assert stats.segments_completed == 2
    assert stats.reads_processed == 10
    assert calls["n"] == 3  # one retry

    # resume: new runner skips completed tasks
    calls2 = {"n": 0}

    def count_calls(group):
        calls2["n"] += 1
        return "x", None

    r2 = rn.SegmentRunner(str(tmp_path))
    r2.run(groups, count_calls)
    assert calls2["n"] == 0


def test_multihost_assignment(tmp_path):
    groups = [[rn.GenomeSegment("c", i, i + 1)] for i in range(10)]
    r0 = rn.SegmentRunner(str(tmp_path / "a"), process_index=0, process_count=3)
    r1 = rn.SegmentRunner(str(tmp_path / "b"), process_index=1, process_count=3)
    r2 = rn.SegmentRunner(str(tmp_path / "c"), process_index=2, process_count=3)
    ids = [sorted(i for i, _ in r.assigned(groups)) for r in (r0, r1, r2)]
    assert sorted(sum(ids, [])) == list(range(10))
    assert not (set(ids[0]) & set(ids[1]))


def test_stats_merge(tmp_path):
    r0 = rn.SegmentRunner(str(tmp_path), process_index=0, process_count=2)
    r1 = rn.SegmentRunner(str(tmp_path), process_index=1, process_count=2)
    groups = [[rn.GenomeSegment("c", 0, 1)], [rn.GenomeSegment("c", 1, 2)]]

    def ok(group):
        return None, rn.RunStats(candidate_indels=3)

    r0.run(groups, ok)
    r1.run(groups, ok)
    total = rn.merge_run_stats(str(tmp_path))
    assert total.segments_completed == 2
    assert total.candidate_indels == 6


def test_continuous_model():
    from strelka_tpu.models import continuous as cont
    counts = np.array([[90, 10, 0, 0], [100, 0, 0, 0], [50, 50, 0, 0]])
    fwd = np.array([[45, 5, 0, 0], [50, 0, 0, 0], [25, 25, 0, 0]])
    ref_gt = np.array([0, 0, 0])
    res = cont.call_continuous_sites(counts, fwd, ref_gt)
    alt_c = res[1]
    assert alt_c["variant"][0] and alt_c["variant"][2]
    assert not alt_c["variant"][1]
    assert alt_c["q"][2] == 40  # maxed out
    assert abs(alt_c["vf"][0] - 0.1) < 1e-9
    # strand-biased alt: all alt on fwd strand
    counts2 = np.array([[80, 20, 0, 0]])
    fwd2 = np.array([[40, 20, 0, 0]])
    res2 = cont.call_continuous_sites(counts2, fwd2, np.array([0]))
    balanced_sb = res[1]["sb"][0]
    biased_sb = res2[1]["sb"][0]
    assert biased_sb > balanced_sb


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


def test_dry_run_lists_schedule(tmp_path, capsys):
    """pyflow --dryRun analog: pending/complete state per task, no
    execution."""
    import io

    from strelka_tpu.parallel.runner import GenomeSegment, SegmentRunner

    ws = str(tmp_path / "ws")
    groups = [[GenomeSegment("chr1", 0, 100)],
              [GenomeSegment("chr1", 100, 200)]]
    r = SegmentRunner(ws)
    calls = []
    r.run(groups[:1], lambda g: (len(calls), None),
          on_complete=lambda gi, res: calls.append(gi))
    out = io.StringIO()
    r2 = SegmentRunner(ws)
    pending = r2.dry_run(groups, out=out)
    text = out.getvalue()
    assert pending == 1
    assert "seg_0" in text and "COMPLETE" in text
    assert "seg_1" in text and "PENDING" in text


def test_task_state_records_wall_time(tmp_path):
    """Per-task wall time + attempt count land in the task-state file
    (SegmentTimeTracker / pyflow per-task timing analog)."""
    from strelka_tpu.parallel.runner import GenomeSegment, SegmentRunner

    ws = str(tmp_path / "ws")
    r = SegmentRunner(ws)
    r.run([[GenomeSegment("c", 0, 10)]], lambda g: (None, None))
    rec = r.state.completed["seg_0"]
    assert rec["wall_sec"] >= 0.0
    assert rec["attempts"] == 1
