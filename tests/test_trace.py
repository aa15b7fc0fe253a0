"""Tracing utilities (reference tic_toc.h + printStatistics running stats)."""
import json
import time

from vins_tpu.utils.trace import StageStats, TicToc, Tracer


def test_tictoc():
    tt = TicToc()
    time.sleep(0.01)
    ms = tt.toc()
    assert 5.0 < ms < 500.0
    tt.tic()
    assert tt.toc() < ms


def test_stage_stats():
    s = StageStats()
    s.add("solve", 10.0)
    s.add("solve", 20.0)
    s.add("frontend", 5.0)
    assert s.mean("solve") == 15.0
    snap = s.snapshot()
    assert snap["solve"]["n"] == 2 and snap["solve"]["max_ms"] == 20.0
    assert "frontend" in s.report()


def test_tracer_span_and_emit():
    tr = Tracer()
    with tr.span("a"):
        time.sleep(0.005)
    with tr.span("a"):
        pass
    rec = json.loads(tr.emit(frame=7))
    assert rec["frame"] == 7
    assert rec["stats"]["a"]["n"] == 2
    # disabled tracer is a no-op
    tr2 = Tracer(enabled=False)
    with tr2.span("x"):
        pass
    assert tr2.stats.snapshot() == {}
