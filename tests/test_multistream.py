"""Batched multi-stream pipeline (parallel/multistream.py): S streams in
lock-step through ONE vmapped front-end program + ONE vmapped VIO program,
with per-stream host bookkeeping.  Each stream must initialize and track
its own (distinct) trajectory."""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))


def test_multistream_two_streams_track():
    from run_multistream import drive, generate_streams

    from vins_tpu.sim.proxy import ate_rmse_tum

    S = 2
    mp, frames, gt = generate_streams(S, duration=4.5, frame_hz=10.0,
                                      loop_closure=False, pg_async=False,
                                      pix_noise=0.0)
    drive(mp, frames, frame_hz=10.0, publish_hz=10.0)
    mp.finish()
    for s in range(S):
        est = mp.pipes[s].estimator
        assert est.solver_flag == 1, f"stream {s} never initialized"
        assert est.failures == 0
        ts, ps, qs = gt[s]
        ate = ate_rmse_tum(mp.pipes[s].trajectory, np.asarray(ts),
                           np.stack(ps))
        assert np.isfinite(ate) and ate < 0.5, (s, ate)
    # streams genuinely differ (distinct rooms + circuit geometry)
    pa = np.stack([e[1] for e in mp.pipes[0].trajectory])
    pb = np.stack([e[1] for e in mp.pipes[1].trajectory])
    n = min(len(pa), len(pb))
    assert np.abs(pa[:n] - pb[:n]).max() > 0.1
