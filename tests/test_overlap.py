"""Overlapped (software-pipelined) frame path ≡ the serial path.

Pipeline(overlap=True) runs the estimator one published frame behind the
front-end (pipeline.py `_process_image_overlapped`) — the estimator must
see byte-identical inputs in identical order, so the produced trajectory
must match the serial mode exactly (f64 CPU: to machine precision)."""
import jax.numpy as jnp
import numpy as np

from vins_tpu.sim.proxy import make_pipeline, run_proxy


def test_overlap_trajectory_matches_serial():
    run_a = run_proxy(duration=3.0, period=16.0, seed=0,
                      pipe=make_pipeline(loop_closure=False,
                                         dtype=jnp.float64))
    pipe_b = make_pipeline(loop_closure=False, dtype=jnp.float64,
                           overlap=True)
    run_b = run_proxy(duration=3.0, period=16.0, seed=0, pipe=pipe_b)
    pipe_b.flush_frames()

    ta = run_a.pipe.trajectory
    tb = pipe_b.trajectory
    # overlap holds back the final pending frame until flush; by now both
    # must have identical histories
    assert len(tb) >= len(ta) - 1
    n = min(len(ta), len(tb))
    assert n > 5
    for (t1, p1, q1), (t2, p2, q2) in zip(ta[:n], tb[:n]):
        assert t1 == t2
        np.testing.assert_allclose(p1, p2, atol=1e-9)
        np.testing.assert_allclose(q1, q2, atol=1e-9)


def test_overlap_restart_recovers():
    """A stream gap mid-run must restart cleanly in overlap mode (pending
    frame dropped, IMU backlog cleared, new sequence)."""
    pipe = make_pipeline(loop_closure=False, dtype=jnp.float64, overlap=True)
    run_proxy(duration=2.0, period=16.0, seed=0, pipe=pipe)
    seq0 = pipe.sequence
    # simulate a >1 s gap: next frame far in the future triggers _restart
    img = np.zeros((pipe.cfg.image_height, pipe.cfg.image_width), np.float32)
    t_gap = pipe._last_image_time + 5.0
    pipe.process_image(img, t_gap)
    assert pipe.sequence == seq0 + 1
    assert pipe._pending is None or pipe._pending[0] == t_gap
