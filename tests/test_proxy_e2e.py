"""Real-data-proxy end-to-end: rendered textured-room images through the
EuRoC-distorted camera + noisy biased IMU → full pipeline (the stand-in for
the reference's EuRoC rosbag replay, README.md:66-89).  The long scored runs
live in tools/run_proxy.py / RESULTS.md; this is the fast regression: real
pixels, real noise, init + steady VIO, no reboots, bounded drift."""
import numpy as np
import pytest

from vins_tpu.sim.proxy import ate_rmse_tum, make_pipeline, run_proxy


@pytest.fixture(scope="module")
def proxy_run():
    pipe = make_pipeline(loop_closure=False)
    run = run_proxy(duration=3.0, period=16.0, pipe=pipe, seed=0)
    return pipe, run


def test_initializes_on_rendered_images(proxy_run):
    pipe, run = proxy_run
    kinds = [e.get("kind") for e in run.events]
    assert "initialized" in kinds, kinds
    i0 = kinds.index("initialized")
    assert all(k == "vio" for k in kinds[i0 + 1:]), kinds[i0:]
    assert pipe.estimator.failures == 0


def test_tracker_keeps_features(proxy_run):
    pipe, run = proxy_run
    assert pipe.tracker.valid.sum() > 80  # of max_cnt=150


def test_bounded_drift_under_noise(proxy_run):
    pipe, run = proxy_run
    ate = ate_rmse_tum(pipe.trajectory, run.t, run.p_gt)
    assert np.isfinite(ate)
    assert ate < 0.35, ate  # ~4.7 m path segment, noisy IMU, real KLT
