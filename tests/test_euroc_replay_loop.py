"""EuRoC-format replay WITH loop closure in CI (VERDICT r4 weak #6): the
chain closest to the real acceptance run — PNG decode → native measurement
queue → pipeline with retrieval + PnP verification + 4-DoF PGO — must
verify at least one loop and keep the corrected path healthy.

The rendered sequence uses a 10 s circuit so the start is revisited well
inside a CI-sized run."""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from vins_tpu.config import VinsConfig
from vins_tpu.io.euroc import load_groundtruth
from vins_tpu.sim.euroc_writer import write_euroc_dataset
from vins_tpu.sim.proxy import (EUROC_H, EUROC_W, TIC, ate_rmse_tum,
                                euroc_camera)
from vins_tpu.sim.window import R_IC_FORWARD


@pytest.fixture(scope="module")
def euroc_loop_run(tmp_path_factory):
    from run_euroc import replay

    root = str(tmp_path_factory.mktemp("euroc_synth_loop"))
    # 20 Hz frames keep per-frame flow tractable on the fast 10 s circuit;
    # the pipeline's FREQ controller still publishes at 10 Hz
    info = write_euroc_dataset(root, duration=16.0, period=10.0, seed=0,
                               frame_hz=20.0)
    cfg = VinsConfig(
        image_width=EUROC_W, image_height=EUROC_H,
        focal=460.0, max_cnt=150, min_dist=30, freq=10,
        max_landmarks=256, g_norm=9.81,
        extrinsic_R=R_IC_FORWARD, extrinsic_t=tuple(TIC),
        acc_n=0.08, gyr_n=0.004,
        loop_closure=True, pg_skip_first_cnt=5,
        min_loop_num=20,
    )
    pipe = replay(root, cfg, euroc_camera(), loop=True, progress_every=0)
    gt = load_groundtruth(root)
    return info, pipe, gt


def test_replay_verifies_loops(euroc_loop_run):
    info, pipe, gt = euroc_loop_run
    assert pipe.estimator.failures == 0
    loops = [e for e in pipe.pg_events if e.get("loop") is not None]
    assert len(loops) >= 1, [e.get("verify") for e in pipe.pg_events][-20:]
    assert pipe.pose_graph.n_optimizes >= 1


def test_replay_corrected_path_healthy(euroc_loop_run):
    info, pipe, gt = euroc_loop_run
    ate_vio = ate_rmse_tum(pipe.trajectory, gt.t, gt.p)
    ate_corr = ate_rmse_tum(pipe.trajectory_loop, gt.t, gt.p)
    assert np.isfinite(ate_vio) and ate_vio < 0.8, ate_vio
    # a short healthy run accumulates little drift, so the corrected path
    # cannot be required to improve much — it must not be WORSE than VIO
    # beyond noise (the long-run artifact demonstrates the 5x cut)
    assert ate_corr <= ate_vio * 1.15 + 0.02, (ate_vio, ate_corr)
