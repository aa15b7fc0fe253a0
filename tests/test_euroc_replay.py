"""EuRoC replay chain end-to-end (VERDICT r3 missing #3): exercise the
never-before-run chain  PNG on disk → native decoder → native measurement
queue → pipeline → ATE  without the dataset, by writing a synthetic
sequence in EuRoC directory format (sim/euroc_writer.py) and replaying it
with tools/run_euroc.replay — the same code path `python tools/run_euroc.py
<root>` uses on the real MH_01 (README.md:66-89)."""
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
def euroc_run(tmp_path_factory):
    from run_euroc import replay

    root = str(tmp_path_factory.mktemp("euroc_synth"))
    info = write_euroc_dataset(root, duration=3.0, period=16.0, seed=0)
    cfg = VinsConfig(
        image_width=EUROC_W, image_height=EUROC_H,
        focal=460.0, max_cnt=150, min_dist=30, freq=10,
        max_landmarks=256, g_norm=9.81,
        extrinsic_R=R_IC_FORWARD, extrinsic_t=tuple(TIC),
        acc_n=0.08, gyr_n=0.004,
        loop_closure=False,
    )
    pipe = replay(root, cfg, euroc_camera(), loop=False, progress_every=0)
    gt = load_groundtruth(root)
    return info, pipe, gt


def test_replay_consumes_all_frames(euroc_run):
    info, pipe, gt = euroc_run
    # native mq aligns every frame that has a complete IMU interval; the
    # last frame can be dropped at the stream edge
    assert len(pipe.trajectory) >= info["n_frames"] - 12  # minus window fill


def test_replay_initializes_and_tracks(euroc_run):
    info, pipe, gt = euroc_run
    assert pipe.estimator.failures == 0
    assert len(pipe.trajectory) > 5
    ate = ate_rmse_tum(pipe.trajectory, gt.t, gt.p)
    assert np.isfinite(ate)
    assert ate < 0.35, ate  # same healthy bound as the device-image proxy
