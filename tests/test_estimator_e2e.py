"""End-to-end estimator test on the exact synthetic scene — the TPU-native
analog of replaying the reference's data_generator against vins_estimator
(SURVEY.md §4.3).  Covers: window fill → initialization (SfM + alignment) →
steady-state VIO with marginalization, keyframe logic, and sliding."""
import jax.numpy as jnp
import numpy as np
import pytest

from vins_tpu.config import VinsConfig
from vins_tpu.estimator.estimator import NON_LINEAR, Estimator
from vins_tpu.sim.driver import SimRun, SyntheticDriver, ate_rmse


from vins_tpu.sim.synthetic import Trajectory
from vins_tpu.sim.window import R_IC_FORWARD

SIM_TIC = (0.06, -0.01, 0.02)


def make_cfg(**kw):
    return VinsConfig(
        max_landmarks=160, g_norm=9.81,
        extrinsic_R=R_IC_FORWARD, extrinsic_t=SIM_TIC, **kw,
    )


@pytest.fixture(scope="module")
def run_result():
    est = Estimator(make_cfg(), imu_buf_len=64)
    driver = SyntheticDriver(imu_hz=200.0, frame_hz=10.0, g_norm=9.81)
    run = driver.run(est, n_frames=40)
    return est, run


def test_initializes(run_result):
    est, run = run_result
    kinds = [e["kind"] for e in run.events]
    assert "initialized" in kinds, kinds
    assert est.solver_flag == NON_LINEAR
    # no reboot after init
    i0 = kinds.index("initialized")
    assert all(k == "vio" for k in kinds[i0 + 1 :]), kinds[i0:]


def test_trajectory_accuracy(run_result):
    est, run = run_result
    err = ate_rmse(run)
    # zero-noise synthetic data: the whole pipeline (init scale + VIO) should
    # track to centimeters over the 4 m figure-8
    assert err < 0.05, err


def test_bias_estimates_converge(run_result):
    est, run = run_result
    # true biases injected by the driver
    assert np.allclose(est.bg[est.W], [0.002, 0.003, -0.001], atol=5e-4), est.bg[est.W]
    # accel bias is only weakly observable on this gentle 4 s trajectory
    assert np.allclose(est.ba[est.W], [0.02, -0.01, 0.015], atol=5e-2), est.ba[est.W]


def test_velocity_tracks(run_result):
    est, run = run_result
    # final-frame velocity vs ground truth (same yaw-aligned frame ⇒ compare
    # norms to stay gauge-independent)
    from vins_tpu.sim.synthetic import Trajectory

    t_last = run.t[-1]
    v_gt = np.asarray(SyntheticDriver().traj.vel(jnp.asarray(t_last, jnp.float64)))
    assert abs(np.linalg.norm(est.v[est.W]) - np.linalg.norm(v_gt)) < 0.05


def test_failure_recovery():
    """Feature dropout must trip failureDetection → clearState → re-init
    (estimator.cpp:621-667, 193-201)."""
    est = Estimator(make_cfg(), imu_buf_len=64)
    driver = SyntheticDriver()
    driver.run(est, n_frames=20)
    assert est.solver_flag == NON_LINEAR

    # starve the estimator of features for a few frames: process images with
    # no observations at all
    t = driver.frame_hz and (1.0 + 20 / driver.frame_hz)
    for k in range(3):
        for s in range(20):
            est.process_imu(1.0 / 200.0, np.array([0, 0, 9.81]), np.zeros(3))
        est.process_image(np.array([], np.int64), np.zeros((0, 2)),
                          np.zeros((0, 2)), np.zeros((0, 2)), t + 0.1 * k)
    assert est.solver_flag == 0  # rebooted to INITIAL


def test_imu_overflow_guard_forces_keyframe():
    """MARGIN_SECOND_NEW interval merging must never silently truncate the
    static IMU buffer (the reference's vectors are unbounded,
    integration_base.h:205-207): when the merge would overflow, the frame is
    forced to be a keyframe instead."""
    est = Estimator(make_cfg(), imu_buf_len=16)
    est.frame_count = est.W
    est.imu_n[est.W - 2] = 10
    est.imu_n[est.W - 1] = 9
    assert est._overflow_guard()          # 10 + 9 > 16 -> force MARGIN_OLD
    est.imu_n[est.W - 1] = 5
    assert not est._overflow_guard()      # fits: parallax rules decide
    est.frame_count = 3                    # window still filling: no merge
    est.imu_n[est.W - 1] = 99
    assert not est._overflow_guard()


def test_imu_overflow_counted_and_warned():
    est = Estimator(make_cfg(), imu_buf_len=4)
    est.frame_count = 1
    with pytest.warns(RuntimeWarning):
        for _ in range(8):
            est.process_imu(0.005, np.array([0.0, 0, 9.81]), np.zeros(3))
    assert est.imu_overflow > 0
    assert est.imu_n[0] == 4  # buffer holds exactly N, newest dropped loudly


def test_hover_low_parallax_stays_accurate():
    """A hover segment (near-zero parallax -> MARGIN_SECOND_NEW dominates)
    with a small IMU buffer: the overflow guard must keep preintegration
    exact (no truncated samples) and the estimate accurate."""
    est = Estimator(make_cfg(), imu_buf_len=32)
    # 20 samples/frame at 200 Hz IMU, 10 Hz frames: two merges overflow 32
    slow = Trajectory.figure8(scale=0.02, period=40.0)  # ~static scene
    driver = SyntheticDriver(imu_hz=200.0, frame_hz=10.0, g_norm=9.81,
                             traj=slow)
    run = driver.run(est, n_frames=36)
    assert est.imu_overflow == 0
    # every stored interval fits the buffer
    assert est.imu_n.max() <= 32
