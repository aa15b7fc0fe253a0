"""Full-stack integration: rendered images → KLT tracker → estimator.

The deepest end-to-end path (the reference's rosbag replay, README.md:66-89)
without a dataset on disk: render the synthetic scene's landmarks as Gaussian
blobs through the ground-truth camera trajectory, then run the complete
Pipeline (CLAHE → pyramidal LK → Shi-Tomasi top-up → F-RANSAC → estimator
init → sliding-window VIO) on the pixel stream and score ATE against the
closed-form ground truth."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vins_tpu.config import VinsConfig
from vins_tpu.core import lie
from vins_tpu.core.cameras import PinholeCamera
from vins_tpu.estimator.estimator import NON_LINEAR
from vins_tpu.pipeline import Pipeline
from vins_tpu.sim.driver import SimRun, ate_rmse
from vins_tpu.sim.synthetic import Trajectory, make_landmarks
from vins_tpu.sim.window import R_IC_FORWARD

H, W = 480, 640
FX = FY = 460.0
CX, CY = 320.0, 240.0
TIC = np.array([0.06, -0.01, 0.02])
BA = np.array([0.02, -0.01, 0.015])
BG = np.array([0.002, 0.003, -0.001])


def _render(p_b, q_b, pts_w, amp):
    """Project landmarks and splat Gaussian blobs (σ=1.8 px) on gray."""
    R_b = np.asarray(lie.q2R(jnp.asarray(q_b)))
    R_ic = np.asarray(R_IC_FORWARD)
    p_cam = p_b + R_b @ TIC
    R_wc = R_b @ R_ic
    Pc = (pts_w - p_cam) @ R_wc
    img = np.full((H, W), 90.0, np.float32)
    vis = Pc[:, 2] > 0.3
    u = FX * Pc[vis, 0] / Pc[vis, 2] + CX
    v = FY * Pc[vis, 1] / Pc[vis, 2] + CY
    a = amp[vis]
    r = 6
    for k in range(len(u)):
        if not (r < u[k] < W - r - 1 and r < v[k] < H - r - 1):
            continue
        x0, y0 = int(u[k]) - r, int(v[k]) - r
        xs = np.arange(x0, x0 + 2 * r + 1)
        ys = np.arange(y0, y0 + 2 * r + 1)
        g = np.exp(-((xs - u[k]) ** 2)[None, :] / (2 * 1.8 ** 2)
                   - ((ys - v[k]) ** 2)[:, None] / (2 * 1.8 ** 2))
        img[y0:y0 + 2 * r + 1, x0:x0 + 2 * r + 1] += a[k] * g
    return np.clip(img, 0, 255)


@pytest.fixture(scope="module")
def run_images():
    traj = Trajectory.figure8()
    gravity = jnp.asarray([0.0, 0.0, 9.81])
    pts_w = np.asarray(make_landmarks(
        jax.random.PRNGKey(3), 900, center=(0.0, 0.0, 0.8),
        spread=(14.0, 14.0, 6.0), dtype=jnp.float64))
    amp = np.random.default_rng(0).uniform(60.0, 150.0, len(pts_w))

    cam = PinholeCamera.create(FX, FY, CX, CY)
    cfg = VinsConfig(max_landmarks=160, g_norm=9.81,
                     image_width=W, image_height=H,
                     extrinsic_R=R_IC_FORWARD, extrinsic_t=tuple(TIC),
                     loop_closure=False)
    pipe = Pipeline(cfg, cam, imu_buf_len=64)

    imu_at = jax.jit(lambda t: traj.imu_at(t, gravity))
    frame_hz, imu_hz = 10.0, 200.0
    n_sub = int(imu_hz / frame_hz)
    dt_i = 1.0 / imu_hz

    ts, p_gt, q_gt, p_est, q_est, events = [], [], [], [], [], []
    t0 = 1.0
    n_frames = 32
    for fi in range(n_frames):
        t = t0 + fi / frame_hz
        if fi > 0:
            for s in range(1, n_sub + 1):
                ti = t - 1.0 / frame_hz + s * dt_i
                a, w_ = imu_at(jnp.asarray(ti, jnp.float64))
                pipe.process_imu(ti, np.asarray(a) + BA, np.asarray(w_) + BG)
        p_b = np.asarray(traj.pos_fn(jnp.asarray(t, jnp.float64)))
        q_b = np.asarray(traj.q(jnp.asarray(t, jnp.float64)))
        img = _render(p_b, q_b, pts_w, amp)
        ev = pipe.process_image(img, t)
        events.append(ev)
        ts.append(t)
        p_gt.append(p_b)
        q_gt.append(q_b)
        est = pipe.estimator
        if est.solver_flag == NON_LINEAR:
            p_est.append(est.p[est.W].copy())
            q_est.append(est.q[est.W].copy())
        else:
            p_est.append(np.full(3, np.nan))
            q_est.append(np.full(4, np.nan))

    run = SimRun(t=np.asarray(ts), p_gt=np.stack(p_gt), q_gt=np.stack(q_gt),
                 p_est=np.stack(p_est), q_est=np.stack(q_est), events=events)
    return pipe, run


def test_initializes_from_pixels(run_images):
    pipe, run = run_images
    kinds = [e.get("kind") for e in run.events]
    assert "initialized" in kinds, kinds
    assert pipe.estimator.solver_flag == NON_LINEAR


def test_tracks_through_pixels(run_images):
    pipe, run = run_images
    err = ate_rmse(run)
    # pixel-level pipeline: blob centroids + LK quantization put the noise
    # floor well above the exact-feature test (0.05 m there)
    assert err < 0.30, err


def test_trajectory_written(run_images, tmp_path):
    pipe, run = run_images
    out = tmp_path / "vio.tum"
    pipe.write_trajectories(str(out))
    rows = np.loadtxt(out)
    assert rows.shape[1] == 8 and len(rows) > 10
