"""Real-data-proxy end-to-end run: rendered textured-room images + noisy
biased IMU through the FULL pipeline (front-end → estimator → pose graph).

This is the repo's substitute for the reference's EuRoC rosbag replay
(README.md:66-89) while no dataset is on disk: real pixels through the real
KLT/BRIEF stacks, the EuRoC-calibrated distorted camera, IMU at 200 Hz with
white noise + bias random walk, and a genuine revisit (Trajectory.circuit
closes on itself) to exercise loop closure.  ATE is scored against the
closed-form ground truth exactly like tools/evaluate_ate.py scores a real
run.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.precision import highest_matmul_precision
from ..config import VinsConfig
from ..core import lie
from ..core.cameras import PinholeCamera
from ..pipeline import Pipeline
from .render import Room, RoomRenderer
from .synthetic import Trajectory
from .window import R_IC_FORWARD

# EuRoC cam0 calibration (config/euroc.yaml ← camera_model sensor.yaml)
EUROC_W, EUROC_H = 752, 480
EUROC_INTRINSICS = dict(fx=461.6, fy=460.3, cx=363.0, cy=248.1,
                        k1=-2.917e-01, k2=8.228e-02, p1=5.333e-05,
                        p2=-1.578e-04)

TIC = np.array([0.05, -0.02, 0.03])
BA = np.array([0.02, -0.01, 0.015])
BG = np.array([0.002, 0.003, -0.001])


class ProxyRun(NamedTuple):
    t: np.ndarray        # [T] published frame times
    p_gt: np.ndarray     # [T,3]
    q_gt: np.ndarray     # [T,4] wxyz
    pipe: Pipeline
    events: list
    n_loops: int


def euroc_camera(dtype=jnp.float32) -> PinholeCamera:
    return PinholeCamera.create(**EUROC_INTRINSICS, dtype=dtype)


def make_pipeline(noise_inflated: bool = True, loop_closure: bool = True,
                  pg_skip_first_cnt: int = 10, dtype=jnp.float64,
                  pg_async: bool = False, **cfg_kw) -> Pipeline:
    cam = euroc_camera()
    cfg = VinsConfig(
        image_width=EUROC_W, image_height=EUROC_H,
        focal=460.0, max_cnt=150, min_dist=30, freq=10,
        max_landmarks=256, g_norm=9.81,
        extrinsic_R=R_IC_FORWARD, extrinsic_t=tuple(TIC),
        # the reference's euroc yaml inflates the noise densities ~4x over
        # the datasheet for robustness; keep the same convention
        acc_n=0.08 if noise_inflated else 0.02,
        gyr_n=0.004 if noise_inflated else 0.0017,
        loop_closure=loop_closure, pg_skip_first_cnt=pg_skip_first_cnt,
        # reference-parity MIN_LOOP_NUM (keyframe.h:16): the corner-to-corner
        # verification path (FAST corners with two-view depth matched against
        # the old FAST set) yields 45-70 ratio-tested matches at a revisit on
        # this texture (tools/diag_loop.py), comfortably above 25 — the
        # round-2 reduction to 12 predated that path and is gone
        min_loop_num=cfg_kw.pop("min_loop_num", 25),
        pg_async=pg_async,
        **cfg_kw,
    )
    return Pipeline(cfg, cam, imu_buf_len=64, dtype=dtype)


def run_proxy(
    duration: float = 20.0,
    period: float = 16.0,
    frame_hz: float = 10.0,
    imu_hz: float = 200.0,
    seed: int = 0,
    imu_noise: bool = True,
    pix_noise: float = 2.0,
    pipe: Pipeline | None = None,
    tex_k: int = 96,
    progress=None,
    radius: float = 4.0,
) -> ProxyRun:
    rng = np.random.default_rng(seed)
    traj = Trajectory.circuit(radius=radius, period=period, height=1.0)
    gravity = jnp.asarray([0.0, 0.0, 9.81], jnp.float64)

    pipe = pipe or make_pipeline()
    renderer = RoomRenderer(
        pipe.camera, EUROC_H, EUROC_W,
        room=Room.make(jax.random.PRNGKey(seed + 7), k=tex_k),
        tic=TIC, Ric=np.asarray(R_IC_FORWARD),
    )

    imu_at = highest_matmul_precision(
        jax.jit(lambda t: traj.imu_at(t, gravity)))
    frame_at = highest_matmul_precision(
        jax.jit(lambda t: (traj.pos_fn(t), traj.q(t))))

    @jax.jit
    def noisy(img, key):
        # sensor noise added on-device: the image never visits the host
        return jnp.clip(
            img + pix_noise * jax.random.normal(key, img.shape, img.dtype),
            0.0, 255.0)

    nkey = jax.random.PRNGKey(seed + 13)

    # discrete sensor noise: white σ_d = n·√hz; bias RW step σ = w·√dt
    dt_i = 1.0 / imu_hz
    sig_a = 0.02 * np.sqrt(imu_hz) if imu_noise else 0.0
    sig_g = 0.0017 * np.sqrt(imu_hz) if imu_noise else 0.0
    wba = 0.0004 * np.sqrt(dt_i) if imu_noise else 0.0
    wbg = 2e-5 * np.sqrt(dt_i) if imu_noise else 0.0
    ba = BA.copy()
    bg = BG.copy()

    n_frames = int(round(duration * frame_hz))
    n_sub = int(round(imu_hz / frame_hz))
    t0 = 1.0

    ts, p_gt, q_gt, events = [], [], [], []
    n_loops = 0
    for fi in range(n_frames):
        t = t0 + fi / frame_hz
        if fi > 0:
            for s in range(1, n_sub + 1):
                ti = t - 1.0 / frame_hz + s * dt_i
                a, w = imu_at(jnp.asarray(ti, jnp.float64))
                ba += wba * rng.standard_normal(3)
                bg += wbg * rng.standard_normal(3)
                acc = np.asarray(a) + ba + sig_a * rng.standard_normal(3)
                gyr = np.asarray(w) + bg + sig_g * rng.standard_normal(3)
                pipe.process_imu(ti, acc, gyr)

        p, q = frame_at(jnp.asarray(t, jnp.float64))
        img = renderer.render_device(p, q)  # stays on device
        if pix_noise > 0:
            img = noisy(img, jax.random.fold_in(nkey, fi))
        ev = pipe.process_image(img, t)
        if ev.get("published"):
            ts.append(t)
            p_gt.append(np.asarray(p))
            q_gt.append(np.asarray(q))
            events.append(ev)
        if progress and fi % 20 == 0:
            progress(fi, n_frames, ev)

    # drain the async pose-graph worker + force the pending 4-DoF solve,
    # then stop the worker (unclean daemon exit mid-device-call aborts)
    pipe.pg_join()
    pipe.shutdown()
    n_loops = sum(1 for e in pipe.pg_events if e.get("loop") is not None)
    return ProxyRun(np.asarray(ts), np.stack(p_gt), np.stack(q_gt),
                    pipe, events, n_loops)


def ate_rmse_tum(traj_est: list, t_gt, p_gt, align: str = "se3") -> float:
    """Score a pipeline trajectory list [(t, p, q)] against ground truth
    using the same association + alignment as tools/evaluate_ate.py."""
    if not traj_est:
        return float("nan")
    t_e = np.asarray([e[0] for e in traj_est])
    p_e = np.stack([e[1] for e in traj_est])
    j = np.searchsorted(t_gt, t_e)
    j = np.clip(j, 0, len(t_gt) - 1)
    ok = np.abs(t_gt[j] - t_e) <= 0.02
    P, G = p_e[ok], p_gt[j[ok]]
    if len(P) < 3:
        return float("nan")
    Pc = P - P.mean(0)
    Gc = G - G.mean(0)
    if align == "se3":
        U, S, Vt = np.linalg.svd(Gc.T @ Pc)
        D = np.diag([1, 1, np.sign(np.linalg.det(U @ Vt))])
        R = U @ D @ Vt
        A = (R @ Pc.T).T + G.mean(0)
    else:  # 4-DoF yaw+t
        num = np.sum(Gc[:, 1] * Pc[:, 0] - Gc[:, 0] * Pc[:, 1])
        den = np.sum(Gc[:, 0] * Pc[:, 0] + Gc[:, 1] * Pc[:, 1])
        th = np.arctan2(num, den)
        c, s = np.cos(th), np.sin(th)
        Rz = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
        A = (Rz @ Pc.T).T + G.mean(0)
    return float(np.sqrt(np.mean(np.sum((A - G) ** 2, axis=1))))
