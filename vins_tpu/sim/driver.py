"""Synthetic end-to-end driver: feeds the Estimator exact IMU + feature
tracks from a closed-form scene, mirroring the reference's data_generator
node wire format (data_generator/src/data_generator_node.cpp:30: features
published as (id, normalized xy, velocity); IMU at a fixed rate)."""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import lie
from .synthetic import Trajectory, make_landmarks, project_points
from .window import R_IC_FORWARD


class SimRun(NamedTuple):
    t: np.ndarray  # [T] frame times
    p_gt: np.ndarray  # [T,3] ground-truth body positions
    q_gt: np.ndarray  # [T,4]
    p_est: np.ndarray  # [T,3] newest-frame estimate after each image (NaN before init)
    q_est: np.ndarray  # [T,4]
    events: list  # per-frame diagnostics dicts


class SyntheticDriver:
    def __init__(
        self,
        n_points: int = 600,
        imu_hz: float = 200.0,
        frame_hz: float = 10.0,
        g_norm: float = 9.81,
        ba=(0.02, -0.01, 0.015),
        bg=(0.002, 0.003, -0.001),
        tic=(0.06, -0.01, 0.02),
        key=None,
        traj: Trajectory | None = None,
    ):
        self.traj = traj or Trajectory.figure8()
        self.gravity = jnp.asarray([0.0, 0.0, g_norm], jnp.float64)
        self.imu_hz = imu_hz
        self.frame_hz = frame_hz
        self.ba = np.asarray(ba)
        self.bg = np.asarray(bg)
        self.tic = jnp.asarray(tic, jnp.float64)
        self.qic = lie.R2q(jnp.asarray(R_IC_FORWARD, jnp.float64))
        key = key if key is not None else jax.random.PRNGKey(0)
        self.points = make_landmarks(
            key, n_points, center=(0.0, 0.0, 0.8), spread=(12.0, 12.0, 5.0),
            dtype=jnp.float64,
        )
        self.max_cnt = 150  # front-end feature budget (MAX_CNT)
        self._imu_at = jax.jit(lambda t: self.traj.imu_at(t, self.gravity))
        self._frame_at = jax.jit(self._frame_fn)

    def _frame_fn(self, t):
        p = self.traj.pos_fn(t)
        q = self.traj.q(t)
        pt, valid = project_points(p, q, self.tic, self.qic, self.points)
        return p, q, pt, valid

    def run(self, est, n_frames: int, t0: float = 1.0, pix_noise: float = 0.0,
            noise_key=None) -> SimRun:
        dt_f = 1.0 / self.frame_hz
        dt_i = 1.0 / self.imu_hz
        n_sub = int(round(dt_f / dt_i))

        ts, p_gt, q_gt, p_est, q_est, events = [], [], [], [], [], []
        t = t0
        for fi in range(n_frames):
            if fi > 0:
                # IMU samples in (t_prev, t]
                for s in range(1, n_sub + 1):
                    ti = t - dt_f + s * dt_i
                    a, w = self._imu_at(jnp.asarray(ti, jnp.float64))
                    est.process_imu(dt_i, np.asarray(a) + self.ba, np.asarray(w) + self.bg)

            p, q, pt, valid = self._frame_at(jnp.asarray(t, jnp.float64))
            valid = np.asarray(valid)
            pt = np.asarray(pt)
            if pix_noise > 0:
                noise_key, sub = jax.random.split(noise_key)
                pt = pt + pix_noise * np.asarray(
                    jax.random.normal(sub, pt.shape, jnp.float64)
                )
            ids = np.nonzero(valid)[0][: self.max_cnt]
            ev = est.process_image(
                ids, pt[ids], np.zeros((len(ids), 2)), pt[ids] * 460.0, t,
            )
            events.append(ev)
            ts.append(t)
            p_gt.append(np.asarray(p))
            q_gt.append(np.asarray(q))
            if est.solver_flag == 1:  # NON_LINEAR
                p_est.append(est.p[est.W].copy())
                q_est.append(est.q[est.W].copy())
            else:
                p_est.append(np.full(3, np.nan))
                q_est.append(np.full(4, np.nan))
            t += dt_f

        return SimRun(
            t=np.asarray(ts), p_gt=np.stack(p_gt), q_gt=np.stack(q_gt),
            p_est=np.stack(p_est), q_est=np.stack(q_est), events=events,
        )


def ate_rmse(run: SimRun, yaw_align: bool = True) -> float:
    """ATE RMSE after 4-DoF (yaw + translation) alignment — the standard VIO
    scoring (the estimator's world differs from GT by exactly yaw + t)."""
    m = ~np.isnan(run.p_est[:, 0])
    if m.sum() < 2:
        return float("inf")
    P = run.p_est[m]
    G = run.p_gt[m]
    if yaw_align:
        # optimal yaw via 2D Procrustes on xy
        Pc = P - P.mean(0)
        Gc = G - G.mean(0)
        num = np.sum(Gc[:, 1] * Pc[:, 0] - Gc[:, 0] * Pc[:, 1])
        den = np.sum(Gc[:, 0] * Pc[:, 0] + Gc[:, 1] * Pc[:, 1])
        th = np.arctan2(num, den)
        c, s = np.cos(th), np.sin(th)
        Rz = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
        P = (Rz @ Pc.T).T + G.mean(0)
        G = Gc + G.mean(0)
    e = np.linalg.norm(P - G, axis=1)
    return float(np.sqrt((e**2).mean()))
