"""Initialization orchestration: SfM + visual-inertial alignment.

Host-side equivalent of Estimator::initialStructure + visualInitialAlign
(estimator.cpp:218-440), chaining the jitted init solves:

  excitation check → reference-frame search (relativePose, estimator.cpp:
  442-471) → GlobalSFM → gyro-bias solve + repropagation → linear alignment
  with gravity refinement → state application (gravity-aligned world, yaw of
  frame 0 zeroed, velocities rotated to world, depths reset for
  re-triangulation).

The reference aligns over `all_image_frame` (every frame since start); we
align over the window frames — same equations, bounded shapes.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import lie
from ..imu.preintegration import ImuNoise, preintegrate
from ..init.alignment import solve_gyro_bias, visual_imu_alignment
from ..init.relative_pose import solve_relative_pose
from ..init.sfm import construct_sfm


class InitResult(NamedTuple):
    ok: bool
    reason: str
    p: np.ndarray | None = None  # [F,3]
    q: np.ndarray | None = None  # [F,4]
    v: np.ndarray | None = None  # [F,3]
    bg: np.ndarray | None = None  # [3]
    scale: float = 0.0
    g_var: float = 0.0


def make_align_pipeline(noise: ImuNoise, g_norm: float):
    """SfM + gyro bias + repropagation + alignment as one jitted program
    (noise densities and g_norm are compile-time constants via closure)."""
    @jax.jit
    def pipeline(pt, valid, l, R_rel, t_rel, qic, tic,
                 imu_dt, imu_acc, imu_gyr, imu_mask):
        dtype = pt.dtype
        zero3 = jnp.zeros(3, dtype)

        sfm = construct_sfm(pt, valid, l, R_rel, t_rel)

        # body rotations in the SfM (camera-l) frame: R_wb = R_wc · Ricᵀ
        q_ci = jnp.asarray(qic)
        q_wb = jax.vmap(lambda qc: lie.qmul(qc, lie.qconj(q_ci)))(sfm.q_wc)

        pres0 = jax.vmap(
            lambda d, a, g, m: preintegrate(d, a, g, zero3, zero3, noise, m)
        )(imu_dt, imu_acc, imu_gyr, imu_mask)
        dbg = solve_gyro_bias(q_wb, pres0)
        pres1 = jax.vmap(
            lambda d, a, g, m: preintegrate(d, a, g, zero3, dbg, noise, m)
        )(imu_dt, imu_acc, imu_gyr, imu_mask)

        align = visual_imu_alignment(q_wb, sfm.p_wc, tic, pres1, g_norm)

        # --- apply (visualInitialAlign, estimator.cpp:364-440) -------------
        s = align.scale
        R_wb = jax.vmap(lie.q2R)(q_wb)  # [F,3,3]
        tic_b = jnp.asarray(tic)
        Ps = s * sfm.p_wc - jnp.einsum("fij,j->fi", R_wb, tic_b)
        Ps = Ps - Ps[0][None]
        Vs = jnp.einsum("fij,fj->fi", R_wb, align.v_body)

        # rotate world: gravity → +z, yaw(frame 0) → 0 (:424-435)
        R0 = lie.g2R(align.g_c0)
        yaw0 = lie.R2ypr(R0 @ R_wb[0])[0]
        R0 = lie.ypr2R(jnp.stack([-yaw0, jnp.zeros_like(yaw0), jnp.zeros_like(yaw0)])) @ R0
        Ps = Ps @ R0.T
        Vs = Vs @ R0.T
        R_wb = jnp.einsum("ij,fjk->fik", R0, R_wb)
        q_out = jax.vmap(lie.R2q)(R_wb)

        return Ps, q_out, Vs, dbg, s, sfm.ok, align.ok

    return pipeline


class Initializer:
    def __init__(self, noise: ImuNoise, g_norm: float, focal: float = 460.0,
                 dtype=jnp.float64):
        self.noise = noise
        self.g_norm = g_norm
        self.focal = focal
        self.dtype = dtype
        self._pipeline = make_align_pipeline(noise, g_norm)
        self._key = jax.random.PRNGKey(0)

    def excitation_variance(self, imu_dt, imu_acc, imu_gyr, imu_n) -> float:
        """std of per-interval mean specific force direction (estimator.cpp:
        221-248) — the reference only warns below 0.25, never aborts."""
        gs = []
        for k in range(imu_dt.shape[0]):
            n = int(imu_n[k])
            if n == 0:
                continue
            dt = imu_dt[k, :n].sum()
            if dt <= 0:
                continue
            # dv/dt from raw samples ≈ average specific force
            gs.append(imu_acc[k, 1 : n + 1].mean(0))
        if len(gs) < 2:
            return 0.0
        gs = np.stack(gs)
        return float(np.linalg.norm(gs - gs.mean(0), axis=1).mean())

    def find_reference_frame(self, db) -> tuple[int, object] | None:
        """relativePose (estimator.cpp:442-471): first frame l with ≥20
        correspondences to the newest frame and mean parallax·focal > 30 px
        for which the essential solve succeeds."""
        F = db.F
        for l in range(F - 1):
            both = db.used & db.valid[:, l] & db.valid[:, F - 1]
            if both.sum() < 20:
                continue
            d = db.pt[both, l] - db.pt[both, F - 1]
            parallax = np.linalg.norm(d, axis=1).mean()
            if parallax * self.focal < 30.0:
                continue
            self._key, sub = jax.random.split(self._key)
            rel = solve_relative_pose(
                jnp.asarray(db.pt[:, l], self.dtype),
                jnp.asarray(db.pt[:, F - 1], self.dtype),
                jnp.asarray(db.valid[:, l] & db.valid[:, F - 1] & db.used),
                sub,
            )
            if bool(rel.ok):
                return l, rel
        return None

    def try_initialize(
        self, db, imu_dt, imu_acc, imu_gyr, imu_n, qic, tic,
    ) -> InitResult:
        g_var = self.excitation_variance(imu_dt, imu_acc, imu_gyr, imu_n)
        # (reference warns when < 0.25 but proceeds — estimator.cpp:245-247)

        found = self.find_reference_frame(db)
        if found is None:
            return InitResult(False, "no reference frame with enough parallax", g_var=g_var)
        l, rel = found

        N = imu_dt.shape[1]
        mask = np.arange(N)[None, :] < imu_n[:, None]
        Ps, q, Vs, dbg, s, sfm_ok, align_ok = self._pipeline(
            jnp.asarray(db.pt, self.dtype),
            jnp.asarray(db.valid & db.used[:, None]),
            jnp.asarray(l),
            jnp.asarray(rel.R, self.dtype),
            jnp.asarray(rel.t, self.dtype),
            jnp.asarray(qic, self.dtype),
            jnp.asarray(tic, self.dtype),
            jnp.asarray(imu_dt, self.dtype),
            jnp.asarray(imu_acc, self.dtype),
            jnp.asarray(imu_gyr, self.dtype),
            jnp.asarray(mask),
        )
        if not bool(sfm_ok):
            return InitResult(False, "global SfM failed", g_var=g_var)
        if not bool(align_ok):
            return InitResult(False, "visual-inertial alignment rejected", g_var=g_var)
        return InitResult(
            True, "ok",
            p=np.asarray(Ps), q=np.asarray(q), v=np.asarray(Vs),
            bg=np.asarray(dbg), scale=float(s), g_var=g_var,
        )
