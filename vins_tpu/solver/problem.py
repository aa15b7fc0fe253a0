"""Problem containers and local-coordinate layout for the sliding-window solver.

The reference shapes this as Ceres parameter blocks (estimator.cpp:676-801:
11 pose blocks [7], 11 speed/bias blocks [9], extrinsic [7], td [1], inverse
depths [1 each]).  Here the whole window is a fixed-shape pytree and the
local (tangent) coordinates are one packed vector:

    [ poses 6·F | speed/bias 9·F | extrinsic 6 | td 1 ]  → dim_x = 15·F + 7

followed by a separate landmark block (inverse depths, eliminated by Schur
complement).  F = window+1 frames.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie


class Layout:
    """Static index layout of the packed tangent vector (all Python ints)."""

    def __init__(self, frames: int):
        self.F = frames
        self.dim_pose = 6 * frames
        self.dim_sb = 9 * frames
        self.ext_off = 15 * frames
        self.td_off = 15 * frames + 6
        self.dim_x = 15 * frames + 7

    def pose_off(self, f):
        return 6 * f

    def sb_off(self, f):
        return 6 * self.F + 9 * f


class WindowState(NamedTuple):
    """All optimizable window states (estimator.h:74-90 Ps/Rs/Vs/Bas/Bgs +
    ric/tic + td), as batched arrays."""

    p: jax.Array  # [F, 3] position of body in world
    q: jax.Array  # [F, 4] world←body quaternion [w,x,y,z]
    v: jax.Array  # [F, 3]
    ba: jax.Array  # [F, 3]
    bg: jax.Array  # [F, 3]
    tic: jax.Array  # [3] body←camera translation
    qic: jax.Array  # [4] body←camera rotation
    td: jax.Array  # [] time offset

    @staticmethod
    def identity(frames: int, dtype=jnp.float32) -> "WindowState":
        qid = jnp.tile(jnp.asarray([1.0, 0, 0, 0], dtype), (frames, 1))
        z = jnp.zeros((frames, 3), dtype)
        return WindowState(
            p=z, q=qid, v=z, ba=z, bg=z,
            tic=jnp.zeros(3, dtype), qic=jnp.asarray([1.0, 0, 0, 0], dtype),
            td=jnp.zeros((), dtype),
        )


def state_boxplus(s: WindowState, dx: jax.Array, layout: Layout) -> WindowState:
    """Apply a packed tangent step (pose ⊞ per pose_local_parameterization)."""
    F = layout.F
    d_pose = dx[: 6 * F].reshape(F, 6)
    d_sb = dx[6 * F : 15 * F].reshape(F, 9)
    d_ext = dx[layout.ext_off : layout.ext_off + 6]
    d_td = dx[layout.td_off]
    p, q = lie.pose_boxplus(s.p, s.q, d_pose[:, :3], d_pose[:, 3:])
    tic, qic = lie.pose_boxplus(s.tic, s.qic, d_ext[:3], d_ext[3:])
    return WindowState(
        p=p, q=q,
        v=s.v + d_sb[:, 0:3], ba=s.ba + d_sb[:, 3:6], bg=s.bg + d_sb[:, 6:9],
        tic=tic, qic=qic, td=s.td + d_td,
    )


def state_boxminus(s: WindowState, lin: WindowState, layout: Layout) -> jax.Array:
    """Packed tangent difference s ⊟ lin, quaternion-aware
    (marginalization_factor.cpp:345-363: dx_rot = 2·vec(q_lin⁻¹ ⊗ q), sign
    flipped so w ≥ 0)."""

    def qdiff(q, ql):
        e = lie.qmul(lie.qconj(ql), q)
        e = jnp.where(e[..., :1] >= 0, e, -e)
        return 2.0 * e[..., 1:]

    d_pose = jnp.concatenate([s.p - lin.p, qdiff(s.q, lin.q)], axis=-1)  # [F,6]
    d_sb = jnp.concatenate([s.v - lin.v, s.ba - lin.ba, s.bg - lin.bg], axis=-1)  # [F,9]
    d_ext = jnp.concatenate([s.tic - lin.tic, qdiff(s.qic, lin.qic)])
    return jnp.concatenate(
        [d_pose.reshape(-1), d_sb.reshape(-1), d_ext, (s.td - lin.td)[None]]
    )


class FeatureObs(NamedTuple):
    """Dense window observation tensor — the solver-facing view of the
    feature database (replaces list<FeaturePerId>, feature_manager.h:52-74).

    Slot l observes frame f iff valid[l, f]; anchor[l] is the first observing
    frame (the inverse-depth anchor).  `toff[l, f]` bakes the per-observation
    time origin for temporal/rolling-shutter calibration:
    toff = td_at_capture − TR·row/ROW, so the factor shifts points by
    (td − toff)·vel (projection_td_factor.cpp:50-52)."""

    pt: jax.Array  # [L, F, 2] normalized-plane coordinates
    vel: jax.Array  # [L, F, 2] normalized-plane velocity
    toff: jax.Array  # [L, F]
    valid: jax.Array  # [L, F] bool
    anchor: jax.Array  # [L] int32 first observing frame
    inv_depth: jax.Array  # [L] inverse depth in anchor frame
    active: jax.Array  # [L] bool — participates in optimization

    @staticmethod
    def empty(max_landmarks: int, frames: int, dtype=jnp.float32) -> "FeatureObs":
        L, F = max_landmarks, frames
        return FeatureObs(
            pt=jnp.zeros((L, F, 2), dtype),
            vel=jnp.zeros((L, F, 2), dtype),
            toff=jnp.zeros((L, F), dtype),
            valid=jnp.zeros((L, F), bool),
            anchor=jnp.zeros((L,), jnp.int32),
            inv_depth=jnp.full((L,), 0.2, dtype),
            active=jnp.zeros((L,), bool),
        )


class Prior(NamedTuple):
    """Marginalization prior: r(x) = r0 + J·(x ⊟ lin)
    (marginalization_factor.cpp:321-381)."""

    J: jax.Array  # [R, dim_x]
    r0: jax.Array  # [R]
    lin: WindowState  # linearization point (current window layout)
    valid: jax.Array  # [] bool

    @staticmethod
    def empty(layout: Layout, dtype=jnp.float32) -> "Prior":
        return Prior(
            J=jnp.zeros((layout.dim_x, layout.dim_x), dtype),
            r0=jnp.zeros((layout.dim_x,), dtype),
            lin=WindowState.identity(layout.F, dtype),
            valid=jnp.asarray(False),
        )


def prior_residual(prior: Prior, s: WindowState, layout: Layout) -> jax.Array:
    """Evaluate the prior residual at state s (zero when invalid)."""
    dx = state_boxminus(s, prior.lin, layout)
    r = prior.r0 + prior.J @ dx
    return jnp.where(prior.valid, r, jnp.zeros_like(r))
