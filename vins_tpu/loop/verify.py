"""Geometric loop verification: batched PnP-RANSAC.

Replaces cv::solvePnPRansac in KeyFrame::findConnection
(pose_graph/src/keyframe.cpp:200-256): given the current keyframe's window
landmarks (3D world points) matched against the old keyframe's 2D points,
estimate the old keyframe's pose.  TPU-native: all RANSAC hypotheses refine
in parallel (vmapped Gauss-Newton), inlier counting is one batched residual
evaluation, acceptance mirrors the reference (> MIN_LOOP_NUM=25 inliers,
keyframe.h:16; relative-pose sanity |Δyaw| < 30°, |Δt| < 20 m applied by the
caller, keyframe.cpp:472-480).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie
from ..init.sfm import pnp_gn


class PnPResult(NamedTuple):
    p: jax.Array  # [3] camera position (world)
    q: jax.Array  # [4] world←camera
    inliers: jax.Array  # [N]
    n_inliers: jax.Array
    ok: jax.Array


def _reproj_err(X, x, p, q):
    Pc = jax.vmap(lambda Xl: lie.qrotate(lie.qconj(q), Xl - p))(X)
    z = Pc[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-6, jnp.where(z >= 0, 1e-6, -1e-6), z)
    return jnp.linalg.norm(Pc[:, :2] / zs[:, None] - x, axis=-1), z


@functools.partial(jax.jit, static_argnames=("n_hyp", "min_inliers"))
def pnp_ransac(
    X: jax.Array,  # [N,3] world points
    x: jax.Array,  # [N,2] normalized observations
    valid: jax.Array,  # [N]
    p0: jax.Array, q0: jax.Array,  # initial pose guess (current VIO pose)
    key: jax.Array,
    n_hyp: int = 128,
    thresh: float = 10.0 / 460.0,  # reprojection gate (keyframe.cpp:231)
    min_inliers: int = 25,  # MIN_LOOP_NUM
) -> PnPResult:
    N = X.shape[0]
    dt = X.dtype

    logits = jnp.where(valid, 0.0, -jnp.inf)[None, :].astype(jnp.float32)
    g = jax.random.gumbel(key, (n_hyp, N), jnp.float32) + logits
    # 4-point samples: GN from the VIO pose needs no over-determination, and
    # smaller samples survive low inlier fractions (0.3^4·128 hypotheses
    # ≈ 65% ≥1 clean sample vs 8% at 6 points)
    _, idx = jax.lax.top_k(g, 4)

    def solve_hyp(ii):
        w = jnp.zeros((N,), dt).at[ii].set(1.0) * valid.astype(dt)
        p, q, _ = pnp_gn(X, x, w, p0, q0, iters=6)
        err, z = _reproj_err(X, x, p, q)
        inl = (err < thresh) & (z > 0.0) & valid
        return jnp.sum(inl), p, q

    scores, ps, qs = jax.vmap(solve_hyp)(idx)
    best = jnp.argmax(scores)

    # refine on the best hypothesis's inliers
    err, z = _reproj_err(X, x, ps[best], qs[best])
    inl = (err < thresh) & (z > 0.0) & valid
    p, q, _ = pnp_gn(X, x, inl.astype(dt), ps[best], qs[best], iters=10)
    err, z = _reproj_err(X, x, p, q)
    inliers = (err < thresh) & (z > 0.0) & valid
    n = jnp.sum(inliers)
    return PnPResult(p=p, q=q, inliers=inliers, n_inliers=n, ok=n > min_inliers)


def relative_check(p_old, q_old, p_cur, q_cur,
                   max_yaw_deg: float = 30.0, max_t: float = 20.0):
    """The reference's loop sanity gate (keyframe.cpp:472-480): relative
    position in the old body frame and relative yaw must be small."""
    R_old_T = lie.q2R(lie.qconj(q_old))
    rel_t = R_old_T @ (p_cur - p_old)
    rel_yaw = lie.normalize_angle(
        lie.R2ypr(lie.q2R(q_cur))[0] - lie.R2ypr(lie.q2R(q_old))[0]
    )
    ok = (jnp.abs(rel_yaw) < max_yaw_deg) & (jnp.linalg.norm(rel_t) < max_t)
    return rel_t, rel_yaw, ok
