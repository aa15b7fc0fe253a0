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
from ..core.precision import highest_matmul_precision
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


@highest_matmul_precision
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


@highest_matmul_precision
@jax.jit
def triangulate_two_view(
    p0: jax.Array, R0: jax.Array,  # camera 0 position [3] / world←cam [3,3]
    x0: jax.Array,                 # [P,2] normalized obs in camera 0
    p1: jax.Array, R1: jax.Array,
    x1: jax.Array,                 # [P,2] matching obs in camera 1
    valid: jax.Array,              # [P]
    max_reproj: float = 4.0 / 460.0,
    min_parallax: float = 1.0 / 460.0,
):
    """Closed-form midpoint triangulation of matched rays between two known
    camera poses, batched + gated: cheirality in both views, reprojection
    below `max_reproj`, ray parallax above `min_parallax`.  Gives keyframe
    FAST corners their own 3D so loop verification can run corner-to-corner
    (the window landmarks' tracked positions drift off corner peaks and
    describe poorly)."""
    dt = x0.dtype
    one = jnp.ones((x0.shape[0], 1), dt)
    d0 = jnp.concatenate([x0, one], -1) @ R0.T  # world ray dirs [P,3]
    d1 = jnp.concatenate([x1, one], -1) @ R1.T
    d0 = d0 / jnp.linalg.norm(d0, axis=-1, keepdims=True)
    d1 = d1 / jnp.linalg.norm(d1, axis=-1, keepdims=True)
    b = (p1 - p0)[None, :]
    dd = jnp.sum(d0 * d1, -1)                      # cosθ
    denom = jnp.maximum(1.0 - dd * dd, 1e-12)
    t0 = (jnp.sum(b * d0, -1) - dd * jnp.sum(b * d1, -1)) / denom
    t1 = (dd * jnp.sum(b * d0, -1) - jnp.sum(b * d1, -1)) / denom
    X = 0.5 * ((p0 + t0[:, None] * d0) + (p1 + t1[:, None] * d1))

    def reproj(X, p, R, x):
        Pc = (X - p[None]) @ R  # world→cam (R = world←cam, so multiply right)
        z = Pc[:, 2]
        zs = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
        return jnp.linalg.norm(Pc[:, :2] / zs[:, None] - x, axis=-1), z

    e0, z0 = reproj(X, p0, R0, x0)
    e1, z1 = reproj(X, p1, R1, x1)
    parallax = jnp.arccos(jnp.clip(dd, -1.0, 1.0))
    ok = (valid & (z0 > 0.1) & (z1 > 0.1)
          & (e0 < max_reproj) & (e1 < max_reproj)
          & (parallax > min_parallax) & (t0 > 0.0) & (t1 > 0.0))
    return X, ok


def make_verify_connection(min_inliers: int = 25):
    """The WHOLE findConnection device chain (keyframe.cpp:259-520) as one
    jitted program: descriptor match → PnP-RANSAC → old-body-pose recovery →
    relative sanity gate.  One dispatch + one fetch per candidate instead of
    three sequential round trips (each ~30 ms through a remote-attached
    chip)."""
    from .brief import match_descriptors

    @jax.jit
    def verify(q_desc, q_valid, X, old_desc, old_valid, old_pts,
               p_c0, q_c0, qic, tic, p_cur, q_cur, key):
        midx, mok = match_descriptors(q_desc, q_valid, old_desc, old_valid)
        x_old = jnp.take(old_pts, midx, axis=0).astype(X.dtype)
        res = pnp_ransac(X, x_old, mok, p_c0, q_c0, key,
                         min_inliers=min_inliers)
        # old keyframe BODY pose implied by PnP (in the current world)
        q_old_b = lie.qmul(res.q, lie.qconj(qic))
        p_old_b = res.p - lie.qrotate(q_old_b, tic)
        rel_t, rel_yaw, rel_ok = relative_check(p_old_b, q_old_b,
                                                p_cur, q_cur)
        n_matches = jnp.sum(mok)
        ok = (n_matches >= min_inliers) & res.ok & rel_ok
        return {
            "midx": midx, "mok": mok, "n_matches": n_matches,
            "inliers": res.inliers, "n_inliers": res.n_inliers,
            "pnp_ok": res.ok, "p_old_b": p_old_b, "q_old_b": q_old_b,
            "rel_t": rel_t, "rel_yaw": rel_yaw, "rel_ok": rel_ok, "ok": ok,
        }

    return highest_matmul_precision(verify)
