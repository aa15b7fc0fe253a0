"""Fast relocalization: BA-refined loop relative pose.

The reference's FAST_RELOCALIZATION path (keyframe.cpp:488-514 publishes the
matched old-keyframe points; estimator_node.cpp:165-206 buffers them;
Estimator::setReloFrame (estimator.cpp:1128-1146) pins them to a window
frame; optimization() adds a free relo pose block with projection factors
onto window landmarks (estimator.cpp:769-801); the solved relo pose yields
relo_relative_t/q/yaw (double2vector, :597-618) which pose_graph::
updateKeyFrameLoop (pose_graph.cpp:889-923) adopts as the refined loop edge).

TPU-native re-expression: the relo pose is the only free block — the window
landmarks it projects onto are already converged by the sliding-window solve,
so a dedicated 6-DoF robust Gauss-Newton (fixed iterations, one tiny fused
device program) recovers the same refined pose without recompiling the
window-sized solver with an extra parameter block.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie
from ..core.precision import highest_matmul_precision
from ..core.linalg import spd_solve


class ReloResult(NamedTuple):
    p: jax.Array  # [3] refined OLD-keyframe camera position (current world)
    q: jax.Array  # [4] refined world←camera rotation
    n_inliers: jax.Array
    cost: jax.Array
    ok: jax.Array


def _residuals(p, q, X, x):
    """Normalized-plane reprojection residuals of world points X into the
    camera at (p, q).  Returns (r [N,2], z [N])."""
    Pc = jax.vmap(lambda Xl: lie.qrotate(lie.qconj(q), Xl - p))(X)
    z = Pc[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-6, jnp.where(z >= 0, 1e-6, -1e-6), z)
    return Pc[:, :2] / zs[:, None] - x, z


@highest_matmul_precision
@functools.partial(jax.jit, static_argnames=("iters", "min_inliers"))
def refine_relo_pose(
    X: jax.Array,  # [N,3] window landmarks in the current world
    x: jax.Array,  # [N,2] matched normalized points in the OLD keyframe
    valid: jax.Array,  # [N]
    p0: jax.Array,  # [3] initial camera position (e.g. PnP-RANSAC output)
    q0: jax.Array,  # [4] initial world←camera rotation
    iters: int = 8,
    thresh: float = 10.0 / 460.0,
    min_inliers: int = 25,
    focal: float = 460.0,
) -> ReloResult:
    """Cauchy-robust GN over the 6-DoF relo camera pose (all landmarks
    fixed).  Residuals are scaled to pixel units (sqrt_info = FOCAL/1.5,
    estimator.cpp:17) before the Cauchy IRLS weights, which play
    CauchyLoss(1.0)'s role in the reference's relo projection factors
    (estimator.cpp:793-800)."""
    dt = X.dtype
    vf = valid.astype(dt)
    w_f = focal / 1.5

    def gn_step(carry, _):
        p, q = carry

        def r_of(dx):
            pp = p + dx[:3]
            qq = lie.qmul(q, lie.deltaQ(dx[3:6]))
            r, _ = _residuals(pp, qq, X, x)
            return (w_f * r).reshape(-1)

        dx0 = jnp.zeros((6,), dt)
        r = r_of(dx0)
        J = jax.jacfwd(r_of)(dx0)  # [2N, 6]
        # Cauchy IRLS weights per landmark
        s = jnp.sum(r.reshape(-1, 2) ** 2, axis=-1)
        w = jnp.sqrt(1.0 / (1.0 + s)) * vf
        wr = jnp.repeat(w, 2)
        Jw = J * wr[:, None]
        rw = r * wr
        H = Jw.T @ Jw + 1e-8 * jnp.eye(6, dtype=dt)
        dx = -spd_solve(H, Jw.T @ rw)
        return (p + dx[:3], lie.qnormalize(lie.qmul(q, lie.deltaQ(dx[3:6])))), None

    (p, q), _ = jax.lax.scan(gn_step, (p0, q0), None, length=iters)

    r, z = _residuals(p, q, X, x)
    err = jnp.linalg.norm(r, axis=-1)
    inl = (err < thresh) & (z > 0.0) & valid
    n = jnp.sum(inl)
    s = jnp.sum((w_f * r) ** 2, axis=-1)
    cost = jnp.sum(jnp.where(valid, jnp.log1p(s), 0.0))
    return ReloResult(p=p, q=q, n_inliers=n, cost=cost, ok=n >= min_inliers)


def relative_pose_4dof(p_old_b, q_old_b, p_cur_b, q_cur_b):
    """relo_relative_t/q/yaw (double2vector, estimator.cpp:597-618): the
    current keyframe expressed in the old keyframe's body frame, plus the
    yaw difference — the refined loop edge consumed by updateKeyFrameLoop."""
    R_old_T = lie.q2R(lie.qconj(q_old_b))
    rel_t = R_old_T @ (p_cur_b - p_old_b)
    rel_q = lie.qmul(lie.qconj(q_old_b), q_cur_b)
    rel_yaw = lie.normalize_angle(
        lie.R2ypr(lie.q2R(q_cur_b))[0] - lie.R2ypr(lie.q2R(q_old_b))[0]
    )
    return rel_t, rel_q, rel_yaw
