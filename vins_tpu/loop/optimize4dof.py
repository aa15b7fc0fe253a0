"""4-DoF global pose-graph optimization.

TPU-native re-expression of PoseGraph::optimize4DoF
(pose_graph/src/pose_graph.cpp:403-579 + the cost functors pose_graph.h:
159-248): variables are per-keyframe yaw + translation (pitch/roll fixed
from VIO); sequential edges connect each keyframe to its 4 predecessors with
VIO-relative measurements; loop edges carry the verified relative pose with
a Huber(0.1) robust weight; the first looped keyframe is held fixed; Ceres
SPARSE_NORMAL_CHOLESKY × 5 iterations becomes a fixed-iteration masked dense
GN (the active window since `earliest_loop_index` is ≤ a few hundred poses —
a ~4K-dim dense solve is one MXU Cholesky).

Angles are DEGREES throughout, matching the reference's utility math.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import lie
from ..core.precision import highest_matmul_precision

SEQ_BACK = 4  # sequential edges to 4 previous keyframes (pose_graph.cpp:480)


class GraphArrays(NamedTuple):
    """Fixed-capacity pose-graph tensors (padded with `used` mask)."""

    t_vio: jax.Array  # [K,3] VIO translation (sequence-shifted)
    ypr_vio: jax.Array  # [K,3] VIO yaw/pitch/roll (degrees)
    yaw: jax.Array  # [K] optimized yaw (degrees)
    t: jax.Array  # [K,3] optimized translation
    loop_to: jax.Array  # [K] int32 matched earlier keyframe (-1 = none)
    loop_t: jax.Array  # [K,3] relative t in the old frame
    loop_yaw: jax.Array  # [K] relative yaw (degrees)
    used: jax.Array  # [K] bool
    fixed: jax.Array  # [K] bool — gauge anchor(s)


def _rot_yaw_pr(yaw_deg, pitch_deg, roll_deg):
    return lie.ypr2R(jnp.stack([yaw_deg, pitch_deg, roll_deg], axis=-1))


def _residuals(g: GraphArrays, yaw, t):
    """All edge residuals, masked.  Sequential edges (i-k → i, k=1..4):
    r_t = R_i(yaw_i)ᵀ(t_j−t_i) − t_ij^vio, r_yaw = Δyaw − Δyaw^vio (/10);
    loop edges likewise with the measured relative pose and Huber weight."""
    K = yaw.shape[0]
    dt = t.dtype
    pitch = g.ypr_vio[:, 1]
    roll = g.ypr_vio[:, 2]

    def edge_residual(i, j, t_meas, yaw_meas, w):
        """Edge from keyframe i (earlier) to j (later)."""
        Ri = _rot_yaw_pr(yaw[i], pitch[i], roll[i])
        r_t = Ri.T @ (t[j] - t[i]) - t_meas
        r_y = lie.normalize_angle(yaw[j] - yaw[i] - yaw_meas) / 10.0
        return jnp.concatenate([r_t, r_y[None]]) * w

    # --- sequential edges -----------------------------------------------
    rs = []
    for k in range(1, SEQ_BACK + 1):
        i = jnp.maximum(jnp.arange(K) - k, 0)
        j = jnp.arange(K)
        Ri_vio = jax.vmap(_rot_yaw_pr)(g.ypr_vio[i, 0], pitch[i], roll[i])
        t_meas = jnp.einsum("kab,ka->kb", Ri_vio, (g.t_vio[j] - g.t_vio[i]))
        yaw_meas = g.ypr_vio[j, 0] - g.ypr_vio[i, 0]
        w = (g.used[j] & g.used[i] & (j - k >= 0)).astype(dt)
        r = jax.vmap(edge_residual)(i, j, t_meas, yaw_meas, w)
        rs.append(r)

    # --- loop edges -------------------------------------------------------
    has_loop = g.loop_to >= 0
    i = jnp.maximum(g.loop_to, 0)
    j = jnp.arange(K)
    w_loop = (has_loop & g.used[j]).astype(dt)
    r_loop_raw = jax.vmap(edge_residual)(i, j, g.loop_t, g.loop_yaw, w_loop)
    # Huber sqrt-weight w = sqrt(ρ'(s)), ρ = Huber_δ (pose_graph.cpp:431:
    # HuberLoss(0.1) on loop edges).  The weight is FROZEN per linearization
    # (stop_gradient) — classic IRLS; differentiating through w ∝ 1/|r|
    # would cancel the edge's own gradient.
    delta = 0.1
    s = jax.lax.stop_gradient(jnp.sum(r_loop_raw * r_loop_raw, axis=-1))
    hub = jnp.where(s > delta * delta, delta / jnp.sqrt(jnp.maximum(s, 1e-12)), 1.0)
    rs.append(r_loop_raw * jnp.sqrt(hub)[:, None])

    return jnp.concatenate(rs, axis=0)  # [(SEQ_BACK+1)·K, 4]


def _edge_lists(g: GraphArrays):
    """Enumerate all graph edges as flat arrays [E = (SEQ_BACK+1)·K]:
    (i, j, t_meas, yaw_meas, w, is_loop).  Sequential-edge measurements come
    from VIO (pose_graph.cpp:480-495); loop edges carry the verified
    relative pose (:497-514)."""
    K = g.yaw.shape[0]
    dt = g.t.dtype
    pitch = g.ypr_vio[:, 1]
    roll = g.ypr_vio[:, 2]
    i_all, j_all, tm_all, ym_all, w_all, loop_all = [], [], [], [], [], []
    for k in range(1, SEQ_BACK + 1):
        i = jnp.maximum(jnp.arange(K) - k, 0)
        j = jnp.arange(K)
        Ri_vio = jax.vmap(_rot_yaw_pr)(g.ypr_vio[i, 0], pitch[i], roll[i])
        tm = jnp.einsum("kab,ka->kb", Ri_vio, (g.t_vio[j] - g.t_vio[i]))
        ym = g.ypr_vio[j, 0] - g.ypr_vio[i, 0]
        w = (g.used[j] & g.used[i] & (j - k >= 0)).astype(dt)
        i_all.append(i); j_all.append(j); tm_all.append(tm)
        ym_all.append(ym); w_all.append(w)
        loop_all.append(jnp.zeros(K, bool))
    has_loop = g.loop_to >= 0
    i_all.append(jnp.maximum(g.loop_to, 0))
    j_all.append(jnp.arange(K))
    tm_all.append(g.loop_t)
    ym_all.append(g.loop_yaw)
    w_all.append((has_loop & g.used).astype(dt))
    loop_all.append(jnp.ones(K, bool))
    return (jnp.concatenate(i_all), jnp.concatenate(j_all),
            jnp.concatenate(tm_all), jnp.concatenate(ym_all),
            jnp.concatenate(w_all), jnp.concatenate(loop_all))


def _assemble(g: GraphArrays, yaw, t):
    """Analytic sparse GN assembly: per-edge closed-form 4×8 Jacobian blocks
    (each edge touches exactly poses i and j) scatter-added into the dense
    normal equations — replaces materializing the [4E × 4K] `jacfwd`
    Jacobian, which at the reference's 2000-keyframe DB cap (tro p.11) would
    be ~1.3 GB per iteration.  Returns (H [4K,4K], b [4K], cost)."""
    K = yaw.shape[0]
    dt = t.dtype
    deg = jnp.pi / 180.0
    pitch = g.ypr_vio[:, 1]
    roll = g.ypr_vio[:, 2]
    ei, ej, t_meas, yaw_meas, w, is_loop = _edge_lists(g)

    def edge(i, j, tm, ym, w):
        # R_i = Rz(yaw_i)·A_i with A_i = Ry(pitch_i)·Rx(roll_i) fixed from
        # VIO; r_t = A_iᵀ·Rzᵀ·(t_j − t_i) − tm, r_y = Δyaw/10
        A = _rot_yaw_pr(jnp.zeros((), dt), pitch[i], roll[i])  # Rz(0)·Ry·Rx
        psi = yaw[i] * deg
        c, s = jnp.cos(psi), jnp.sin(psi)
        RzT = jnp.stack([
            jnp.stack([c, s, jnp.zeros((), dt)]),
            jnp.stack([-s, c, jnp.zeros((), dt)]),
            jnp.stack([jnp.zeros((), dt), jnp.zeros((), dt), jnp.ones((), dt)]),
        ])
        dRzT = deg * jnp.stack([
            jnp.stack([-s, c, jnp.zeros((), dt)]),
            jnp.stack([-c, -s, jnp.zeros((), dt)]),
            jnp.zeros((3,), dt),
        ])
        RiT = A.T @ RzT
        dtv = t[j] - t[i]
        r_t = RiT @ dtv - tm
        r_y = lie.normalize_angle(yaw[j] - yaw[i] - ym) / 10.0
        r = jnp.concatenate([r_t, r_y[None]]) * w
        # J columns: [yaw_i, yaw_j, t_i(3), t_j(3)]
        dr_t_dyi = A.T @ (dRzT @ dtv)
        J = jnp.zeros((4, 8), dt)
        J = J.at[:3, 0].set(dr_t_dyi)
        J = J.at[3, 0].set(-1.0 / 10.0)
        J = J.at[3, 1].set(1.0 / 10.0)
        J = J.at[:3, 2:5].set(-RiT)
        J = J.at[:3, 5:8].set(RiT)
        return r, J * w

    r, J = jax.vmap(edge)(ei, ej, t_meas, yaw_meas, w)  # [E,4], [E,4,8]

    # Huber sqrt-weight on loop edges (HuberLoss(0.1), pose_graph.cpp:431),
    # frozen per linearization (IRLS) — scales both residual and Jacobian
    delta = 0.1
    s2 = jnp.sum(r * r, axis=-1)
    hub = jnp.where(is_loop & (s2 > delta * delta),
                    delta / jnp.sqrt(jnp.maximum(s2, 1e-12)), 1.0)
    sw = jnp.sqrt(hub).astype(dt)
    r = r * sw[:, None]
    J = J * sw[:, None, None]

    cols = jnp.stack([
        ei, ej,
        K + 3 * ei, K + 3 * ei + 1, K + 3 * ei + 2,
        K + 3 * ej, K + 3 * ej + 1, K + 3 * ej + 2,
    ], axis=-1)  # [E,8]
    JtJ = jnp.einsum("era,erb->eab", J, J)  # [E,8,8]
    Jtr = jnp.einsum("era,er->ea", J, r)  # [E,8]
    H = jnp.zeros((4 * K, 4 * K), dt).at[
        cols[:, :, None], cols[:, None, :]].add(JtJ)
    b = jnp.zeros((4 * K,), dt).at[cols].add(-Jtr)
    return H, b, jnp.sum(r * r)


@highest_matmul_precision
@functools.partial(jax.jit, static_argnames=("iters", "method"))
def optimize_4dof(g: GraphArrays, iters: int = 5,
                  method: str = "analytic") -> GraphArrays:
    """Masked dense GN over [yaw, t] with fixed anchors.

    method="analytic" (default): closed-form per-edge Jacobians scattered
    into the normal equations — O(E) assembly, scales to the 2048-keyframe
    DB cap.  method="jacfwd": forward-mode over the full parameter vector,
    kept as the autodiff reference the analytic path is tested against."""
    K = g.yaw.shape[0]
    dt = g.t.dtype
    free = (g.used & ~g.fixed).astype(dt)
    col_mask = jnp.concatenate([free, jnp.repeat(free, 3)])  # [4K]

    def normal_eqs(yaw, t):
        if method == "analytic":
            H, b, cost = _assemble(g, yaw, t)
            # fixed/unused parameter columns: zero rows/cols, unit diagonal
            H = H * (col_mask[:, None] * col_mask[None, :])
            b = b * col_mask
            return H, b, cost

        def res_of(x):
            dyaw = x[:K] * free
            dtv = x[K:].reshape(K, 3) * free[:, None]
            return _residuals(g, yaw + dyaw, t + dtv).reshape(-1)

        x0 = jnp.zeros((4 * K,), dt)
        r = res_of(x0)
        J = jax.jacfwd(res_of)(x0)
        return J.T @ J, -(J.T @ r), jnp.sum(r * r)

    def step(carry, _):
        yaw, t = carry
        H, b, cost = normal_eqs(yaw, t)
        H = H + jnp.diag(1.0 - col_mask) + 1e-8 * jnp.eye(4 * K, dtype=dt)
        d = jnp.sqrt(jnp.clip(jnp.diagonal(H), 1e-12, None))
        c, low = jax.scipy.linalg.cho_factor(H / d[:, None] / d[None, :])
        dx = jax.scipy.linalg.cho_solve((c, low), b / d) / d
        yaw = yaw + dx[:K] * free
        t = t + dx[K:].reshape(K, 3) * free[:, None]
        return (yaw, t), cost

    (yaw, t), costs = jax.lax.scan(step, (g.yaw, g.t), None, length=iters)
    return g._replace(yaw=yaw, t=t)


def drift_from(g: GraphArrays, cur: int):
    """Compute (yaw_drift, t_drift) after optimization
    (pose_graph.cpp:549-557): the correction mapping VIO poses to optimized
    poses at the current keyframe."""
    yaw_drift = lie.normalize_angle(g.yaw[cur] - g.ypr_vio[cur, 0])
    R_drift = lie.ypr2R(jnp.stack([yaw_drift, jnp.zeros_like(yaw_drift),
                                   jnp.zeros_like(yaw_drift)]))
    t_drift = g.t[cur] - R_drift @ g.t_vio[cur]
    return yaw_drift, R_drift, t_drift
