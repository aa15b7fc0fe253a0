"""Global structure-from-motion for initialization.

TPU-native re-expression of vins_estimator/src/initial/initial_sfm.cpp
(GlobalSFM::construct :117-312): given a reference frame l with identity pose
and the relative pose l↔newest from the essential solve, sweep PnP +
triangulation forward and backward, then run full visual BA.  The reference's
dynamic point bookkeeping becomes masked fixed-shape tensors; cv::solvePnP
becomes a batched Gauss-Newton pose refinement; triangulations are batched
DLT eigen-solves.

All poses here are CAMERA poses (world←camera), like the reference's sfm.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie
from ..core.linalg import spd_solve
from ..solver.ba import BAState, ba_solve


def triangulate_pair(
    p_a, q_a, p_b, q_b,  # camera poses (world←cam)
    x_a, x_b,  # [L,2] normalized observations
):
    """Batched two-view DLT triangulation (initial_sfm.cpp:5-19).
    Returns world points [L,3] and positive-depth validity."""
    dt = p_a.dtype

    def proj_rows(p, q, x):
        R = lie.q2R(lie.qconj(q))  # cam←world rotation
        t = -R @ p
        P = jnp.concatenate([R, t[:, None]], axis=1)  # [3,4]
        r0 = x[:, 0:1] * P[2][None] - P[0][None]
        r1 = x[:, 1:2] * P[2][None] - P[1][None]
        return jnp.stack([r0, r1], axis=1)  # [L,2,4]

    A = jnp.concatenate([proj_rows(p_a, q_a, x_a), proj_rows(p_b, q_b, x_b)], axis=1)
    _, V = jnp.linalg.eigh(jnp.einsum("lij,lik->ljk", A, A))
    Xh = V[..., 0]
    w = Xh[..., 3]
    X = Xh[..., :3] / jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)[..., None]

    def depth(p, q, X):
        return lie.qrotate(lie.qconj(q), X - p)[..., 2]

    za = jax.vmap(lambda x_, p_, q_: depth(p_, q_, x_), in_axes=(0, None, None))(X, p_a, q_a)
    zb = jax.vmap(lambda x_, p_, q_: depth(p_, q_, x_), in_axes=(0, None, None))(X, p_b, q_b)
    return X, (za > 0.1) & (zb > 0.1)


def triangulate_multiview(
    p_wc: jax.Array,  # [F,3] camera positions
    q_wc: jax.Array,  # [F,4]
    obs: jax.Array,  # [L,F,2]
    valid: jax.Array,  # [L,F]
):
    """Masked multi-view DLT (feature_manager.cpp:202-257 generalized to all
    observing frames).  Returns world points [L,3] + ok mask."""
    L, F = valid.shape
    dt = p_wc.dtype
    R_cw = jax.vmap(lambda q: lie.q2R(lie.qconj(q)))(q_wc)  # [F,3,3]
    t_cw = -jnp.einsum("fij,fj->fi", R_cw, p_wc)
    P = jnp.concatenate([R_cw, t_cw[..., None]], axis=-1)  # [F,3,4]

    r0 = obs[..., 0:1] * P[None, :, 2] - P[None, :, 0]  # [L,F,4]
    r1 = obs[..., 1:2] * P[None, :, 2] - P[None, :, 1]
    m = valid[..., None].astype(dt)
    A = jnp.concatenate([r0 * m, r1 * m], axis=1)  # [L,2F,4]
    AtA = jnp.einsum("lij,lik->ljk", A, A)
    _, V = jnp.linalg.eigh(AtA)
    Xh = V[..., 0]
    w = Xh[..., 3]
    X = Xh[..., :3] / jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)[..., None]

    z = jnp.einsum("fij,lj->lfi", R_cw, X)[..., 2] + t_cw[None, :, 2]  # [L,F]
    nobs = jnp.sum(valid, axis=1)
    ok = (nobs >= 2) & (jnp.sum((z > 0.1) & valid, axis=1) == nobs)
    return X, ok


def pnp_gn(
    X: jax.Array,  # [L,3] world points
    x: jax.Array,  # [L,2] normalized observations
    w: jax.Array,  # [L] weights (0 = unused)
    p0: jax.Array, q0: jax.Array,  # initial camera pose (world←cam)
    iters: int = 10,
):
    """Gauss-Newton PnP with an extrinsic guess (cv::solvePnP iterative,
    initial_sfm.cpp:22-72).  Fixed iterations, masked points."""
    dt = p0.dtype

    def residual(dx, p, q):
        p_, q_ = lie.pose_boxplus(p, q, dx[0:3], dx[3:6])
        Pc = jax.vmap(lambda Xl: lie.qrotate(lie.qconj(q_), Xl - p_))(X)
        z = Pc[:, 2]
        zs = jnp.where(jnp.abs(z) < 1e-6, jnp.where(z >= 0, 1e-6, -1e-6), z)
        return (Pc[:, :2] / zs[:, None] - x) * w[:, None]

    def step(carry, _):
        p, q = carry
        dx0 = jnp.zeros((6,), dt)
        r = residual(dx0, p, q).reshape(-1)
        J = jax.jacfwd(lambda dx: residual(dx, p, q).reshape(-1))(dx0)
        H = J.T @ J + 1e-8 * jnp.eye(6, dtype=dt)
        dx = spd_solve(H, -J.T @ r)
        p, q = lie.pose_boxplus(p, q, dx[0:3], dx[3:6])
        return (p, q), None

    (p, q), _ = jax.lax.scan(step, (p0, q0), None, length=iters)
    n_used = jnp.sum(w > 0)
    return p, q, n_used >= 15  # initial_sfm.cpp:38: needs ≥15 points


class SfmResult(NamedTuple):
    p_wc: jax.Array  # [F,3] camera poses
    q_wc: jax.Array  # [F,4]
    pts: jax.Array  # [L,3] world points
    has_pt: jax.Array  # [L] bool
    ok: jax.Array  # [] bool


def construct_sfm(
    obs: jax.Array,  # [L,F,2] normalized feature tracks
    valid: jax.Array,  # [L,F]
    l: jax.Array,  # [] int32 reference frame (identity pose)
    R_rel: jax.Array,  # [3,3] pose of frame F-1 in frame l
    t_rel: jax.Array,  # [3] (unit scale)
    ba_iters: int = 12,
) -> SfmResult:
    """GlobalSFM::construct (:117-312) with the same sweep order, as one
    jitted program.  Dynamic frame index l is handled by `where` gates on a
    static frame sweep."""
    L, F, _ = obs.shape
    dt = obs.dtype
    qid = jnp.asarray([1.0, 0, 0, 0], dt)

    p = jnp.zeros((F, 3), dt)
    q = jnp.tile(qid[None], (F, 1))
    p = p.at[F - 1].set(t_rel)
    q = q.at[F - 1].set(lie.R2q(R_rel))

    pts = jnp.zeros((L, 3), dt)
    has = jnp.zeros((L,), bool)

    def tri_between(p, q, pts, has, i, j, gate):
        """Triangulate landmarks seen in frames i and j that lack points."""
        sel = valid[:, i] & valid[:, j] & (~has) & gate
        X, ok = triangulate_pair(p[i], q[i], p[j], q[j], obs[:, i], obs[:, j])
        new = sel & ok
        pts = jnp.where(new[:, None], X, pts)
        has = has | new
        return pts, has

    # --- sweep 1: forward from l — PnP on i (init from i-1), then tri(i, F-1)
    # (the i = l iteration performs the seed triangulation l ↔ F-1, :156-160)
    for i in range(F - 1):
        gate_pnp = (jnp.asarray(i) > l)
        w = (valid[:, i] & has & gate_pnp).astype(dt)
        p_i, q_i, okp = pnp_gn(pts, obs[:, i], w, p[i - 1 if i > 0 else 0], q[i - 1 if i > 0 else 0])
        upd = gate_pnp & okp
        p = p.at[i].set(jnp.where(upd, p_i, p[i]))
        q = q.at[i].set(jnp.where(upd, q_i, q[i]))
        pts, has = tri_between(p, q, pts, has, i, F - 1, jnp.asarray(i) >= l)

    # --- sweep 2: tri(l, i) for l < i < F-1 (:181-196) ---------------------
    for i in range(1, F - 1):
        # anchor frame l is dynamic: gather its pose
        p_l = p[l]
        q_l = q[l]
        sel = valid[:, l] & valid[:, i] & (~has) & (jnp.asarray(i) > l)
        obsl = obs[:, l]
        X, okt = triangulate_pair(p_l, q_l, p[i], q[i], obsl, obs[:, i])
        new = sel & okt
        pts = jnp.where(new[:, None], X, pts)
        has = has | new

    # --- sweep 3: backward from l — PnP init from i+1, tri(i, l) (:198-217)
    for i in range(F - 2, -1, -1):
        gate = jnp.asarray(i) < l
        w = (valid[:, i] & has & gate).astype(dt)
        p_i, q_i, okp = pnp_gn(pts, obs[:, i], w, p[i + 1], q[i + 1])
        upd = gate & okp
        p = p.at[i].set(jnp.where(upd, p_i, p[i]))
        q = q.at[i].set(jnp.where(upd, q_i, q[i]))
        p_l = p[l]
        q_l = q[l]
        obsl = obs[:, l]
        sel = valid[:, i] & valid[:, l] & (~has) & gate
        X, okt = triangulate_pair(p[i], q[i], p_l, q_l, obs[:, i], obsl)
        new = sel & okt
        pts = jnp.where(new[:, None], X, pts)
        has = has | new

    # --- sweep 4: triangulate leftovers from all their observations (:219-230)
    X_all, ok_all = triangulate_multiview(p, q, obs, valid)
    new = (~has) & ok_all & (jnp.sum(valid, axis=1) >= 2)
    pts = jnp.where(new[:, None], X_all, pts)
    has = has | new

    # --- full BA (:232-289): pose l fixed, translations of l and F-1 fixed -
    frame_ids = jnp.arange(F)
    fix_pose = frame_ids == l
    fix_pos = fix_pose | (frame_ids == F - 1)
    st, cost = ba_solve(
        BAState(p=p, q=q, pts=pts), obs, valid & has[:, None],
        fix_pose=fix_pose, fix_pos=fix_pos, pt_mask=has, iters=ba_iters,
    )

    n_pts = jnp.sum(has)
    ok = n_pts >= 10
    return SfmResult(p_wc=st.p, q_wc=st.q, pts=st.pts, has_pt=has, ok=ok)
