"""Batched visual-only bundle adjustment (world-point parameterization).

Used by the initializer's global SfM (initial_sfm.cpp:232-289: Ceres BA over
per-frame quaternion+translation and 3D points, pose l fully fixed and the
translations of l and F-1 fixed as gauge) and reusable as the distributed
Schur-BA workload.  Pure fixed-shape LM with 3×3 landmark-block Schur
elimination — landmark work is embarrassingly parallel over L, the reduced
camera system is a dense ~6F solve.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie
from ..core.precision import highest_matmul_precision
from ..core.linalg import inv3x3


class BAState(NamedTuple):
    p: jax.Array  # [F,3] camera position in world
    q: jax.Array  # [F,4] world←camera quaternion
    pts: jax.Array  # [L,3] world points


def _reproj_local(dx, p, q, X, obs):
    """Residual of one observation as a function of a 9-dim local
    perturbation [pose 6, point 3]."""
    p, q = lie.pose_boxplus(p, q, dx[0:3], dx[3:6])
    X = X + dx[6:9]
    Pc = lie.qrotate(lie.qconj(q), X - p)
    z = Pc[2]
    zs = jnp.where(jnp.abs(z) < 1e-6, jnp.where(z >= 0, 1e-6, -1e-6), z)
    return Pc[:2] / zs - obs


def _blocks(state: BAState, obs, valid):
    """Residuals + local Jacobians over the [L,F] factor grid."""
    L, F = valid.shape
    dx0 = jnp.zeros((9,), state.p.dtype)

    def per(p, q, X, ob):
        fn = lambda dx: _reproj_local(dx, p, q, X, ob)
        return fn(dx0), jax.jacfwd(fn)(dx0)

    over_f = jax.vmap(per, in_axes=(0, 0, None, 0))
    over_lf = jax.vmap(over_f, in_axes=(None, None, 0, 0))
    r, J = over_lf(state.p, state.q, state.pts, obs)  # [L,F,2], [L,F,2,9]
    m = valid[..., None].astype(r.dtype)
    return r * m, J * m[..., None]


def _cost(state: BAState, obs, valid):
    r, _ = _blocks(state, obs, valid)
    return 0.5 * jnp.sum(r * r)


def _normal_eqs(state: BAState, obs, valid, pose_col_mask):
    L, F = valid.shape
    dt = state.p.dtype
    r, J = _blocks(state, obs, valid)
    Jp = J[..., 0:6]  # [L,F,2,6]
    Jx = J[..., 6:9]  # [L,F,2,3]

    eyeF = jnp.eye(F, dtype=dt)
    Jp_dense = jnp.einsum("lfrk,fg->lfrgk", Jp, eyeF).reshape(L, F, 2, 6 * F)
    Jp_dense = Jp_dense * pose_col_mask[None, None, None, :]

    H_xx = jnp.einsum("lfrd,lfre->de", Jp_dense, Jp_dense)
    b_x = -jnp.einsum("lfrd,lfr->d", Jp_dense, r)
    H_xl = jnp.einsum("lfrd,lfri->dli", Jp_dense, Jx)  # [6F,L,3]
    H_ll = jnp.einsum("lfri,lfrj->lij", Jx, Jx)  # [L,3,3]
    b_l = -jnp.einsum("lfri,lfr->li", Jx, r)  # [L,3]
    return H_xx, b_x, H_xl, H_ll, b_l


def _damped_solve(H_xx, b_x, H_xl, H_ll, b_l, mu, pose_col_mask, pt_mask):
    F6 = H_xx.shape[0]
    dt = H_xx.dtype
    L = H_ll.shape[0]
    I3 = jnp.eye(3, dtype=dt)

    d_ll = jnp.maximum(jnp.diagonal(H_ll, axis1=1, axis2=2), 1e-6)  # [L,3]
    H_ll_d = H_ll + (mu * d_ll + 1e-8)[:, :, None] * I3[None]
    # zero-information (invisible/fixed) landmarks get identity blocks
    H_ll_d = jnp.where(pt_mask[:, None, None], H_ll_d, I3[None])
    inv_ll = inv3x3(H_ll_d)
    inv_ll = jnp.where(pt_mask[:, None, None], inv_ll, jnp.zeros_like(inv_ll))

    H_red = H_xx - jnp.einsum("dli,lij,elj->de", H_xl, inv_ll, H_xl)
    b_red = b_x - jnp.einsum("dli,lij,lj->d", H_xl, inv_ll, b_l)

    H_red = H_red + mu * jnp.diag(jnp.diagonal(H_red))
    H_red = H_red + jnp.diag(1.0 - pose_col_mask) + 1e-9 * jnp.eye(F6, dtype=dt)
    d = jnp.sqrt(jnp.clip(jnp.diagonal(H_red), 1e-12, None))
    Hn = H_red / d[:, None] / d[None, :]
    c, low = jax.scipy.linalg.cho_factor(Hn)
    dx = jax.scipy.linalg.cho_solve((c, low), b_red / d) / d

    d_pt = jnp.einsum("lij,lj->li", inv_ll, b_l - jnp.einsum("dli,d->li", H_xl, dx))
    return dx, d_pt


@highest_matmul_precision
def ba_solve(
    state: BAState,
    obs: jax.Array,  # [L,F,2] normalized-plane observations
    valid: jax.Array,  # [L,F]
    fix_pose: jax.Array,  # [F] bool — all 6 dof held
    fix_pos: jax.Array,  # [F] bool — translation held (gauge for scale)
    pt_mask: jax.Array,  # [L] bool — landmarks to optimize
    iters: int = 10,
    mu_init: float = 1e-4,
):
    """Fixed-iteration LM bundle adjustment.  Returns (state, final cost)."""
    F = state.p.shape[0]
    dtt = state.p.dtype
    valid = valid & pt_mask[:, None]

    pose_col_mask = jnp.ones((6 * F,), dtt).reshape(F, 6)
    pose_col_mask = pose_col_mask * (1.0 - fix_pose.astype(dtt))[:, None]
    pos_keep = 1.0 - fix_pos.astype(dtt)
    pose_col_mask = pose_col_mask.at[:, 0:3].mul(pos_keep[:, None])
    pose_col_mask = pose_col_mask.reshape(6 * F)

    cost0 = _cost(state, obs, valid)

    def step(carry, _):
        st, mu, cost = carry
        H_xx, b_x, H_xl, H_ll, b_l = _normal_eqs(st, obs, valid, pose_col_mask)
        dx, d_pt = _damped_solve(H_xx, b_x, H_xl, H_ll, b_l, mu, pose_col_mask, pt_mask)
        d_pose = dx.reshape(F, 6)
        p_new, q_new = lie.pose_boxplus(st.p, st.q, d_pose[:, :3], d_pose[:, 3:])
        cand = BAState(p=p_new, q=q_new, pts=st.pts + d_pt)
        cand_cost = _cost(cand, obs, valid)
        accept = cand_cost < cost
        st = jax.tree.map(lambda a, b_: jnp.where(accept, b_, a), st, cand)
        mu = jnp.clip(jnp.where(accept, mu * 0.3, mu * 10.0), 1e-10, 1e8)
        return (st, mu, jnp.where(accept, cand_cost, cost)), accept

    (state, _, cost), _ = jax.lax.scan(
        step, (state, jnp.asarray(mu_init, dtt), cost0), None, length=iters
    )
    return state, cost
