"""Masked Levenberg-Marquardt solver with Schur landmark elimination.

Replaces Ceres (estimator.cpp:803-818: DENSE_SCHUR + DOGLEG, ≤8 iterations)
with a fixed-iteration, fully-jitted LM loop:

  per iteration:
    1. evaluate all factor residuals + local Jacobians (relinearize)
    2. Cauchy IRLS weights on projection factors (CauchyLoss(1.0),
       estimator.cpp:694)
    3. assemble dense normal equations on the MXU (JᵀJ matmuls — the
       reference's 4-pthread Hessian assembly, marginalization_factor.cpp:
       232-261, becomes one einsum)
    4. Schur-eliminate inverse depths (diagonal landmark block)
    5. damped solve of the ~(15F+7)-dim reduced camera system (Cholesky,
       Jacobi-preconditioned so float32 on TPU stays well-conditioned)
    6. accept/reject step, adapt damping

Everything is fixed-shape; invalid factors/landmarks are masked.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..imu.preintegration import Preintegration
from .factors import densify_imu, densify_projection, imu_blocks, projection_blocks
from .problem import FeatureObs, Layout, Prior, WindowState, prior_residual, state_boxplus


def _psum(x, axis_name):
    """Cross-shard reduction when the landmark axis is sharded over a mesh
    axis (distributed Schur: per-shard JᵀJ contributions are psum-reduced
    into the replicated camera system); identity when running single-shard."""
    return x if axis_name is None else jax.lax.psum(x, axis_name)


class SolverOptions(NamedTuple):
    iters: int = 8
    mu_init: float = 1e-4
    mu_up: float = 10.0
    mu_down: float = 0.3
    focal: float = 460.0
    max_imu_dt: float = 10.0


class SolveInfo(NamedTuple):
    cost0: jax.Array
    cost: jax.Array
    mu: jax.Array
    accepted: jax.Array  # [iters] bool


def _cauchy_weights(r: jax.Array, valid: jax.Array):
    """IRLS sqrt-weights for CauchyLoss(1.0): ρ(s)=log(1+s) ⇒ ρ'(s)=1/(1+s)."""
    s = jnp.sum(r * r, axis=-1)
    w = 1.0 / (1.0 + s)
    return jnp.sqrt(w) * valid.astype(r.dtype), s


def compute_cost(
    state: WindowState, lam: jax.Array, obs: FeatureObs, pres: Preintegration,
    prior: Prior, gravity: jax.Array, layout: Layout, opts: SolverOptions,
    axis_name: str | None = None, relo_eval=None,
) -> jax.Array:
    """Total robustified cost at a state (for LM accept/reject).
    `relo_eval`: optional (relo_p, relo_q, relo_pt, relo_valid, relo_on)
    adding the relocalization projection factors (estimator.cpp:769-801)."""
    obs = obs._replace(inv_depth=lam)
    proj = projection_blocks_residual_only(state, obs, opts.focal)
    s = jnp.sum(proj.r * proj.r, axis=-1)
    cost_p = _psum(jnp.sum(jnp.where(proj.valid, jnp.log1p(s), 0.0)), axis_name)
    imu = imu_blocks(state, pres, gravity, opts.max_imu_dt)
    cost_i = jnp.sum(imu.r * imu.r)
    r_pr = prior_residual(prior, state, layout)
    cost = 0.5 * (cost_p + cost_i + jnp.sum(r_pr * r_pr))
    if relo_eval is not None:
        relo_p, relo_q, relo_pt, relo_valid, relo_on = relo_eval
        rr, rv = _relo_residual_only(state, obs, relo_p, relo_q, relo_pt,
                                     relo_valid, opts.focal)
        sr = jnp.sum(rr * rr, axis=-1)
        cost = cost + 0.5 * relo_on * _psum(
            jnp.sum(jnp.where(rv, jnp.log1p(sr), 0.0)), axis_name)
    return cost


def _relo_residual_only(state, obs, relo_p, relo_q, relo_pt, relo_valid,
                        focal):
    """Residual-only relo-factor evaluation (no jacfwd) for cost checks."""
    from .factors import PROJ_DX, _proj_residual_local

    anchor = obs.anchor
    p_i = state.p[anchor]
    q_i = state.q[anchor]
    pt_i = jnp.take_along_axis(obs.pt, anchor[:, None, None], axis=1)[:, 0]
    vel_i = jnp.take_along_axis(obs.vel, anchor[:, None, None], axis=1)[:, 0]
    toff_i = jnp.take_along_axis(obs.toff, anchor[:, None], axis=1)[:, 0]
    dx0 = jnp.zeros((PROJ_DX,), state.p.dtype)

    def one(p_i, q_i, pt_i, vel_i, toff_i, lam, pt_old):
        return _proj_residual_local(
            dx0, p_i, q_i, relo_p, relo_q, state.tic, state.qic, lam,
            state.td, pt_i, vel_i, toff_i, pt_old,
            jnp.zeros_like(pt_old), jnp.zeros_like(toff_i))

    r = jax.vmap(one)(p_i, q_i, pt_i, vel_i, toff_i, obs.inv_depth, relo_pt)
    valid = relo_valid & obs.active & (obs.inv_depth > 0)
    w = focal / 1.5
    return r * w * valid[:, None].astype(r.dtype), valid


def projection_blocks_residual_only(state, obs, focal):
    """Residual-only projection evaluation (no jacfwd) for cost checks."""
    from .factors import _proj_residual_local, PROJ_DX

    L, F = obs.valid.shape
    anchor = obs.anchor
    p_i = state.p[anchor]
    q_i = state.q[anchor]
    pt_i = jnp.take_along_axis(obs.pt, anchor[:, None, None], axis=1)[:, 0]
    vel_i = jnp.take_along_axis(obs.vel, anchor[:, None, None], axis=1)[:, 0]
    toff_i = jnp.take_along_axis(obs.toff, anchor[:, None], axis=1)[:, 0]
    dx0 = jnp.zeros((PROJ_DX,), dtype=state.p.dtype)

    def per_factor(p_i, q_i, pt_i, vel_i, toff_i, lam, p_j, q_j, pt_j, vel_j, toff_j):
        return _proj_residual_local(
            dx0, p_i, q_i, p_j, q_j, state.tic, state.qic, lam, state.td,
            pt_i, vel_i, toff_i, pt_j, vel_j, toff_j,
        )

    over_frames = jax.vmap(per_factor, in_axes=(None,) * 6 + (0, 0, 0, 0, 0))
    over_all = jax.vmap(over_frames, in_axes=(0,) * 6 + (None, None, 0, 0, 0))
    r = over_all(
        p_i, q_i, pt_i, vel_i, toff_i, obs.inv_depth,
        state.p, state.q, obs.pt, obs.vel, obs.toff,
    )
    frame_idx = jnp.arange(F)[None, :]
    valid = obs.valid & obs.active[:, None] & (frame_idx != anchor[:, None])
    w = focal / 1.5

    class _R(NamedTuple):
        r: jax.Array
        valid: jax.Array

    return _R(r * w * valid[..., None].astype(r.dtype), valid)


def build_normal_equations(
    state: WindowState, lam: jax.Array, obs: FeatureObs, pres: Preintegration,
    prior: Prior, gravity: jax.Array, layout: Layout, opts: SolverOptions,
    col_mask: jax.Array,  # [dim_ext] 1 = free, 0 = held fixed
    axis_name: str | None = None, relo_eval=None,
):
    """Assemble H (reduced-ready), b, and the landmark blocks.  With
    `relo_eval` the system has 6 extra columns (the relo pose block) and
    the relo projection factors contribute (estimator.cpp:769-801)."""
    obs = obs._replace(inv_depth=lam)
    dt = state.p.dtype
    n_ext = 6 if relo_eval is not None else 0
    dim_ext = layout.dim_x + n_ext

    def pad_cols(J):
        if n_ext == 0:
            return J
        return jnp.concatenate(
            [J, jnp.zeros(J.shape[:-1] + (n_ext,), J.dtype)], axis=-1)

    proj = projection_blocks(state, obs, opts.focal)
    sw, s = _cauchy_weights(proj.r, proj.valid)
    r_p = proj.r * sw[..., None]
    proj = proj._replace(J=proj.J * sw[..., None, None])
    J_dense, J_lam = densify_projection(proj, obs, layout)
    J_dense = pad_cols(J_dense)
    # hold inactive state columns fixed (e.g. extrinsic/td when not estimated)
    J_dense = J_dense * col_mask[None, None, None, :]

    imu = imu_blocks(state, pres, gravity, opts.max_imu_dt)
    J_imu = pad_cols(densify_imu(imu, layout)) * col_mask[None, None, :]

    r_prior = prior_residual(prior, state, layout)
    J_prior = pad_cols(
        jnp.where(prior.valid, prior.J, jnp.zeros_like(prior.J))
    ) * col_mask[None, :]

    # projection contributions are per-landmark-shard; IMU/prior replicated
    H_shard = jnp.einsum("lfrd,lfre->de", J_dense, J_dense)
    b_shard = jnp.einsum("lfrd,lfr->d", J_dense, r_p)
    H_xl = jnp.einsum("lfrd,lfr->dl", J_dense, J_lam)
    H_ll = jnp.einsum("lfr,lfr->l", J_lam, J_lam)
    b_l = -jnp.einsum("lfr,lfr->l", J_lam, r_p)

    if relo_eval is not None:
        from .factors import densify_relo, relo_blocks

        relo_p, relo_q, relo_pt, relo_valid, relo_on = relo_eval
        rb = relo_blocks(state, obs, relo_p, relo_q, relo_pt, relo_valid,
                         opts.focal)
        rsw, _ = _cauchy_weights(rb.r, rb.valid)
        rsw = rsw * relo_on  # dynamic gate: zero weight ⇒ no contribution
        r_r = rb.r * rsw[:, None]
        rb = rb._replace(J=rb.J * rsw[:, None, None])
        J_r, J_r_lam = densify_relo(rb, obs, layout)
        J_r = J_r * col_mask[None, None, :]
        H_shard = H_shard + jnp.einsum("lrd,lre->de", J_r, J_r)
        b_shard = b_shard + jnp.einsum("lrd,lr->d", J_r, r_r)
        H_xl = H_xl + jnp.einsum("lrd,lr->dl", J_r, J_r_lam)
        H_ll = H_ll + jnp.einsum("lr,lr->l", J_r_lam, J_r_lam)
        b_l = b_l - jnp.einsum("lr,lr->l", J_r_lam, r_r)

    # one fused collective for the shard-reduced assembly (psum is linear;
    # each separate psum is a barrier)
    H_shard, b_shard = _psum((H_shard, b_shard), axis_name) \
        if axis_name is not None else (H_shard, b_shard)
    H = (
        H_shard
        + jnp.einsum("kmd,kme->de", J_imu, J_imu)
        + J_prior.T @ J_prior
    )
    b = -(
        b_shard
        + jnp.einsum("kmd,km->d", J_imu, imu.r)
        + J_prior.T @ r_prior
    )

    # identity rows for masked columns keep H nonsingular with dx = 0 there
    H = H + jnp.diag(1.0 - col_mask)
    return H, b, H_xl, H_ll, b_l


def _damped_solve(H, b, H_xl, H_ll, b_l, mu, dtype, axis_name=None):
    """Schur-reduced, Marquardt-damped, Jacobi-preconditioned solve."""
    dim_x = H.shape[0]
    H_d = H + mu * jnp.diag(jnp.diagonal(H)) + 1e-10 * jnp.eye(dim_x, dtype=dtype)
    H_ll_d = H_ll * (1.0 + mu)
    inv_ll = jnp.where(H_ll > 1e-12, 1.0 / (H_ll_d + 1e-12), 0.0)

    S_H = (H_xl * inv_ll[None, :]) @ H_xl.T
    S_b = H_xl @ (inv_ll * b_l)
    if axis_name is not None:
        S_H, S_b = jax.lax.psum((S_H, S_b), axis_name)
    H_red = H_d - S_H
    b_red = b - S_b

    d = jnp.sqrt(jnp.clip(jnp.diagonal(H_red), 1e-12, None))
    Hn = H_red / d[:, None] / d[None, :]
    bn = b_red / d
    # Cholesky jitter on the UNIT-diagonal system must clear the dtype's
    # roundoff floor (f32 needs ~1e-6; 1e-9 is below f32 eps and lets
    # near-null gauge directions blow up the step)
    jit_eps = 1e-9 if dtype == jnp.float64 else 3e-6
    c, low = jax.scipy.linalg.cho_factor(Hn + jit_eps * jnp.eye(dim_x, dtype=dtype))
    dxn = jax.scipy.linalg.cho_solve((c, low), bn)
    dx = dxn / d

    d_lam = inv_ll * (b_l - H_xl.T @ dx)
    return dx, d_lam


def solve_window(
    state: WindowState,
    obs: FeatureObs,
    pres: Preintegration,
    prior: Prior,
    gravity: jax.Array,
    layout: Layout,
    opts: SolverOptions = SolverOptions(),
    estimate_extrinsic: bool = False,
    estimate_td: bool = False,
    extra_diag: jax.Array | None = None,
    axis_name: str | None = None,
    relo=None,
):
    """Run the fixed-iteration LM loop; returns (state, inv_depth, info)
    — or (state, inv_depth, info, relo_p, relo_q) when `relo` is given.

    `extra_diag` (shape [dim_x]) adds to the H diagonal — used for gauge
    pinning in tests and for soft-fixing states.  With `axis_name`, the
    landmark axis of `obs` is sharded over that mesh axis and the reduced
    camera system is psum-assembled (distributed Schur BA).

    `relo` = (relo_p0, relo_q0, relo_pt [L,2], relo_valid [L], relo_on):
    adds the relocalization pose as a free 6-dim block with projection
    factors tying window landmarks to the old keyframe's observations
    (estimator.cpp:769-801).  `relo_on` is a dynamic 0/1 gate so ONE
    compiled program serves frames with and without a relo match."""
    dt = state.p.dtype
    dim_x = layout.dim_x
    with_relo = relo is not None
    n_ext = 6 if with_relo else 0

    col_mask = jnp.ones((dim_x + n_ext,), dt)
    if not estimate_extrinsic:
        col_mask = col_mask.at[layout.ext_off : layout.ext_off + 6].set(0.0)
    if not estimate_td:
        col_mask = col_mask.at[layout.td_off].set(0.0)
    if with_relo:
        relo_p0, relo_q0, relo_pt, relo_valid, relo_on = relo
        relo_on = jnp.asarray(relo_on, dt)
        col_mask = col_mask.at[dim_x:].set(relo_on)

    extra = jnp.zeros((dim_x,), dt) if extra_diag is None else extra_diag.astype(dt)
    if with_relo:
        extra = jnp.concatenate([extra, jnp.zeros((6,), dt)])

    def cost_fn(state, lam, rp, rq):
        re = (rp, rq, relo_pt, relo_valid, relo_on) if with_relo else None
        return compute_cost(state, lam, obs, pres, prior, gravity, layout,
                            opts, axis_name, relo_eval=re)

    lam0 = obs.inv_depth
    rp0 = relo_p0 if with_relo else jnp.zeros(3, dt)
    rq0 = relo_q0 if with_relo else jnp.asarray([1.0, 0, 0, 0], dt)
    cost0 = cost_fn(state, lam0, rp0, rq0)

    def step(carry, _):
        state, lam, rp, rq, mu, cost = carry
        re = (rp, rq, relo_pt, relo_valid, relo_on) if with_relo else None
        H, b, H_xl, H_ll, b_l = build_normal_equations(
            state, lam, obs, pres, prior, gravity, layout, opts, col_mask,
            axis_name, relo_eval=re,
        )
        H = H + jnp.diag(extra)
        dx, d_lam = _damped_solve(H, b, H_xl, H_ll, b_l, mu, dt, axis_name)
        cand_state = state_boxplus(state, dx[:dim_x], layout)
        if with_relo:
            from ..core import lie as _lie

            cand_rp, cand_rq = _lie.pose_boxplus(
                rp, rq, dx[dim_x:dim_x + 3], dx[dim_x + 3:dim_x + 6])
        else:
            cand_rp, cand_rq = rp, rq
        cand_lam = lam + d_lam
        cand_cost = cost_fn(cand_state, cand_lam, cand_rp, cand_rq)
        accept = cand_cost < cost
        new_state = jax.tree.map(lambda a, b_: jnp.where(accept, b_, a), state, cand_state)
        new_lam = jnp.where(accept, cand_lam, lam)
        new_rp = jnp.where(accept, cand_rp, rp)
        new_rq = jnp.where(accept, cand_rq, rq)
        new_mu = jnp.where(accept, mu * opts.mu_down, mu * opts.mu_up)
        new_mu = jnp.clip(new_mu, 1e-10, 1e8)
        new_cost = jnp.where(accept, cand_cost, cost)
        return (new_state, new_lam, new_rp, new_rq, new_mu, new_cost), accept

    (state, lam, rp, rq, mu, cost), accepted = jax.lax.scan(
        step, (state, lam0, rp0, rq0, jnp.asarray(opts.mu_init, dt), cost0),
        None, length=opts.iters,
    )
    info = SolveInfo(cost0=cost0, cost=cost, mu=mu, accepted=accepted)
    if with_relo:
        return state, lam, info, rp, rq
    return state, lam, info
