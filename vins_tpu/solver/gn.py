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
    axis_name: str | None = None,
) -> jax.Array:
    """Total robustified cost at a state (for LM accept/reject)."""
    obs = obs._replace(inv_depth=lam)
    proj = projection_blocks_residual_only(state, obs, opts.focal)
    s = jnp.sum(proj.r * proj.r, axis=-1)
    cost_p = _psum(jnp.sum(jnp.where(proj.valid, jnp.log1p(s), 0.0)), axis_name)
    imu = imu_blocks(state, pres, gravity, opts.max_imu_dt)
    cost_i = jnp.sum(imu.r * imu.r)
    r_pr = prior_residual(prior, state, layout)
    return 0.5 * (cost_p + cost_i + jnp.sum(r_pr * r_pr))


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
    col_mask: jax.Array,  # [dim_x] 1 = free, 0 = held fixed
    axis_name: str | None = None,
):
    """Assemble H (reduced-ready), b, and the landmark blocks."""
    obs = obs._replace(inv_depth=lam)
    dt = state.p.dtype

    proj = projection_blocks(state, obs, opts.focal)
    sw, s = _cauchy_weights(proj.r, proj.valid)
    r_p = proj.r * sw[..., None]
    proj = proj._replace(J=proj.J * sw[..., None, None])
    J_dense, J_lam = densify_projection(proj, obs, layout)
    # hold inactive state columns fixed (e.g. extrinsic/td when not estimated)
    J_dense = J_dense * col_mask[None, None, None, :]

    imu = imu_blocks(state, pres, gravity, opts.max_imu_dt)
    J_imu = densify_imu(imu, layout) * col_mask[None, None, :]

    r_prior = prior_residual(prior, state, layout)
    J_prior = jnp.where(prior.valid, prior.J, jnp.zeros_like(prior.J)) * col_mask[None, :]

    # projection contributions are per-landmark-shard; IMU/prior replicated
    H = (
        _psum(jnp.einsum("lfrd,lfre->de", J_dense, J_dense), axis_name)
        + jnp.einsum("kmd,kme->de", J_imu, J_imu)
        + J_prior.T @ J_prior
    )
    b = -(
        _psum(jnp.einsum("lfrd,lfr->d", J_dense, r_p), axis_name)
        + jnp.einsum("kmd,km->d", J_imu, imu.r)
        + J_prior.T @ r_prior
    )
    H_xl = jnp.einsum("lfrd,lfr->dl", J_dense, J_lam)
    H_ll = jnp.einsum("lfr,lfr->l", J_lam, J_lam)
    b_l = -jnp.einsum("lfr,lfr->l", J_lam, r_p)

    # identity rows for masked columns keep H nonsingular with dx = 0 there
    H = H + jnp.diag(1.0 - col_mask)
    return H, b, H_xl, H_ll, b_l


def _damped_solve(H, b, H_xl, H_ll, b_l, mu, dtype, axis_name=None):
    """Schur-reduced, Marquardt-damped, Jacobi-preconditioned solve."""
    dim_x = H.shape[0]
    H_d = H + mu * jnp.diag(jnp.diagonal(H)) + 1e-10 * jnp.eye(dim_x, dtype=dtype)
    H_ll_d = H_ll * (1.0 + mu)
    inv_ll = jnp.where(H_ll > 1e-12, 1.0 / (H_ll_d + 1e-12), 0.0)

    H_red = H_d - _psum((H_xl * inv_ll[None, :]) @ H_xl.T, axis_name)
    b_red = b - _psum(H_xl @ (inv_ll * b_l), axis_name)

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
):
    """Run the fixed-iteration LM loop; returns (state, inv_depth, info).

    `extra_diag` (shape [dim_x]) adds to the H diagonal — used for gauge
    pinning in tests and for soft-fixing states.  With `axis_name`, the
    landmark axis of `obs` is sharded over that mesh axis and the reduced
    camera system is psum-assembled (distributed Schur BA)."""
    dt = state.p.dtype
    dim_x = layout.dim_x

    col_mask = jnp.ones((dim_x,), dt)
    if not estimate_extrinsic:
        col_mask = col_mask.at[layout.ext_off : layout.ext_off + 6].set(0.0)
    if not estimate_td:
        col_mask = col_mask.at[layout.td_off].set(0.0)

    extra = jnp.zeros((dim_x,), dt) if extra_diag is None else extra_diag.astype(dt)

    lam0 = obs.inv_depth
    cost0 = compute_cost(state, lam0, obs, pres, prior, gravity, layout, opts, axis_name)

    def step(carry, _):
        state, lam, mu, cost = carry
        H, b, H_xl, H_ll, b_l = build_normal_equations(
            state, lam, obs, pres, prior, gravity, layout, opts, col_mask, axis_name
        )
        H = H + jnp.diag(extra)
        dx, d_lam = _damped_solve(H, b, H_xl, H_ll, b_l, mu, dt, axis_name)
        cand_state = state_boxplus(state, dx, layout)
        cand_lam = lam + d_lam
        cand_cost = compute_cost(cand_state, cand_lam, obs, pres, prior, gravity, layout, opts, axis_name)
        accept = cand_cost < cost
        new_state = jax.tree.map(lambda a, b_: jnp.where(accept, b_, a), state, cand_state)
        new_lam = jnp.where(accept, cand_lam, lam)
        new_mu = jnp.where(accept, mu * opts.mu_down, mu * opts.mu_up)
        new_mu = jnp.clip(new_mu, 1e-10, 1e8)
        new_cost = jnp.where(accept, cand_cost, cost)
        return (new_state, new_lam, new_mu, new_cost), accept

    (state, lam, mu, cost), accepted = jax.lax.scan(
        step, (state, lam0, jnp.asarray(opts.mu_init, dt), cost0), None,
        length=opts.iters,
    )
    return state, lam, SolveInfo(cost0=cost0, cost=cost, mu=mu, accepted=accepted)
