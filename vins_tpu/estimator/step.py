"""The fused per-frame VIO device step.

One jitted XLA program per keyframe doing everything the reference spreads
over solveOdometry + double2vector + marginalization (estimator.cpp:473-484,
530-619, 670-1003):

  1. re-preintegrate every window interval from raw samples at the *current*
     bias estimates (⇒ the reference's conditional `repropagate` becomes an
     always-on relinearization — same measurements, fresher Jacobians),
  2. DLT-triangulate features that lack depth (feature_manager.cpp:202-257),
  3. masked LM solve with Schur landmark elimination (solver/gn.py),
  4. yaw/position re-anchoring of frame 0 to remove the 4-DoF gauge drift
     (double2vector, estimator.cpp:530-577),
  5. failure metrics (failureDetection, estimator.cpp:621-667),
  6. marginalization prior for the upcoming slide (MARGIN_OLD or
     MARGIN_SECOND_NEW via lax.cond — both produce a prior in the slid
     layout).

No host round-trips inside; the host only slides buffers and feeds the next
frame.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie
from ..core.precision import highest_matmul_precision
from ..imu.preintegration import ImuNoise, preintegrate
from ..solver.gn import SolverOptions, solve_window
from ..solver.marginalize import marginalize_old, marginalize_second_new
from ..solver.problem import FeatureObs, Layout, Prior, WindowState


class StepResult(NamedTuple):
    state: WindowState  # post-solve, re-anchored, PRE-slide
    inv_depth: jax.Array  # [L] post-solve inverse depths
    prior: Prior  # prior for the slid window
    cost0: jax.Array
    cost: jax.Array
    fail_imu: jax.Array  # [] bool: bias blow-up (Ba > 2.5 or Bg > 1.0)
    fail_jump: jax.Array  # [] bool: position jump vs last state
    # refined relocalization BODY pose (same world/gauge as `state`);
    # None when the step was built without the relo block
    relo_p: jax.Array | None = None
    relo_q: jax.Array | None = None


def triangulate_depths(state: WindowState, obs: FeatureObs) -> jax.Array:
    """Masked multi-view DLT depth in each landmark's anchor camera
    (feature_manager.cpp:202-257), with the INIT_DEPTH=5 clamp (:251-254)."""
    L, F = obs.valid.shape
    dt = state.p.dtype

    # camera poses (world←cam)
    p_c = state.p + jax.vmap(lambda q: lie.qrotate(q, state.tic))(state.q)
    q_c = jax.vmap(lambda q: lie.qmul(q, state.qic))(state.q)
    R_c = jax.vmap(lie.q2R)(q_c)  # [F,3,3]

    R_a = R_c[obs.anchor]  # [L,3,3]
    p_a = p_c[obs.anchor]  # [L,3]

    # X_f = R_cfᵀ R_ca · X_a + R_cfᵀ (p_ca − p_cf) — per (landmark, frame)
    R_rel = jnp.einsum("fki,lkj->lfij", R_c, R_a)  # [L,F,3,3]
    t_rel = jnp.einsum("fki,lfk->lfi", R_c, p_a[:, None, :] - p_c[None, :, :])
    P = jnp.concatenate([R_rel, t_rel[..., None]], axis=-1)  # [L,F,3,4]

    r0 = obs.pt[..., 0:1] * P[..., 2, :] - P[..., 0, :]  # [L,F,4]
    r1 = obs.pt[..., 1:2] * P[..., 2, :] - P[..., 1, :]
    m = obs.valid[..., None].astype(dt)
    A = jnp.concatenate([r0 * m, r1 * m], axis=1)  # [L,2F,4]
    _, V = jnp.linalg.eigh(jnp.einsum("lij,lik->ljk", A, A))
    y = V[..., 0]
    # X_a = dir_a · d with dir_a = [pt_a, 1]; DLT solves [X_a; 1] ∝ y
    w = jnp.where(jnp.abs(y[:, 3]) < 1e-12, 1e-12, y[:, 3])
    depth = y[:, 2] / w
    depth = jnp.where(depth < 0.1, 5.0, depth)  # INIT_DEPTH fallback
    return 1.0 / depth


def reanchor_yaw(state: WindowState, origin_p0: jax.Array, origin_q0: jax.Array):
    """double2vector's gauge fix (estimator.cpp:530-577): rotate/translate the
    whole window so frame 0 keeps its pre-solve yaw and position.  Returns
    (state, (rot_diff, q_diff, p0_new, origin_p0)) — the transform is also
    applied to the relo pose block (:586-595)."""
    origin_R0 = lie.q2R(origin_q0)
    ypr_origin = lie.R2ypr(origin_R0)
    R0_new = lie.q2R(state.q[0])
    ypr_new = lie.R2ypr(R0_new)
    y_diff = ypr_origin[0] - ypr_new[0]
    rot_diff = lie.ypr2R(jnp.stack([y_diff, jnp.zeros_like(y_diff), jnp.zeros_like(y_diff)]))
    # gimbal-lock guard (:541-546): use the full relative rotation
    singular = (jnp.abs(jnp.abs(ypr_origin[1]) - 90.0) < 1.0) | (
        jnp.abs(jnp.abs(ypr_new[1]) - 90.0) < 1.0
    )
    rot_diff = jnp.where(singular, origin_R0 @ R0_new.T, rot_diff)
    q_diff = lie.R2q(rot_diff)

    p0_new = state.p[0]
    p = jax.vmap(lambda pi: rot_diff @ (pi - p0_new))(state.p) + origin_p0
    q = jax.vmap(lambda qi: lie.qnormalize(lie.qmul(q_diff, qi)))(state.q)
    v = jax.vmap(lambda vi: rot_diff @ vi)(state.v)
    return state._replace(p=p, q=q, v=v), (rot_diff, q_diff, p0_new, origin_p0)


def make_vio_step(
    layout: Layout,
    noise: ImuNoise,
    opts: SolverOptions,
    estimate_extrinsic: bool = False,
    estimate_td: bool = False,
    axis_name: str | None = None,
    jit: bool = True,
    with_relo: bool = False,
):
    """Build the per-frame step for a fixed window layout.  With `axis_name`
    the landmark axis of `obs` is sharded over that mesh axis (distributed
    Schur assembly inside the solve and the marginalization); leave None for
    single-shard operation.

    With `with_relo`, the step takes 5 extra trailing arguments
    (relo_p0 [3], relo_q0 [4], relo_pt [L,2], relo_valid [L], relo_on [])
    and jointly optimizes the relo pose inside the window solve
    (estimator.cpp:769-801); `relo_on` gates the factors dynamically so the
    SAME program serves frames without a match."""

    maybe_jit = jax.jit if jit else (lambda f: f)

    @maybe_jit
    def vio_step(
        state: WindowState,
        imu_dt: jax.Array,  # [F-1, N]
        imu_acc: jax.Array,  # [F-1, N+1, 3]
        imu_gyr: jax.Array,  # [F-1, N+1, 3]
        imu_mask: jax.Array,  # [F-1, N]
        obs: FeatureObs,
        needs_tri: jax.Array,  # [L] bool
        prior: Prior,
        gravity: jax.Array,
        marg_old: jax.Array,  # [] bool
        last_p: jax.Array,  # [3] previous newest position (failure check)
        *relo_args,
    ) -> StepResult:
        # 1. preintegrate at current biases (always-relinearize)
        pres = jax.vmap(
            lambda d, a, g, ba, bg, m: preintegrate(d, a, g, ba, bg, noise, m)
        )(imu_dt, imu_acc, imu_gyr, state.ba[:-1], state.bg[:-1], imu_mask)

        # 2. triangulate missing depths at the pre-solve states
        lam_tri = triangulate_depths(state, obs)
        inv_depth = jnp.where(needs_tri & obs.active, lam_tri, obs.inv_depth)
        obs2 = obs._replace(inv_depth=inv_depth)

        # 3. solve
        origin_p0, origin_q0 = state.p[0], state.q[0]
        if with_relo:
            solved, lam, info, relo_p, relo_q = solve_window(
                state, obs2, pres, prior, gravity, layout, opts,
                estimate_extrinsic=estimate_extrinsic,
                estimate_td=estimate_td, axis_name=axis_name,
                relo=tuple(relo_args),
            )
        else:
            solved, lam, info = solve_window(
                state, obs2, pres, prior, gravity, layout, opts,
                estimate_extrinsic=estimate_extrinsic, estimate_td=estimate_td,
                axis_name=axis_name,
            )
            relo_p = relo_q = None

        # 4. gauge re-anchor (applied to the relo pose too, :586-595)
        solved, (rot_diff, q_diff, p0_new, op0) = reanchor_yaw(
            solved, origin_p0, origin_q0)
        if with_relo:
            relo_p = rot_diff @ (relo_p - p0_new) + op0
            relo_q = lie.qnormalize(lie.qmul(q_diff, relo_q))

        # 5. failure metrics (estimator.cpp:621-667)
        F = layout.F
        fail_imu = (jnp.linalg.norm(solved.ba[F - 1]) > 2.5) | (
            jnp.linalg.norm(solved.bg[F - 1]) > 1.0
        )
        dp = solved.p[F - 1] - last_p
        fail_jump = (jnp.linalg.norm(dp) > 5.0) | (jnp.abs(dp[2]) > 1.0)

        # 6. marginalize for the slide
        obs3 = obs2._replace(inv_depth=lam)
        prior_new = jax.lax.cond(
            marg_old,
            lambda: marginalize_old(
                solved, obs3, pres, prior, gravity, layout,
                focal=opts.focal, max_imu_dt=opts.max_imu_dt,
                axis_name=axis_name,
            ),
            lambda: marginalize_second_new(prior, layout),
        )
        return StepResult(
            state=solved, inv_depth=lam, prior=prior_new,
            cost0=info.cost0, cost=info.cost,
            fail_imu=fail_imu, fail_jump=fail_jump,
            relo_p=relo_p, relo_q=relo_q,
        )

    # solver chain needs true f32 dots (core/precision.py)
    return highest_matmul_precision(vio_step)
