"""Mesh-parallel VIO: batched sequence replay × landmark-sharded Schur solve.

The reference has no multi-device story (SURVEY.md §2.6: its parallelism is
three ROS processes + 4 pthreads for Hessian assembly).  The TPU-native
scale-out axes are:

  * `seq` (data parallel): independent sequences/windows replayed as a batch
    dimension — embarrassingly parallel, rides pjit/shard_map over ICI.
  * `lm` (model parallel): the landmark axis of each window is sharded; each
    shard computes its JᵀJ contribution to the reduced camera system which is
    `psum`-reduced (the distributed version of the reference's 4-pthread
    Hessian assembly, marginalization_factor.cpp:232-261).  Landmark updates
    (the Schur back-substitution) stay local to their shard.

`make_sharded_vio_step` composes the fused single-window step (estimator/
step.py) with vmap over `seq` and shard_map over a ("seq", "lm") mesh.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map as _shard_map  # jax ≥ 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map


def shard_map(f, *, mesh, in_specs, out_specs):
    # check_vma=False: the LM scan carries start as unvarying constants and
    # become shard-varying after one iteration, which the VMA checker rejects;
    # the psum placement here is correct by construction (verified against
    # the single-device path in tests/test_parallel.py).
    return _shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                      check_vma=False)

from ..core.linalg import inv3x3
from ..imu.preintegration import ImuNoise
from ..solver.gn import SolverOptions
from ..solver.problem import FeatureObs, Layout, Prior, WindowState
from ..core.precision import highest_matmul_precision
from ..estimator.step import StepResult, make_vio_step


def make_mesh(devices=None, seq: int | None = None, lm: int | None = None) -> Mesh:
    """Build a ("seq", "lm") mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if seq is None and lm is None:
        lm = 2 if n % 2 == 0 and n > 1 else 1
        seq = n // lm
    elif seq is None:
        seq = n // lm
    elif lm is None:
        lm = n // seq
    assert seq * lm == n, (seq, lm, n)
    arr = np.asarray(devices).reshape(seq, lm)
    return Mesh(arr, ("seq", "lm"))


def _batched_specs(batch_axis: str, lm_axis: str):
    """(in_specs, out_specs) pytrees for the vmapped step under shard_map."""
    b = P(batch_axis)
    bl = P(batch_axis, lm_axis)
    r = P()  # replicated

    state_spec = WindowState(p=b, q=b, v=b, ba=b, bg=b, tic=b, qic=b, td=b)
    obs_spec = FeatureObs(pt=bl, vel=bl, toff=bl, valid=bl, anchor=bl,
                          inv_depth=bl, active=bl)
    prior_spec = Prior(J=b, r0=b, lin=state_spec, valid=b)
    in_specs = (
        state_spec,  # state
        b, b, b, b,  # imu dt/acc/gyr/mask
        obs_spec,
        bl,  # needs_tri
        prior_spec,
        r,  # gravity
        b,  # marg_old
        b,  # last_p
    )
    out_specs = StepResult(
        state=state_spec, inv_depth=bl, prior=prior_spec,
        cost0=b, cost=b, fail_imu=b, fail_jump=b,
    )
    return in_specs, out_specs


def make_sharded_vio_step(
    layout: Layout,
    noise: ImuNoise,
    opts: SolverOptions,
    mesh: Mesh,
    estimate_extrinsic: bool = False,
    estimate_td: bool = False,
):
    """Batched multi-sequence VIO step sharded over a ("seq", "lm") mesh.

    Inputs carry a leading batch dimension B (divisible by the `seq` mesh
    size); the landmark dimension L must be divisible by the `lm` mesh size.
    Returns a jitted function with the same signature as the single-window
    step, batched."""
    step = make_vio_step(
        layout, noise, opts,
        estimate_extrinsic=estimate_extrinsic, estimate_td=estimate_td,
        axis_name="lm", jit=False,
    )
    batched = jax.vmap(
        step, in_axes=(0, 0, 0, 0, 0, 0, 0, 0, None, 0, 0)
    )
    in_specs, out_specs = _batched_specs("seq", "lm")
    return highest_matmul_precision(jax.jit(
        shard_map(batched, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    ))


def make_sharded_ba(mesh: Mesh, iters: int = 10):
    """Distributed visual-only bundle adjustment: landmarks sharded over the
    whole mesh (both axes flattened), poses replicated — the pure scaling
    benchmark for the reduced-camera-system assembly."""
    from ..solver import ba as _ba

    axis = ("seq", "lm")

    def solve(state: _ba.BAState, obs, valid, fix_pose, fix_pos, pt_mask):
        # identical LM loop to ba_solve but with psum'd reductions
        F = state.p.shape[0]
        dtt = state.p.dtype
        valid2 = valid & pt_mask[:, None]

        pose_col_mask = jnp.ones((F, 6), dtt) * (1.0 - fix_pose.astype(dtt))[:, None]
        pos_keep = 1.0 - fix_pos.astype(dtt)
        pose_col_mask = pose_col_mask.at[:, 0:3].mul(pos_keep[:, None])
        pose_col_mask = pose_col_mask.reshape(6 * F)

        def cost_fn(st):
            r, _ = _ba._blocks(st, obs, valid2)
            return 0.5 * jax.lax.psum(jnp.sum(r * r), axis)

        cost0 = cost_fn(state)

        def step(carry, _):
            st, mu, cost = carry
            H_xx_c, b_x_c, H_xl, H_ll, b_l = _ba._normal_eqs(st, obs, valid2, pose_col_mask)

            I3 = jnp.eye(3, dtype=dtt)
            d_ll = jnp.maximum(jnp.diagonal(H_ll, axis1=1, axis2=2), 1e-6)
            H_ll_d = H_ll + (mu * d_ll + 1e-8)[:, :, None] * I3[None]
            H_ll_d = jnp.where(pt_mask[:, None, None], H_ll_d, I3[None])
            inv_ll = inv3x3(H_ll_d)
            inv_ll = jnp.where(pt_mask[:, None, None], inv_ll, jnp.zeros_like(inv_ll))

            # ONE fused cross-shard reduction per iteration: psum is linear,
            # so the four per-shard contributions ride one collective (each
            # psum is a barrier — on the CPU mesh the barrier count, not the
            # payload, dominated the n=2 efficiency loss)
            S_H = jnp.einsum("dli,lij,elj->de", H_xl, inv_ll, H_xl)
            S_b = jnp.einsum("dli,lij,lj->d", H_xl, inv_ll, b_l)
            H_xx, b_x, S_H, S_b = jax.lax.psum(
                (H_xx_c, b_x_c, S_H, S_b), axis)
            H_red = H_xx - S_H
            b_red = b_x - S_b
            H_red = H_red + mu * jnp.diag(jnp.diagonal(H_red))
            H_red = H_red + jnp.diag(1.0 - pose_col_mask) + 1e-9 * jnp.eye(6 * F, dtype=dtt)
            d = jnp.sqrt(jnp.clip(jnp.diagonal(H_red), 1e-12, None))
            c, low = jax.scipy.linalg.cho_factor(H_red / d[:, None] / d[None, :])
            dx = jax.scipy.linalg.cho_solve((c, low), b_red / d) / d
            d_pt = jnp.einsum(
                "lij,lj->li", inv_ll, b_l - jnp.einsum("dli,d->li", H_xl, dx)
            )

            from ..core import lie
            d_pose = dx.reshape(F, 6)
            p_new, q_new = lie.pose_boxplus(st.p, st.q, d_pose[:, :3], d_pose[:, 3:])
            cand = _ba.BAState(p=p_new, q=q_new, pts=st.pts + d_pt)
            cand_cost = cost_fn(cand)
            accept = cand_cost < cost
            st = jax.tree.map(lambda a, b_: jnp.where(accept, b_, a), st, cand)
            mu = jnp.clip(jnp.where(accept, mu * 0.3, mu * 10.0), 1e-10, 1e8)
            return (st, mu, jnp.where(accept, cand_cost, cost)), None

        (state, _, cost), _ = jax.lax.scan(
            step, (state, jnp.asarray(1e-4, dtt), cost0), None, length=iters
        )
        return state, cost

    lm_spec = P(("seq", "lm"))
    state_spec = _ba.BAState(p=P(), q=P(), pts=lm_spec)
    return highest_matmul_precision(jax.jit(
        shard_map(
            solve, mesh=mesh,
            in_specs=(state_spec, lm_spec, lm_spec, P(), P(), lm_spec),
            out_specs=(state_spec, P()),
        )
    ))
