"""Visual-inertial alignment: gyro bias, per-frame velocities, gravity, scale.

TPU-native re-expression of vins_estimator/src/initial/initial_aligment.cpp:
  * solve_gyro_bias       ← solveGyroscopeBias (:3-37)
  * linear_alignment      ← LinearAlignment (:125-197)
  * refine_gravity        ← RefineGravity (:55-123)
  * visual_imu_alignment  ← VisualIMUAlignment (:199-207)

All solves are fixed-shape batched linear algebra over F frames — the
window keyframes, or (primary path) the all-frames ring mirroring the
reference's `all_image_frame`.  Velocities are solved in each
frame's *body* frame, matching the reference's unknown layout; the caller
rotates them to world (estimator.cpp:421-423).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie
from ..core.linalg import spd_solve
from ..imu.preintegration import Preintegration


def solve_gyro_bias(
    q_wb: jax.Array,  # [F,4] body orientations from SfM (camera-derived)
    pres: Preintegration,  # batched [F-1]
    mask: jax.Array | None = None,  # [F-1] interval validity (fixed shapes)
) -> jax.Array:
    """Least-squares gyro bias from SfM-vs-preintegration rotation mismatch
    (initial_aligment.cpp:3-37).  Returns dbg [3]; caller repropagates."""
    q_ij = jax.vmap(lambda qi, qj: lie.qmul(lie.qconj(qi), qj))(q_wb[:-1], q_wb[1:])
    # J = ∂(2·vec δq)/∂bg from the preintegration Jacobian block
    J = pres.J[:, 3:6, 12:15]  # [F-1,3,3]
    err = jax.vmap(lambda dq, qij: 2.0 * lie.qmul(lie.qconj(dq), qij)[1:4])(
        pres.dq, q_ij
    )
    if mask is not None:
        m = mask.astype(J.dtype)
        J = J * m[:, None, None]
        err = err * m[:, None]
    A = jnp.einsum("kij,kil->jl", J, J)
    b = jnp.einsum("kij,ki->j", J, err)
    return spd_solve(A + 1e-10 * jnp.eye(3, dtype=A.dtype), b)


class AlignResult(NamedTuple):
    v_body: jax.Array  # [F,3] per-frame velocity in body frame
    g_c0: jax.Array  # [3] gravity in the SfM reference (c0) frame
    scale: jax.Array  # [] metric scale
    ok: jax.Array  # [] bool
    s_rel_sigma: jax.Array = jnp.inf  # [] relative 1σ of the scale estimate


def _ls_qr(A: jax.Array, b: jax.Array, pin: jax.Array | None = None):
    """Least squares via QR of [A | b] — no AᵀA (normal equations square the
    condition number; the alignment system mixes velocity/gravity/scale
    columns of very different scales, and the reference's ×1000 row trick +
    double precision, initial_aligment.cpp:147-151, is exactly a workaround
    we don't need with QR).  `pin` appends unit rows on selected columns
    (masked-out velocities).  Returns (x, rel_sigma_last): the solution and
    the relative 1σ of the LAST unknown (the scale column), estimated from
    the fit residual — σ² = ‖Ax−b‖²/(rows−cols), cov = σ²(RᵀR)⁻¹."""
    dtype = A.dtype
    n = A.shape[1]
    rows = [A]
    rhs = [b]
    if pin is not None:
        rows.append(jnp.diag(pin))
        rhs.append(jnp.zeros((n,), dtype))
    # tiny column-relative ridge keeps R invertible on degenerate input
    cn = jnp.sqrt(jnp.clip(jnp.sum(A * A, axis=0), 1e-12, None))
    eps = 1e-10 if dtype == jnp.float64 else 1e-5
    rows.append(jnp.diag(eps * cn))
    rhs.append(jnp.zeros((n,), dtype))
    Af = jnp.concatenate(rows, axis=0)
    bf = jnp.concatenate(rhs)
    R = jnp.linalg.qr(jnp.concatenate([Af, bf[:, None]], axis=1), mode="r")
    Rn, z, rnorm = R[:n, :n], R[:n, n], jnp.abs(R[n, n])
    x = jax.scipy.linalg.solve_triangular(Rn, z, lower=False)
    # cov_ss = σ²·‖w‖² with Rᵀw = e_s (s = last column)
    e_s = jnp.zeros((n,), dtype).at[-1].set(1.0)
    w = jax.scipy.linalg.solve_triangular(Rn.T, e_s, lower=True)
    # dof counts DATA rows only (not the synthetic ridge/pin rows, which are
    # always nonzero) against the FREE parameters (pinned columns aren't
    # free): dof = data_rows − (n − n_pinned)
    data_rows = jnp.sum((jnp.abs(A) > 0).any(axis=1))
    n_pin = 0 if pin is None else jnp.sum(pin > 0)
    dof = jnp.maximum(data_rows - (n - n_pin), 1).astype(dtype)
    sigma2 = rnorm * rnorm / dof
    s_sigma = jnp.sqrt(sigma2) * jnp.linalg.norm(w)
    rel = s_sigma / jnp.maximum(jnp.abs(x[-1]), 1e-12)
    return x, rel


def _build_lin_system(
    R_wb: jax.Array,  # [F,3,3] body rotations in SfM frame (up to scale)
    p_cam: jax.Array,  # [F,3] CAMERA positions in SfM frame (unscaled)
    tic: jax.Array,  # [3]
    pres: Preintegration,
    mask: jax.Array | None = None,  # [F-1] interval validity
):
    """Stack the per-pair 6×10 blocks of LinearAlignment (:135-160) into a
    dense [6(F-1), 3F+4] system.  Unknowns: [v_0..v_{F-1} body, g_c0, s/100]."""
    F = R_wb.shape[0]
    dt = pres.dt_sum  # [F-1]
    dtype = p_cam.dtype
    Ri_T = jnp.swapaxes(R_wb[:-1], -1, -2)  # [F-1,3,3]
    Rj = R_wb[1:]
    I3 = jnp.eye(3, dtype=dtype)

    # rows 0:3 (position): -dt·v_i + Riᵀ·dt²/2·g + Riᵀ(p_j-p_i)/100·s
    #   = dp + RiᵀRj·tic - tic
    A_vi_p = -dt[:, None, None] * I3[None]
    A_g_p = Ri_T * (0.5 * dt**2)[:, None, None]
    A_s_p = jnp.einsum("kij,kj->ki", Ri_T, p_cam[1:] - p_cam[:-1])[..., None] / 100.0
    b_p = pres.dp + jnp.einsum("kij,j->ki", Ri_T @ Rj, tic) - tic[None]

    # rows 3:6 (velocity): -v_i + (RiᵀRj)·v_j + Riᵀ·dt·g = dv
    A_vi_v = -jnp.broadcast_to(I3, Ri_T.shape)
    A_vj_v = Ri_T @ Rj
    A_g_v = Ri_T * dt[:, None, None]
    b_v = pres.dv

    K = F - 1
    A = jnp.zeros((6 * K, 3 * F + 4), dtype)
    b = jnp.zeros((6 * K,), dtype)
    for k in range(K):  # static unroll, K = window size
        r = 6 * k
        A = A.at[r : r + 3, 3 * k : 3 * k + 3].set(A_vi_p[k])
        A = A.at[r : r + 3, 3 * F : 3 * F + 3].set(A_g_p[k])
        A = A.at[r : r + 3, 3 * F + 3 :].set(A_s_p[k])
        b = b.at[r : r + 3].set(b_p[k])
        A = A.at[r + 3 : r + 6, 3 * k : 3 * k + 3].set(A_vi_v[k])
        A = A.at[r + 3 : r + 6, 3 * k + 3 : 3 * k + 6].set(A_vj_v[k])
        A = A.at[r + 3 : r + 6, 3 * F : 3 * F + 3].set(A_g_v[k])
        b = b.at[r + 3 : r + 6].set(b_v[k])
    if mask is not None:
        m6 = jnp.repeat(mask.astype(A.dtype), 6)
        A = A * m6[:, None]
        b = b * m6
    return A, b


def _velocity_pin(F: int, mask: jax.Array, dtype) -> jax.Array:
    """Unit-diagonal entries pinning the velocity of frames that touch no
    valid interval (keeps the masked normal equations SPD)."""
    mask = mask.astype(bool)
    zero = jnp.zeros(1, bool)
    act = jnp.concatenate([mask, zero]) | jnp.concatenate([zero, mask])  # [F]
    pin = jnp.where(jnp.repeat(act, 3), 0.0, 1.0).astype(dtype)  # [3F]
    return jnp.concatenate([pin, jnp.zeros(4, dtype)])  # [3F+4]


def linear_alignment(
    R_wb: jax.Array, p_cam: jax.Array, tic: jax.Array, pres: Preintegration,
    g_norm: float = 9.81007, mask: jax.Array | None = None,
) -> AlignResult:
    """LinearAlignment (:125-197): solve velocities, gravity, scale; accept
    when |g| is near g_norm and s > 0.  (The reference's ×1000 row scaling is
    a float conditioning aid; we solve in float64.)"""
    F = R_wb.shape[0]
    A, b = _build_lin_system(R_wb, p_cam, tic, pres, mask)
    pin = None if mask is None else _velocity_pin(F, mask, A.dtype)
    x, s_rel = _ls_qr(A, b, pin)
    s = x[-1] / 100.0
    g = x[3 * F : 3 * F + 3]
    ok = (jnp.abs(jnp.linalg.norm(g) - g_norm) < 1.0) & (s > 0)
    return AlignResult(v_body=x[: 3 * F].reshape(F, 3), g_c0=g, scale=s,
                       ok=ok, s_rel_sigma=s_rel)


def refine_gravity(
    R_wb: jax.Array, p_cam: jax.Array, tic: jax.Array, pres: Preintegration,
    g0: jax.Array, g_norm: float = 9.81007, iters: int = 4,
    mask: jax.Array | None = None,
) -> AlignResult:
    """RefineGravity (:55-123): re-parameterize g = ĝ·g_norm + B(ĝ)·dg on the
    2-dim tangent of the gravity sphere; 4 fixed re-linearizations."""
    F = R_wb.shape[0]
    dtype = p_cam.dtype
    A, b = _build_lin_system(R_wb, p_cam, tic, pres, mask)
    pin = None if mask is None else _velocity_pin(F, mask, dtype)[: 3 * F]
    cols_v = A[:, : 3 * F]
    cols_g = A[:, 3 * F : 3 * F + 3]
    cols_s = A[:, 3 * F + 3 :]

    def tangent_basis(g):
        a = g / jnp.linalg.norm(g)
        tmp = jnp.asarray([0.0, 0.0, 1.0], dtype)
        tmp = jnp.where(jnp.abs(a[2]) > 0.999, jnp.asarray([1.0, 0.0, 0.0], dtype), tmp)
        b1 = tmp - a * jnp.dot(a, tmp)
        b1 = b1 / jnp.linalg.norm(b1)
        b2 = jnp.cross(a, b1)
        return jnp.stack([b1, b2], axis=1)  # [3,2]

    pin_full = None if pin is None else jnp.concatenate([pin, jnp.zeros(3, dtype)])

    def step(g, _):
        Bg = tangent_basis(g)
        A2 = jnp.concatenate([cols_v, cols_g @ Bg, cols_s], axis=1)
        b2 = b - cols_g @ (g / jnp.linalg.norm(g) * g_norm)
        x, s_rel = _ls_qr(A2, b2, pin_full)
        dg = x[3 * F : 3 * F + 2]
        g_new = g / jnp.linalg.norm(g) * g_norm + Bg @ dg
        return g_new, (x, s_rel)

    g, (xs, s_rels) = jax.lax.scan(step, g0, None, length=iters)
    x = xs[-1]
    s = x[-1] / 100.0
    return AlignResult(v_body=x[: 3 * F].reshape(F, 3), g_c0=g, scale=s,
                       ok=s > 0, s_rel_sigma=s_rels[-1])


def visual_imu_alignment(
    q_wb: jax.Array, p_cam: jax.Array, tic: jax.Array, pres: Preintegration,
    g_norm: float = 9.81007, mask: jax.Array | None = None,
):
    """VisualIMUAlignment minus the repropagation step (:199-207): the caller
    must repropagate preintegrations at the returned gyro bias *before*
    calling this with them — mirroring the reference control flow, this
    function only chains the linear + refinement solves."""
    R_wb = jax.vmap(lie.q2R)(q_wb)
    lin = linear_alignment(R_wb, p_cam, tic, pres, g_norm, mask=mask)
    ref = refine_gravity(R_wb, p_cam, tic, pres, lin.g_c0, g_norm, mask=mask)
    return AlignResult(v_body=ref.v_body, g_c0=ref.g_c0, scale=ref.scale,
                       ok=lin.ok & ref.ok, s_rel_sigma=ref.s_rel_sigma)
