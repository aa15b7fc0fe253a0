"""IMU pre-integration as a fused jitted scan.

TPU-native re-expression of the reference's `IntegrationBase`
(vins_estimator/src/factor/integration_base.h:54-186): midpoint integration
of Δp/Δq/Δv between two camera frames, with discrete propagation of the
15×15 bias/state Jacobian (for first-order bias correction) and the 15×15
covariance.  The residual math of the IMU factor
(vins_estimator/src/factor/imu_factor.h:19-77) lives here too
(`imu_residual`) so the solver can consume it as a pure batched function.

State ordering follows the reference: [δp, δθ, δv, δba, δbg] (parameters.h
O_P=0, O_R=3, O_V=6, O_BA=9, O_BG=12).  Noise ordering:
[na0, nw0, na1, nw1, nba_rw, nbg_rw] (18-dim).

Note on discretization: like the reference, the noise covariance Q holds the
*continuous* noise densities squared and V carries plain dt factors (so the
discrete variance grows ∝ dt² per step rather than the textbook ∝ dt).  We
keep reference behavior for weighting parity between IMU and vision factors.

Everything is mask-aware: intervals are padded to a fixed number of samples
(`mask[k] = 0` for padding) so whole windows batch/vmap with static shapes.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie


class ImuNoise(NamedTuple):
    """Continuous-time noise densities (euroc_config.yaml acc_n/gyr_n/acc_w/gyr_w)."""

    acc_n: float = 0.08
    gyr_n: float = 0.004
    acc_w: float = 0.00004
    gyr_w: float = 2.0e-6

    def Q18(self, dtype=jnp.float32) -> jax.Array:
        d = jnp.asarray(
            [self.acc_n**2] * 3 + [self.gyr_n**2] * 3
            + [self.acc_n**2] * 3 + [self.gyr_n**2] * 3
            + [self.acc_w**2] * 3 + [self.gyr_w**2] * 3,
            dtype=dtype,
        )
        return jnp.diag(d)


class Preintegration(NamedTuple):
    """Result of integrating one IMU interval at linearization biases."""

    dp: jax.Array  # [..., 3]
    dq: jax.Array  # [..., 4]
    dv: jax.Array  # [..., 3]
    J: jax.Array  # [..., 15, 15] d(delta)/d(state0 perturbation) — bias cols used
    P: jax.Array  # [..., 15, 15] covariance
    sqrt_info: jax.Array  # [..., 15, 15] upper-triangular whitener, UᵀU = P⁻¹
    dt_sum: jax.Array  # [...]
    ba_lin: jax.Array  # [..., 3] linearization accel bias
    bg_lin: jax.Array  # [..., 3] linearization gyro bias


def _midpoint_step(carry, inp, ba, bg, Q):
    """One midpoint integration step (integration_base.h:54-128)."""
    dp, dq, dv, J, P = carry
    dt, acc0, gyr0, acc1, gyr1, m = inp
    dtype = dp.dtype

    w = 0.5 * (gyr0 + gyr1) - bg
    dq_new = lie.qmul(dq, lie.deltaQ(w * dt))
    dq_new = lie.qnormalize(dq_new)
    R0 = lie.q2R(dq)
    R1 = lie.q2R(dq_new)
    a0 = acc0 - ba
    a1 = acc1 - ba
    a_mid = 0.5 * (R0 @ a0 + R1 @ a1)
    dp_new = dp + dv * dt + 0.5 * a_mid * dt * dt
    dv_new = dv + a_mid * dt

    # --- discrete transition F (15x15) -------------------------------------
    I3 = jnp.eye(3, dtype=dtype)
    S0 = lie.skew(a0)
    S1 = lie.skew(a1)
    Rw = I3 - lie.skew(w) * dt  # ≈ exp(-w dt)
    # d(a_mid)/d(δθ_k), d(a_mid)/d(δba), d(a_mid)/d(δbg)
    dA_dth = -0.5 * (R0 @ S0 + R1 @ S1 @ Rw)
    dA_dba = -0.5 * (R0 + R1)
    dA_dbg = 0.5 * (R1 @ S1) * dt

    Z = jnp.zeros((3, 3), dtype=dtype)
    F = jnp.block(
        [
            [I3, dA_dth * 0.5 * dt * dt, I3 * dt, dA_dba * 0.5 * dt * dt, dA_dbg * 0.5 * dt * dt],
            [Z, Rw, Z, Z, -I3 * dt],
            [Z, dA_dth * dt, I3, dA_dba * dt, dA_dbg * dt],
            [Z, Z, Z, I3, Z],
            [Z, Z, Z, Z, I3],
        ]
    )

    # --- noise input V (15x18) --------------------------------------------
    # noise order [na0, nw0, na1, nw1, nba_rw, nbg_rw]
    half_R1S1dt = -0.25 * (R1 @ S1) * dt  # d(a_mid)/d(nw*) (via δθ_{k+1})
    V = jnp.block(
        [
            [0.25 * R0 * dt * dt, half_R1S1dt * 0.5 * dt * dt, 0.25 * R1 * dt * dt, half_R1S1dt * 0.5 * dt * dt, Z, Z],
            [Z, 0.5 * I3 * dt, Z, 0.5 * I3 * dt, Z, Z],
            [0.5 * R0 * dt, half_R1S1dt * dt, 0.5 * R1 * dt, half_R1S1dt * dt, Z, Z],
            [Z, Z, Z, Z, I3 * dt, Z],
            [Z, Z, Z, Z, Z, I3 * dt],
        ]
    )

    J_new = F @ J
    P_new = F @ P @ F.T + V @ Q @ V.T

    # masked update (padding steps are identity)
    keep = m > 0
    out = (
        jnp.where(keep, dp_new, dp),
        jnp.where(keep, dq_new, dq),
        jnp.where(keep, dv_new, dv),
        jnp.where(keep, J_new, J),
        jnp.where(keep, P_new, P),
    )
    return out, None


def preintegrate_sequential(
    dt: jax.Array,  # [N] gaps between consecutive samples
    acc: jax.Array,  # [N+1, 3] boundary accelerometer samples
    gyr: jax.Array,  # [N+1, 3] boundary gyroscope samples
    ba: jax.Array,  # [3] linearization accel bias
    bg: jax.Array,  # [3] linearization gyro bias
    noise: ImuNoise = ImuNoise(),
    mask: jax.Array | None = None,  # [N] 1 = real step, 0 = padding
) -> Preintegration:
    """Reference implementation: serial `lax.scan` of the midpoint step —
    the literal recurrence of integration_base.h:54-128.  Kept as the
    ground truth the parallel version is property-tested against."""
    dtype = acc.dtype
    n = dt.shape[0]
    if mask is None:
        mask = jnp.ones((n,), dtype=dtype)
    Q = noise.Q18(dtype)

    init = (
        jnp.zeros(3, dtype),
        jnp.asarray([1.0, 0, 0, 0], dtype),
        jnp.zeros(3, dtype),
        jnp.eye(15, dtype=dtype),
        jnp.zeros((15, 15), dtype),
    )
    xs = (dt, acc[:-1], gyr[:-1], acc[1:], gyr[1:], mask.astype(dtype))
    (dp, dq, dv, J, P), _ = jax.lax.scan(
        lambda c, x: _midpoint_step(c, x, ba, bg, Q), init, xs
    )
    dt_sum = jnp.sum(dt * mask.astype(dtype))
    sqrt_info = _sqrt_info(P)
    return Preintegration(dp, dq, dv, J, P, sqrt_info, dt_sum, ba, bg)


def preintegrate(
    dt: jax.Array,  # [N] gaps between consecutive samples
    acc: jax.Array,  # [N+1, 3] boundary accelerometer samples
    gyr: jax.Array,  # [N+1, 3] boundary gyroscope samples
    ba: jax.Array,  # [3] linearization accel bias
    bg: jax.Array,  # [3] linearization gyro bias
    noise: ImuNoise = ImuNoise(),
    mask: jax.Array | None = None,  # [N] 1 = real step, 0 = padding
) -> Preintegration:
    """Integrate one interval; re-run with new biases to 'repropagate'
    (integration_base.h:38-52 — same buffers, new linearization point).

    Parallel-prefix formulation (the TPU-native redesign of the serial
    midpoint recurrence): the N-step loop is latency-bound on TPU, so it is
    decomposed into associative pieces, each log₂(N) deep:

      1. per-step rotation increments δq_k = deltaQ(w_k dt_k) — elementwise;
      2. prefix rotations dq_k = δq_0 ⊗ … ⊗ δq_{k-1} — `associative_scan`
         of quaternion products;
      3. midpoint accelerations a_k = ½(R_k a0_k + R_{k+1} a1_k) — elementwise
         once the prefixes exist; Δv/Δp are then plain cumulative sums
         (Δp needs the *exclusive* velocity prefix);
      4. the coupled Jacobian/covariance propagation J←FJ, P←FPFᵀ+VQVᵀ is an
         associative monoid on pairs (A, P):
            (A₁,P₁) ∘ (A₂,P₂) = (A₂A₁, A₂P₁A₂ᵀ + P₂)
         so the final (J, P) is one `associative_scan` of batched 15×15
         matmuls (MXU) instead of N serial small matmuls.

    Masked padding steps use dt←0, which makes every piece an exact identity
    (δq = 1, F = I, V = 0, zero cumsum contribution) — no `where` plumbing.
    Property-tested against `preintegrate_sequential` (tests/
    test_preintegration.py)."""
    dtype = acc.dtype
    n = dt.shape[0]
    if mask is None:
        mask = jnp.ones((n,), dtype=dtype)
    Q = noise.Q18(dtype)

    dte = dt * mask.astype(dtype)  # [N] masked steps are exact identities
    a0 = acc[:-1] - ba  # [N,3]
    a1 = acc[1:] - ba
    w = 0.5 * (gyr[:-1] + gyr[1:]) - bg  # [N,3]

    # 2. prefix rotations (inclusive scan of increments, shifted to get the
    # rotation *at* each step boundary: R_0 = I, R_k = Πδq_{<k})
    dq_inc = jax.vmap(lie.deltaQ)(w * dte[:, None])  # [N,4]
    dq_incl = jax.lax.associative_scan(jax.vmap(lie.qmul), dq_inc)  # [N,4]
    dq_incl = dq_incl / jnp.linalg.norm(dq_incl, axis=-1, keepdims=True)
    q_id = jnp.asarray([1.0, 0, 0, 0], dtype)[None]
    q_pre = jnp.concatenate([q_id, dq_incl[:-1]], axis=0)  # [N,4] R_k
    q_post = dq_incl  # [N,4] R_{k+1}
    R_pre = jax.vmap(lie.q2R)(q_pre)
    R_post = jax.vmap(lie.q2R)(q_post)

    # 3. midpoint accelerations → Δv, Δp as cumsums
    Ra0 = jnp.einsum("nij,nj->ni", R_pre, a0)
    Ra1 = jnp.einsum("nij,nj->ni", R_post, a1)
    a_mid = 0.5 * (Ra0 + Ra1)  # [N,3]
    dv_steps = a_mid * dte[:, None]
    dv_incl = jnp.cumsum(dv_steps, axis=0)
    dv_pre = dv_incl - dv_steps  # exclusive prefix: dv at step start
    dp_incl = jnp.cumsum(
        dv_pre * dte[:, None] + 0.5 * a_mid * dte[:, None] ** 2, axis=0
    )
    dp, dq, dv = dp_incl[-1], q_post[-1], dv_incl[-1]

    # 4. batched F/V build (elementwise in k), then one associative reduction
    I3 = jnp.eye(3, dtype=dtype)
    Z = jnp.zeros((n, 3, 3), dtype)
    S0 = jax.vmap(lie.skew)(a0)
    S1 = jax.vmap(lie.skew)(a1)
    Sw = jax.vmap(lie.skew)(w)
    d1 = dte[:, None, None]
    d2 = (dte * dte)[:, None, None]
    Rw = I3[None] - Sw * d1
    R1S1 = R_post @ S1
    dA_dth = -0.5 * (R_pre @ S0 + R1S1 @ Rw)
    dA_dba = -0.5 * (R_pre + R_post)
    dA_dbg = 0.5 * R1S1 * d1
    eyeN = jnp.broadcast_to(I3, (n, 3, 3))

    def blockrows(rows):
        return jnp.concatenate(
            [jnp.concatenate(r, axis=-1) for r in rows], axis=-2
        )

    F = blockrows([
        [eyeN, dA_dth * 0.5 * d2, eyeN * d1, dA_dba * 0.5 * d2, dA_dbg * 0.5 * d2],
        [Z, Rw, Z, Z, -eyeN * d1],
        [Z, dA_dth * d1, eyeN, dA_dba * d1, dA_dbg * d1],
        [Z, Z, Z, eyeN, Z],
        [Z, Z, Z, Z, eyeN],
    ])  # [N,15,15]
    half_R1S1dt = -0.25 * R1S1 * d1
    V = blockrows([
        [0.25 * R_pre * d2, half_R1S1dt * 0.5 * d2, 0.25 * R_post * d2, half_R1S1dt * 0.5 * d2, Z, Z],
        [Z, 0.5 * eyeN * d1, Z, 0.5 * eyeN * d1, Z, Z],
        [0.5 * R_pre * d1, half_R1S1dt * d1, 0.5 * R_post * d1, half_R1S1dt * d1, Z, Z],
        [Z, Z, Z, Z, eyeN * d1, Z],
        [Z, Z, Z, Z, Z, eyeN * d1],
    ])  # [N,15,18]
    VQVt = jnp.einsum("nij,jk,nlk->nil", V, Q, V)

    def compose(a, b):
        """(A₁,P₁) then (A₂,P₂) — associative."""
        A1, P1 = a
        A2, P2 = b
        return (
            jnp.einsum("...ij,...jk->...ik", A2, A1),
            jnp.einsum("...ij,...jk,...lk->...il", A2, P1, A2) + P2,
        )

    A_scan, P_scan = jax.lax.associative_scan(compose, (F, VQVt))
    J, P = A_scan[-1], P_scan[-1]

    dt_sum = jnp.sum(dte)
    sqrt_info = _sqrt_info(P)
    return Preintegration(dp, dq, dv, J, P, sqrt_info, dt_sum, ba, bg)


def _sqrt_info(P: jax.Array) -> jax.Array:
    """Whitener A with A P Aᵀ = I.

    The reference uses LLT(P⁻¹).L().T (imu_factor.h:64-66); we instead take
    A = L⁻¹ from P = L Lᵀ — also a valid whitener (L⁻¹ L Lᵀ L⁻ᵀ = I) but
    computed from P directly, which is numerically safer than inverting P
    first.  Gauss-Newton is identical under any valid whitener since only
    AᵀA = P⁻¹ enters the normal equations.

    Covariance scales differ by ~10 orders of magnitude between position and
    bias-random-walk blocks, so we Jacobi-precondition (P = D C D with
    unit-diagonal C) before factorizing; the regularization eps then acts
    relative to each block's own scale."""
    dtype = P.dtype
    eps = 1e-12 if dtype == jnp.float64 else 1e-6
    d = jnp.sqrt(jnp.clip(jnp.diagonal(P), 1e-300 if dtype == jnp.float64 else 1e-30, None))
    C = P / d[:, None] / d[None, :]
    L = jnp.linalg.cholesky(C + eps * jnp.eye(15, dtype=dtype))
    Linv = jax.scipy.linalg.solve_triangular(L, jnp.eye(15, dtype=dtype), lower=True)
    return Linv / d[None, :]


def bias_corrected_deltas(pre: Preintegration, ba_i: jax.Array, bg_i: jax.Array):
    """First-order bias correction of the integrated deltas
    (integration_base.h:173-178)."""
    dba = ba_i - pre.ba_lin
    dbg = bg_i - pre.bg_lin
    J = pre.J
    dp = pre.dp + J[0:3, 9:12] @ dba + J[0:3, 12:15] @ dbg
    dv = pre.dv + J[6:9, 9:12] @ dba + J[6:9, 12:15] @ dbg
    dq = lie.qmul(pre.dq, lie.deltaQ(J[3:6, 12:15] @ dbg))
    return dp, lie.qnormalize(dq), dv


def imu_residual(
    pre: Preintegration,
    p_i, q_i, v_i, ba_i, bg_i,
    p_j, q_j, v_j, ba_j, bg_j,
    gravity: jax.Array,
    whiten: bool = True,
) -> jax.Array:
    """15-dim IMU factor residual (imu_factor.h:19-77 / integration_base.h:
    160-186): [r_p, r_θ, r_v, r_ba, r_bg], optionally whitened by sqrt_info.

    Convention: gravity = [0, 0, +9.81] (world z up), accelerometer measures
    specific force R_wbᵀ (a_w + g)."""
    dt = pre.dt_sum
    dp, dq, dv = bias_corrected_deltas(pre, ba_i, bg_i)
    qi_inv = lie.qconj(q_i)
    Ri_T = lie.q2R(qi_inv)

    r_p = Ri_T @ (0.5 * gravity * dt * dt + p_j - p_i - v_i * dt) - dp
    q_err = lie.qmul(lie.qconj(dq), lie.qmul(qi_inv, q_j))
    r_th = 2.0 * q_err[1:4]
    r_v = Ri_T @ (gravity * dt + v_j - v_i) - dv
    r_ba = ba_j - ba_i
    r_bg = bg_j - bg_i
    r = jnp.concatenate([r_p, r_th, r_v, r_ba, r_bg])
    if whiten:
        r = pre.sqrt_info @ r
    return r
