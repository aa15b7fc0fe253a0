"""Pre-integration tests.

Replicates (as real automated tests) the inline checkers the reference keeps
commented out (integration_base.h:279-445: numeric-vs-analytic Jacobian
check) plus physical sanity and residual-consistency checks against a
simulated trajectory.
"""
import jax
import jax.numpy as jnp
import numpy as np

from vins_tpu.core import lie
from vins_tpu.imu.preintegration import (
    ImuNoise,
    bias_corrected_deltas,
    imu_residual,
    preintegrate,
)

G = jnp.asarray([0.0, 0.0, 9.81], dtype=jnp.float64)


def make_samples(n=40, hz=200.0, key=0):
    """Random smooth IMU signal."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    t = jnp.arange(n + 1, dtype=jnp.float64) / hz
    acc = jnp.stack(
        [
            1.0 + 0.5 * jnp.sin(5 * t),
            -0.3 * jnp.cos(3 * t),
            9.81 + 0.2 * jnp.sin(2 * t),
        ],
        axis=-1,
    )
    gyr = jnp.stack([0.3 * jnp.sin(4 * t), 0.2 * jnp.cos(6 * t), 0.4 * jnp.sin(t)], axis=-1)
    dt = jnp.full((n,), 1.0 / hz, dtype=jnp.float64)
    return dt, acc, gyr


def test_constant_acc_no_rotation():
    n, hz = 100, 100.0
    dt = jnp.full((n,), 1.0 / hz, dtype=jnp.float64)
    acc = jnp.tile(jnp.asarray([[1.0, -2.0, 0.5]], dtype=jnp.float64), (n + 1, 1))
    gyr = jnp.zeros((n + 1, 3), dtype=jnp.float64)
    pre = preintegrate(dt, acc, gyr, jnp.zeros(3, jnp.float64), jnp.zeros(3, jnp.float64))
    T = n / hz
    np.testing.assert_allclose(np.asarray(pre.dv), [1.0 * T, -2.0 * T, 0.5 * T], atol=1e-12)
    # midpoint integration of piecewise-constant acc gives exact 0.5 a T^2
    np.testing.assert_allclose(np.asarray(pre.dp), np.asarray([1.0, -2.0, 0.5]) * 0.5 * T * T, atol=1e-9)
    np.testing.assert_allclose(np.asarray(pre.dq), [1, 0, 0, 0], atol=1e-12)


def test_constant_gyro_rotation():
    n, hz = 200, 200.0
    w = jnp.asarray([0.3, -0.5, 0.8], dtype=jnp.float64)
    dt = jnp.full((n,), 1.0 / hz, dtype=jnp.float64)
    acc = jnp.zeros((n + 1, 3), dtype=jnp.float64)
    gyr = jnp.tile(w[None], (n + 1, 1))
    pre = preintegrate(dt, acc, gyr, jnp.zeros(3, jnp.float64), jnp.zeros(3, jnp.float64))
    q_true = lie.qexp(w * (n / hz))
    np.testing.assert_allclose(np.asarray(pre.dq), np.asarray(q_true), atol=1e-6)


def test_bias_jacobian_finite_difference():
    """First-order bias correction (J columns) vs actual re-integration."""
    dt, acc, gyr = make_samples()
    ba = jnp.asarray([0.05, -0.02, 0.03], dtype=jnp.float64)
    bg = jnp.asarray([0.01, 0.004, -0.002], dtype=jnp.float64)
    pre = preintegrate(dt, acc, gyr, ba, bg)

    eps = 1e-6
    for comp, idx in [("ba", 0), ("bg", 1)]:
        for k in range(3):
            dba = jnp.zeros(3, jnp.float64).at[k].set(eps) if comp == "ba" else jnp.zeros(3, jnp.float64)
            dbg = jnp.zeros(3, jnp.float64).at[k].set(eps) if comp == "bg" else jnp.zeros(3, jnp.float64)
            pre2 = preintegrate(dt, acc, gyr, ba + dba, bg + dbg)
            # predicted by first-order correction at (ba+dba, bg+dbg)
            dp_c, dq_c, dv_c = bias_corrected_deltas(pre, ba + dba, bg + dbg)
            np.testing.assert_allclose(np.asarray(dp_c), np.asarray(pre2.dp), atol=5e-11,
                                       err_msg=f"dp vs {comp}[{k}]")
            np.testing.assert_allclose(np.asarray(dv_c), np.asarray(pre2.dv), atol=5e-11,
                                       err_msg=f"dv vs {comp}[{k}]")
            dq_err = lie.qmul(lie.qconj(dq_c), pre2.dq)
            assert float(jnp.abs(dq_err[1:]).max()) < 5e-11, f"dq vs {comp}[{k}]"


def test_jacobian_full_finite_difference():
    """The propagated J equals d(deltas)/d(bias) of the integration map."""
    dt, acc, gyr = make_samples(n=30)
    ba = jnp.zeros(3, jnp.float64)
    bg = jnp.zeros(3, jnp.float64)

    pre0 = preintegrate(dt, acc, gyr, ba, bg)
    dq0_conj = lie.qconj(pre0.dq)

    def deltas(b):
        ba_, bg_ = b[:3], b[3:]
        pre = preintegrate(dt, acc, gyr, ba_, bg_)
        # rotation measured in the RIGHT tangent at the linearization point
        # (dq_true = dq0 ⊗ δq(δθ)) — the same convention J propagates.
        return jnp.concatenate([pre.dp, lie.qlog(lie.qmul(dq0_conj, pre.dq)), pre.dv])

    J_auto = jax.jacfwd(deltas)(jnp.concatenate([ba, bg]))
    # propagated J bias columns: [dp;dθ;dv] x [dba, dbg]
    J_prop = np.asarray(pre0.J)[0:9, 9:15]
    np.testing.assert_allclose(np.asarray(J_auto), J_prop, atol=2e-4, rtol=2e-3)


def test_covariance_psd_and_growth():
    dt, acc, gyr = make_samples(n=60)
    z3 = jnp.zeros(3, jnp.float64)
    pre_short = preintegrate(dt[:20], acc[:21], gyr[:21], z3, z3)
    pre_long = preintegrate(dt, acc, gyr, z3, z3)
    for P in (pre_short.P, pre_long.P):
        ev = np.linalg.eigvalsh(np.asarray(P))
        assert ev.min() > -1e-16
    assert np.trace(np.asarray(pre_long.P)) > np.trace(np.asarray(pre_short.P))
    # whitener: A P Aᵀ = I
    A = np.asarray(pre_long.sqrt_info)
    W = A @ np.asarray(pre_long.P) @ A.T
    np.testing.assert_allclose(W, np.eye(15), atol=1e-4)


def test_mask_padding_equivalence():
    dt, acc, gyr = make_samples(n=40)
    z3 = jnp.zeros(3, jnp.float64)
    pre_ref = preintegrate(dt[:25], acc[:26], gyr[:26], z3, z3)
    # same interval padded to 40 with garbage tail + mask
    dt_pad = dt.at[25:].set(999.0)
    mask = jnp.arange(40) < 25
    pre_pad = preintegrate(dt_pad, acc, gyr, z3, z3, mask=mask)
    np.testing.assert_allclose(np.asarray(pre_pad.dp), np.asarray(pre_ref.dp), atol=1e-12)
    np.testing.assert_allclose(np.asarray(pre_pad.dq), np.asarray(pre_ref.dq), atol=1e-12)
    np.testing.assert_allclose(np.asarray(pre_pad.P), np.asarray(pre_ref.P), atol=1e-12)
    assert np.isclose(float(pre_pad.dt_sum), float(pre_ref.dt_sum))


def simulate_trajectory(t0, t1, hz=200.0):
    """Closed-form trajectory + exact IMU measurements (world z up)."""
    n = int(round((t1 - t0) * hz))
    ts = t0 + jnp.arange(n + 1, dtype=jnp.float64) / hz

    def pos(t):
        return jnp.stack([2 * jnp.sin(t), 1.5 * jnp.cos(t), 0.5 * jnp.sin(2 * t)], axis=-1)

    def ypr_rad(t):
        return jnp.stack([0.4 * jnp.sin(t), 0.3 * jnp.cos(t), 0.2 * jnp.sin(0.5 * t)], axis=-1)

    vel = jax.vmap(jax.jacfwd(pos))(ts)
    accw = jax.vmap(jax.jacfwd(jax.jacfwd(pos)))(ts)
    R = jax.vmap(lambda t: lie.ypr2R(ypr_rad(t) * 180.0 / jnp.pi))(ts)
    dR = jax.vmap(jax.jacfwd(lambda t: lie.ypr2R(ypr_rad(t) * 180.0 / jnp.pi)))(ts)
    # body angular rate: skew(w_b) = Rᵀ dR
    Wb = jnp.einsum("nji,njk->nik", R, dR)
    gyr = jnp.stack([Wb[:, 2, 1], Wb[:, 0, 2], Wb[:, 1, 0]], axis=-1)
    acc_body = jnp.einsum("nji,nj->ni", R, accw + G[None])
    dt = jnp.diff(ts)
    return dict(ts=ts, p=pos(ts), v=vel, R=R, acc=acc_body, gyr=gyr, dt=dt)


def test_residual_zero_on_true_states():
    sim = simulate_trajectory(0.3, 0.8)
    ba = jnp.asarray([0.02, -0.01, 0.015], dtype=jnp.float64)
    bg = jnp.asarray([0.003, 0.002, -0.001], dtype=jnp.float64)
    acc_meas = sim["acc"] + ba
    gyr_meas = sim["gyr"] + bg
    pre = preintegrate(sim["dt"], acc_meas, gyr_meas, ba, bg)

    q0 = lie.R2q(sim["R"][0])
    q1 = lie.R2q(sim["R"][-1])
    r = imu_residual(
        pre,
        sim["p"][0], q0, sim["v"][0], ba, bg,
        sim["p"][-1], q1, sim["v"][-1], ba, bg,
        G, whiten=False,
    )
    # residual only limited by midpoint discretization error at 200 Hz
    assert float(jnp.abs(r).max()) < 2e-5, np.asarray(r)


def test_residual_bias_correction_consistency():
    """Integrate with wrong linearization bias, evaluate with correction at
    the true bias — residual must stay small (first-order correction)."""
    sim = simulate_trajectory(0.0, 0.5)
    ba_true = jnp.asarray([0.02, -0.01, 0.015], dtype=jnp.float64)
    bg_true = jnp.asarray([0.003, 0.002, -0.001], dtype=jnp.float64)
    acc_meas = sim["acc"] + ba_true
    gyr_meas = sim["gyr"] + bg_true
    # linearize at slightly-off biases
    pre = preintegrate(sim["dt"], acc_meas, gyr_meas,
                       ba_true + 0.01, bg_true - 0.005)
    q0 = lie.R2q(sim["R"][0])
    q1 = lie.R2q(sim["R"][-1])
    r = imu_residual(
        pre,
        sim["p"][0], q0, sim["v"][0], ba_true, bg_true,
        sim["p"][-1], q1, sim["v"][-1], ba_true, bg_true,
        G, whiten=False,
    )
    assert float(jnp.abs(r).max()) < 5e-4, np.asarray(r)
