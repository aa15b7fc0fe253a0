"""Marginalization correctness.

Gold-standard property: for the quadratic model at the linearization point,
the prior produced by marginalize_old must satisfy, for any perturbation dk
of the kept states,

    ½‖r0 + J·dk_slid‖²  −  ½‖r0‖²  ==  min_dm q(dk, dm) − min_dm q(0, dm)

where q is the (robust-weighted) quadratic formed from the *actual* factors
touching dropped variables, linearized by autodiff — an independent path
through the math that shares no assembly code with marginalize_old.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vins_tpu.core import lie
from vins_tpu.imu.preintegration import imu_residual
from vins_tpu.solver.factors import _proj_residual_local, PROJ_DX
from vins_tpu.solver.gn import SolverOptions, solve_window
from vins_tpu.solver.marginalize import marginalize_old, marginalize_second_new
from vins_tpu.solver.problem import (
    Layout, Prior, WindowState, prior_residual, state_boxplus,
)
from vins_tpu.sim.window import build_window_problem, perturb_state

F = 6  # smaller window keeps the dense autodiff reference cheap
L = 24
LAYOUT = Layout(F)


@pytest.fixture(scope="module")
def solved():
    """A window problem solved to (near) optimum, as the estimator would have
    it just before marginalizing."""
    problem = build_window_problem(frames=F, max_landmarks=L, key=jax.random.PRNGKey(11))
    key = jax.random.PRNGKey(4)
    s0 = perturb_state(problem.state_true, key, pos_sigma=0.02, rot_sigma=0.01,
                       vel_sigma=0.02, bias_sigma=0.0, skip_first=1)
    pin = jnp.zeros(LAYOUT.dim_x, jnp.float64).at[0:6].set(1e10)
    state, lam, info = solve_window(
        s0, problem.obs, problem.pres, Prior.empty(LAYOUT, jnp.float64),
        problem.gravity, LAYOUT, SolverOptions(iters=8), extra_diag=pin,
    )
    obs = problem.obs._replace(inv_depth=lam)
    return problem, state, obs


def margin_residual_stack(problem, state, obs):
    """Stacked residual vector of all factors touching frame 0, as a function
    of (dx [dim_x], dlam [L]) — evaluated with autodiff, fixed IRLS weights."""
    focal = 460.0
    anchored0 = np.asarray(obs.anchor) == 0
    valid = np.asarray(obs.valid)
    active = np.asarray(obs.active)
    pairs = [
        (l, j)
        for l in range(L)
        if anchored0[l] and active[l]
        for j in range(1, F)
        if valid[l, j]
    ]

    def stack(dx, dlam):
        s = state_boxplus(state, dx, LAYOUT)
        rs = []
        for (l, j) in pairs:
            d20 = jnp.zeros(PROJ_DX, jnp.float64)
            r = _proj_residual_local(
                d20, s.p[0], s.q[0], s.p[j], s.q[j], s.tic, s.qic,
                obs.inv_depth[l] + dlam[l], s.td,
                obs.pt[l, 0], obs.vel[l, 0], obs.toff[l, 0],
                obs.pt[l, j], obs.vel[l, j], obs.toff[l, j],
            ) * (focal / 1.5)
            rs.append(r)
        pre0 = jax.tree.map(lambda a: a[0], problem.pres)
        r_imu = imu_residual(
            pre0, s.p[0], s.q[0], s.v[0], s.ba[0], s.bg[0],
            s.p[1], s.q[1], s.v[1], s.ba[1], s.bg[1], problem.gravity,
        )
        return jnp.concatenate(rs + [r_imu]), len(pairs)

    # fixed Cauchy sqrt-weights at the linearization point (per 2-dim factor)
    r0, npairs = stack(jnp.zeros(LAYOUT.dim_x, jnp.float64), jnp.zeros(L, jnp.float64))
    w = []
    for k in range(npairs):
        s2 = float(jnp.sum(r0[2 * k : 2 * k + 2] ** 2))
        w += [np.sqrt(1.0 / (1.0 + s2))] * 2
    w += [1.0] * 15
    w = jnp.asarray(w, jnp.float64)

    return lambda dx, dlam: stack(dx, dlam)[0] * w, pairs


def test_marginalize_old_matches_dense_schur(solved):
    problem, state, obs = solved
    resfn, pairs = margin_residual_stack(problem, state, obs)
    assert len(pairs) > 5

    z_x = jnp.zeros(LAYOUT.dim_x, jnp.float64)
    z_l = jnp.zeros(L, jnp.float64)
    R0 = resfn(z_x, z_l)
    Ax = jax.jacfwd(resfn, argnums=0)(z_x, z_l)
    Al = jax.jacfwd(resfn, argnums=1)(z_x, z_l)
    A = np.concatenate([np.asarray(Ax), np.asarray(Al)], axis=1)
    R0 = np.asarray(R0)

    # dropped coordinate set: pose0 (0:6), sb0 (6F:6F+9), anchored λs
    anchored0 = (np.asarray(obs.anchor) == 0) & np.asarray(obs.active)
    drop = list(range(6)) + list(range(6 * F, 6 * F + 9)) + [
        LAYOUT.dim_x + l for l in range(L) if anchored0[l]
    ]
    keep = [i for i in range(LAYOUT.dim_x + L) if i not in drop]

    def qmin_over_drop(dk):
        """min over dropped coords of ½‖R0 + A·d‖² with kept coords = dk."""
        Ad = A[:, drop]
        Ak = A[:, keep]
        rhs = R0 + Ak @ dk
        dm, *_ = np.linalg.lstsq(Ad, -rhs, rcond=None)
        r = rhs + Ad @ dm
        return 0.5 * float(r @ r)

    prior = marginalize_old(
        state, obs, problem.pres, Prior.empty(LAYOUT, jnp.float64),
        problem.gravity, LAYOUT,
    )

    # evaluate both sides for random small kept perturbations
    rng = np.random.default_rng(0)
    base = qmin_over_drop(np.zeros(len(keep)))
    for trial in range(4):
        dk = 1e-4 * rng.standard_normal(len(keep))
        lhs = qmin_over_drop(dk) - base

        # map kept perturbation into the slid window layout and evaluate the
        # prior as the solver would: r = r0 + J·(x ⊟ lin)
        dx_full = np.zeros(LAYOUT.dim_x + L)
        dx_full[keep] = dk
        dx_orig = jnp.asarray(dx_full[: LAYOUT.dim_x])
        s_pert = state_boxplus(state, dx_orig, LAYOUT)
        # slide: frame k+1 → k
        roll = lambda a: jnp.concatenate([a[1:], a[-1:]], axis=0)
        s_slid = WindowState(
            p=roll(s_pert.p), q=roll(s_pert.q), v=roll(s_pert.v),
            ba=roll(s_pert.ba), bg=roll(s_pert.bg),
            tic=s_pert.tic, qic=s_pert.qic, td=s_pert.td,
        )
        r = np.asarray(prior_residual(prior, s_slid, LAYOUT))
        r_at_lin = np.asarray(prior.r0)
        rhs_val = 0.5 * float(r @ r) - 0.5 * float(r_at_lin @ r_at_lin)

        np.testing.assert_allclose(rhs_val, lhs, rtol=2e-3, atol=1e-10,
                                   err_msg=f"trial {trial}")


def test_marginalize_second_new_schur(solved):
    """After dropping pose[F-2] from a prior, the remaining quadratic must be
    the Schur complement of the original prior's information."""
    problem, state, obs = solved
    prior = marginalize_old(
        state, obs, problem.pres, Prior.empty(LAYOUT, jnp.float64),
        problem.gravity, LAYOUT,
    )
    H = np.asarray(prior.J.T @ prior.J)
    b = -np.asarray(prior.J.T @ prior.r0)

    m = list(range(6 * (F - 2), 6 * (F - 2) + 6))
    k = [i for i in range(LAYOUT.dim_x) if i not in m]
    Amm = H[np.ix_(m, m)]
    Amr = H[np.ix_(m, k)]
    Arr = H[np.ix_(k, k)]
    H_want = Arr - Amr.T @ np.linalg.pinv(Amm) @ Amr
    b_want = b[k] - Amr.T @ (np.linalg.pinv(Amm) @ b[m])

    p2 = marginalize_second_new(prior, LAYOUT)
    H2 = np.asarray(p2.J.T @ p2.J)
    b2 = -np.asarray(p2.J.T @ p2.r0)

    # p2 is in the shifted layout: old frame F-1 variables now live in the
    # F-2 slots (and the dropped F-2 variables' slots are zero).  Build
    # slot_of_var (a swap of the two blocks) to index back to original vars.
    slot = np.arange(LAYOUT.dim_x)
    for a0, b0, n in ((6 * (F - 2), 6 * (F - 1), 6),
                      (6 * F + 9 * (F - 2), 6 * F + 9 * (F - 1), 9)):
        slot[a0 : a0 + n] = np.arange(b0, b0 + n)  # var F-2 → (zero) F-1 slot
        slot[b0 : b0 + n] = np.arange(a0, a0 + n)  # var F-1 → F-2 slot
    H2u = H2[np.ix_(slot, slot)]
    b2u = b2[slot]

    scale = max(1.0, np.abs(H_want).max())
    np.testing.assert_allclose(H2u[np.ix_(k, k)], H_want, atol=2e-6 * scale)
    np.testing.assert_allclose(b2u[k], b_want, atol=2e-5 * max(1.0, np.abs(b_want).max()))
    # dropped rows/cols carry no information
    assert np.abs(H2u[np.ix_(m, m)]).max() < 1e-6 * scale
