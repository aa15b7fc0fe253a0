"""Solver tests: factor Jacobians vs finite differences, BA/VIO convergence
on synthetic ground truth, and Schur-marginalization correctness."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vins_tpu.core import lie
from vins_tpu.solver.factors import (
    PROJ_DX,
    _proj_residual_local,
    imu_blocks,
    projection_blocks,
)
from vins_tpu.solver.gn import SolverOptions, compute_cost, solve_window
from vins_tpu.solver.problem import (
    FeatureObs,
    Layout,
    Prior,
    WindowState,
    prior_residual,
    state_boxplus,
    state_boxminus,
)
from vins_tpu.sim.window import build_window_problem, perturb_state

F = 11
L = 48
LAYOUT = Layout(F)


@pytest.fixture(scope="module")
def problem():
    return build_window_problem(frames=F, max_landmarks=L, key=jax.random.PRNGKey(7))


def test_projection_residual_zero_at_truth(problem):
    blocks = projection_blocks(problem.state_true, problem.obs)
    r = np.asarray(blocks.r)
    v = np.asarray(blocks.valid)
    assert v.sum() > 50  # scene produces a real problem
    assert np.abs(r[v]).max() < 1e-6


def test_imu_residual_zero_at_truth(problem):
    blocks = imu_blocks(problem.state_true, problem.pres, problem.gravity)
    assert bool(blocks.valid.all())
    # whitened residual: discretization error only
    assert float(jnp.abs(blocks.r).max()) < 5e-2


def test_projection_jacobian_finite_difference(problem):
    s = problem.state_true
    obs = problem.obs
    l, j = 3, 5  # some valid factor
    # find a valid (l, j)
    v = np.asarray(obs.valid)
    a = np.asarray(obs.anchor)
    found = [(li, ji) for li in range(L) for ji in range(F) if v[li, ji] and ji != a[li] and bool(obs.active[li])]
    l, j = found[0]

    i = int(a[l])
    args = (
        s.p[i], s.q[i], s.p[j], s.q[j], s.tic, s.qic,
        obs.inv_depth[l], s.td,
        obs.pt[l, i], obs.vel[l, i], obs.toff[l, i],
        obs.pt[l, j], obs.vel[l, j], obs.toff[l, j],
    )
    fn = lambda dx: _proj_residual_local(dx, *args)
    J = jax.jacfwd(fn)(jnp.zeros(PROJ_DX, jnp.float64))
    eps = 1e-7
    for k in range(PROJ_DX):
        dxp = jnp.zeros(PROJ_DX, jnp.float64).at[k].set(eps)
        dxm = jnp.zeros(PROJ_DX, jnp.float64).at[k].set(-eps)
        fd = (fn(dxp) - fn(dxm)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(J[:, k]), np.asarray(fd), atol=1e-6,
                                   err_msg=f"col {k}")


def pin_diag(frames_to_pin=(0,), w=1e10):
    d = jnp.zeros(LAYOUT.dim_x, jnp.float64)
    for f in frames_to_pin:
        d = d.at[6 * f : 6 * f + 6].set(w)
    return d


def test_visual_ba_convergence(problem):
    """Vision-only: mask IMU factors, pin poses 0-1 (monocular gauge: 6-dof
    + scale), perturb the rest, expect recovery."""
    pres = problem.pres._replace(dt_sum=jnp.full_like(problem.pres.dt_sum, 1e3))
    key = jax.random.PRNGKey(1)
    s0 = perturb_state(problem.state_true, key, pos_sigma=0.08, rot_sigma=0.03,
                       skip_first=2)
    lam_pert = problem.obs.inv_depth * (1.0 + 0.1 * jax.random.normal(key, (L,), jnp.float64))
    obs = problem.obs._replace(inv_depth=lam_pert)
    prior = Prior.empty(LAYOUT, jnp.float64)

    state, lam, info = solve_window(
        s0, obs, pres, prior, problem.gravity, LAYOUT,
        SolverOptions(iters=10), extra_diag=pin_diag((0, 1)),
    )
    err_p = np.abs(np.asarray(state.p - problem.state_true.p)).max()
    assert err_p < 2e-3, (err_p, np.asarray(info.cost0), np.asarray(info.cost))
    act = np.asarray(obs.active)
    err_lam = np.abs(np.asarray(lam - problem.obs.inv_depth))[act].max()
    assert err_lam < 2e-2, err_lam


def test_vio_convergence_exact_biases(problem):
    """Full VIO with correct biases: the solver must reach the global optimum
    (cost at or below the cost at ground truth) and recover poses to sub-0.1mm."""
    key = jax.random.PRNGKey(2)
    s0 = perturb_state(problem.state_true, key, pos_sigma=0.05, rot_sigma=0.02,
                       vel_sigma=0.05, bias_sigma=0.0, skip_first=1)
    lam_pert = problem.obs.inv_depth * (1.0 + 0.08 * jax.random.normal(key, (L,), jnp.float64))
    obs = problem.obs._replace(inv_depth=lam_pert)
    prior = Prior.empty(LAYOUT, jnp.float64)

    state, lam, info = solve_window(
        s0, obs, pres=problem.pres, prior=prior, gravity=problem.gravity,
        layout=LAYOUT, opts=SolverOptions(iters=12), extra_diag=pin_diag((0,)),
    )
    cost_truth = compute_cost(
        problem.state_true, problem.obs.inv_depth, problem.obs, problem.pres,
        prior, problem.gravity, LAYOUT, SolverOptions(),
    )
    assert float(info.cost) < float(cost_truth) * 2 + 1e-6, (
        float(info.cost), float(cost_truth))
    err_p = np.abs(np.asarray(state.p - problem.state_true.p)).max()
    assert err_p < 1e-4, err_p


def test_vio_convergence_biased(problem):
    """Full VIO with a realistic common-mode bias initialization error.

    Bias/tilt/depth common-mode directions are weakly observable in a single
    window; they contract at ~0.85/iter under Gauss-Newton (identical JᵀJ to
    the reference's Ceres setup) and finish converging across frames as the
    window slides.  One solve must still get poses to sub-cm."""
    key = jax.random.PRNGKey(2)
    s0 = perturb_state(problem.state_true, key, pos_sigma=0.05, rot_sigma=0.02,
                       vel_sigma=0.05, bias_sigma=0.0, skip_first=1)
    s0 = s0._replace(ba=s0.ba + 0.004, bg=s0.bg + 0.001)
    lam_pert = problem.obs.inv_depth * (1.0 + 0.08 * jax.random.normal(key, (L,), jnp.float64))
    obs = problem.obs._replace(inv_depth=lam_pert)
    prior = Prior.empty(LAYOUT, jnp.float64)

    state, lam, info = solve_window(
        s0, obs, pres=problem.pres, prior=prior, gravity=problem.gravity,
        layout=LAYOUT, opts=SolverOptions(iters=10), extra_diag=pin_diag((0,)),
    )
    assert float(info.cost) < float(info.cost0) * 1e-3
    err_p = np.abs(np.asarray(state.p - problem.state_true.p)).max()
    assert err_p < 2e-2, err_p
    err_v = np.abs(np.asarray(state.v - problem.state_true.v)).max()
    assert err_v < 5e-2, err_v


def test_solve_is_jittable(problem):
    f = jax.jit(
        lambda s, obs, pres, prior: solve_window(
            s, obs, pres, prior, problem.gravity, LAYOUT, SolverOptions(iters=2),
            extra_diag=pin_diag((0,)),
        )
    )
    prior = Prior.empty(LAYOUT, jnp.float64)
    state, lam, info = f(problem.state_true, problem.obs, problem.pres, prior)
    assert np.isfinite(float(info.cost))


def test_prior_residual_at_lin(problem):
    prior = Prior(
        J=jnp.eye(LAYOUT.dim_x, dtype=jnp.float64),
        r0=jnp.arange(LAYOUT.dim_x, dtype=jnp.float64),
        lin=problem.state_true,
        valid=jnp.asarray(True),
    )
    r = prior_residual(prior, problem.state_true, LAYOUT)
    np.testing.assert_allclose(np.asarray(r), np.arange(LAYOUT.dim_x), atol=1e-12)


def test_boxplus_boxminus_roundtrip(problem):
    key = jax.random.PRNGKey(3)
    dx = 0.01 * jax.random.normal(key, (LAYOUT.dim_x,), jnp.float64)
    s2 = state_boxplus(problem.state_true, dx, LAYOUT)
    dx2 = state_boxminus(s2, problem.state_true, LAYOUT)
    np.testing.assert_allclose(np.asarray(dx2), np.asarray(dx), atol=1e-5)
