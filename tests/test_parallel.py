"""Mesh-parallel tests on the virtual 8-device CPU mesh: the sharded batched
VIO step must reproduce the single-device step bitwise-closely, and the
landmark-sharded BA must match the dense one."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vins_tpu.imu.preintegration import ImuNoise
from vins_tpu.parallel.sharded import make_mesh, make_sharded_ba, make_sharded_vio_step
from vins_tpu.estimator.step import make_vio_step
from vins_tpu.solver.ba import BAState, ba_solve
from vins_tpu.solver.gn import SolverOptions
from vins_tpu.solver.problem import Layout, Prior
from vins_tpu.sim.window import build_window_problem, perturb_state

DT = jnp.float64
FRAMES = 6
LM = 64  # divisible by the lm mesh axis


def _step_inputs(key, prior_valid=False):
    prob = build_window_problem(frames=FRAMES, max_landmarks=LM, key=key, dtype=DT)
    layout = Layout(FRAMES)
    state0 = perturb_state(prob.state_true, jax.random.fold_in(key, 1),
                           pos_sigma=0.02, rot_sigma=0.01, skip_first=1)
    prior = Prior.empty(layout, DT)
    needs_tri = jnp.zeros((LM,), bool)
    return (
        state0, prob.raw_dt, prob.raw_acc, prob.raw_gyr,
        prob.raw_mask.astype(DT), prob.obs, needs_tri, prior, prob.gravity,
        jnp.asarray(True), prob.state_true.p[-1],
    )


def test_sharded_step_matches_single():
    mesh = make_mesh(seq=4, lm=2)
    layout = Layout(FRAMES)
    noise = ImuNoise()
    opts = SolverOptions(iters=4)

    keys = [jax.random.PRNGKey(k) for k in range(4)]
    inputs = [_step_inputs(k) for k in keys]

    single = make_vio_step(layout, noise, opts)
    refs = [single(*inp) for inp in inputs]

    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *inputs)
    # gravity must stay unbatched
    batch = tuple(batch[:8]) + (inputs[0][8],) + tuple(batch[9:])
    sharded = make_sharded_vio_step(layout, noise, opts, mesh)
    out = sharded(*batch)

    for b in range(4):
        np.testing.assert_allclose(
            np.asarray(out.state.p[b]), np.asarray(refs[b].state.p), atol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(out.inv_depth[b]), np.asarray(refs[b].inv_depth), atol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(out.cost[b]), np.asarray(refs[b].cost), rtol=1e-9
        )
        # prior information matrices must agree (J is sign/ordering dependent
        # through eigh, so compare JᵀJ; psum reassociation perturbs the
        # eigendecomposition slightly, so tolerance is scale-aware)
        Hr = np.asarray(refs[b].prior.J.T @ refs[b].prior.J)
        Hs = np.asarray(out.prior.J[b].T @ out.prior.J[b])
        scale = np.abs(Hr).max()
        np.testing.assert_allclose(Hs, Hr, atol=1e-5 * scale, rtol=1e-4)


def test_sharded_ba_matches_dense():
    mesh = make_mesh(seq=4, lm=2)  # BA shards landmarks over all 8 devices
    prob = build_window_problem(frames=FRAMES, max_landmarks=LM, dtype=DT)
    st = prob.state_true

    # camera-frame BA problem from the window scene
    from vins_tpu.core import lie

    p_c = st.p + jax.vmap(lambda q: lie.qrotate(q, st.tic))(st.q)
    q_c = jax.vmap(lambda q: lie.qmul(q, st.qic))(st.q)
    key = jax.random.PRNGKey(5)
    state0 = BAState(
        p=p_c + 0.02 * jax.random.normal(key, p_c.shape, DT),
        q=q_c,
        pts=prob.points + 0.05 * jax.random.normal(key, prob.points.shape, DT),
    )
    valid = prob.obs.valid
    pt_mask = valid.sum(1) >= 2
    fix_pose = jnp.arange(FRAMES) == 0
    fix_pos = fix_pose | (jnp.arange(FRAMES) == FRAMES - 1)

    dense_st, dense_cost = ba_solve(
        state0, prob.obs.pt, valid, fix_pose, fix_pos, pt_mask, iters=8
    )
    sharded = make_sharded_ba(mesh, iters=8)
    sh_st, sh_cost = sharded(state0, prob.obs.pt, valid, fix_pose, fix_pos, pt_mask)

    np.testing.assert_allclose(float(sh_cost), float(dense_cost), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(sh_st.p), np.asarray(dense_st.p), atol=1e-8)
    np.testing.assert_allclose(np.asarray(sh_st.pts), np.asarray(dense_st.pts), atol=1e-7)


def test_sharded_ba_benchmark_shape():
    """BA path at the SCALING-BENCHMARK shape (tools/bench_scaling.py:
    11 frames x 4096 landmarks, lm sharded over all 8 devices) — pins that
    the production-size program compiles, runs, and matches the dense solve
    (VERDICT r3 next-step #8)."""
    F, L = 11, 4096
    mesh = make_mesh(seq=1, lm=8)
    prob = build_window_problem(frames=F, max_landmarks=L, dtype=DT)
    st = prob.state_true

    from vins_tpu.core import lie

    p_c = st.p + jax.vmap(lambda q: lie.qrotate(q, st.tic))(st.q)
    q_c = jax.vmap(lambda q: lie.qmul(q, st.qic))(st.q)
    key = jax.random.PRNGKey(5)
    state0 = BAState(
        p=p_c + 0.02 * jax.random.normal(key, p_c.shape, DT),
        q=q_c,
        pts=prob.points + 0.05 * jax.random.normal(key, prob.points.shape, DT),
    )
    valid = prob.obs.valid
    pt_mask = valid.sum(1) >= 2
    fix_pose = jnp.arange(F) == 0
    fix_pos = fix_pose | (jnp.arange(F) == F - 1)
    inputs = (state0, prob.obs.pt, valid, fix_pose, fix_pos, pt_mask)

    dense_st, dense_cost = ba_solve(*inputs, iters=4)
    sharded = make_sharded_ba(mesh, iters=4)
    sh_st, sh_cost = sharded(*inputs)

    np.testing.assert_allclose(float(sh_cost), float(dense_cost), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(sh_st.p), np.asarray(dense_st.p),
                               atol=1e-8)
