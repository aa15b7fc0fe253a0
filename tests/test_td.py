"""Online temporal calibration test: observations captured with a hidden
time offset td (features shifted by td·velocity, projection_td_factor.cpp:
50-52) must yield td from the solver when estimate_td is on — the TPU
equivalent of driver config #3 / the reference's ESTIMATE_TD path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vins_tpu.sim.synthetic import feature_velocity
from vins_tpu.sim.window import build_window_problem, perturb_state
from vins_tpu.solver.gn import SolverOptions, solve_window
from vins_tpu.solver.problem import Layout, Prior

DT = jnp.float64


def test_td_recovered():
    td_true = 0.015  # 15 ms sensor offset
    prob = build_window_problem(frames=11, max_landmarks=96, dtype=DT)
    layout = Layout(11)

    # analytic normalized-plane velocity of every landmark at each frame
    st = prob.state_true
    from vins_tpu.sim.synthetic import Trajectory

    traj = Trajectory.figure8()
    vel_frames = []
    for t in np.asarray(prob.times):
        vel_frames.append(feature_velocity(traj, float(t), st.tic, st.qic, prob.points))
    vel = jnp.stack(vel_frames, axis=1)  # [L, F, 2] (jacfwd output is [L,2] per t)

    # observation taken at t + td: pt_obs = pt(t) + td·vel(t)
    obs = prob.obs._replace(
        pt=prob.obs.pt + td_true * vel,
        vel=vel,
    )

    # states at truth, td cold-started at 0 — the solve must recover the
    # hidden offset purely from the velocity-shifted observations (the
    # estimator refines td continuously online; pose convergence from
    # perturbed starts is covered by the e2e tests)
    extra = jnp.zeros((layout.dim_x,), DT).at[:6].set(1e12)  # gauge: pin frame 0
    solved, lam, info = solve_window(
        st, obs, prob.pres, Prior.empty(layout, DT), prob.gravity,
        layout, SolverOptions(iters=10), estimate_td=True, extra_diag=extra,
    )
    assert abs(float(solved.td) - td_true) < 1e-4, float(solved.td)
    assert float(info.cost) < 1e-6
    # positions must not be traded off against td
    assert float(jnp.abs(solved.p - st.p).max()) < 1e-3


def test_rolling_shutter_toff_recovers_td():
    """Rolling shutter: each observation is captured TR·(row/ROW − ½) after
    the nominal frame time (projection_td_factor.cpp:18,50-52).  Feeding the
    per-observation toff = −offset must let the solver recover td exactly;
    ignoring it (toff = 0) leaves a biased, higher-cost solution."""
    td_true = 0.010
    tr = 0.030  # 30 ms readout
    H = 480
    prob = build_window_problem(frames=11, max_landmarks=96, dtype=DT)
    layout = Layout(11)

    st = prob.state_true
    from vins_tpu.sim.synthetic import Trajectory

    traj = Trajectory.figure8()
    vel_frames = []
    for t in np.asarray(prob.times):
        vel_frames.append(feature_velocity(traj, float(t), st.tic, st.qic, prob.points))
    vel = jnp.stack(vel_frames, axis=1)  # [L, F, 2]

    # synthetic pixel rows per observation -> per-obs readout offset
    rng = np.random.default_rng(3)
    rows = rng.uniform(0, H, size=prob.obs.pt.shape[:2])
    rs_off = tr * (rows / H - 0.5)  # [L, F] seconds
    obs_shift = (td_true + rs_off)[:, :, None] * vel
    obs = prob.obs._replace(
        pt=prob.obs.pt + obs_shift,
        vel=vel,
        toff=jnp.asarray(-rs_off, DT),
    )

    extra = jnp.zeros((layout.dim_x,), DT).at[:6].set(1e12)  # gauge: pin frame 0
    solved, lam, info = solve_window(
        st, obs, prob.pres, Prior.empty(layout, DT), prob.gravity,
        layout, SolverOptions(iters=10), estimate_td=True, extra_diag=extra,
    )
    assert abs(float(solved.td) - td_true) < 1e-4, float(solved.td)
    assert float(info.cost) < 1e-6
    assert float(jnp.abs(solved.p - st.p).max()) < 1e-3

    # control: same observations with the rolling-shutter term dropped
    solved0, _, info0 = solve_window(
        st, obs._replace(toff=jnp.zeros_like(obs.toff)), prob.pres,
        Prior.empty(layout, DT), prob.gravity,
        layout, SolverOptions(iters=10), estimate_td=True, extra_diag=extra,
    )
    assert float(info0.cost) > 10 * float(info.cost)


def test_pipeline_rolling_shutter_toff_mapping():
    """The pipeline maps pixel row -> toff = −TR·(row/ROW − ½)."""
    from vins_tpu.config import VinsConfig

    cfg = VinsConfig(rolling_shutter=True, rolling_shutter_tr=0.03,
                     image_height=480, image_width=752)
    uv = np.array([[10.0, 0.0], [10.0, 240.0], [10.0, 480.0]])
    toff = -cfg.rolling_shutter_tr * (uv[:, 1] / cfg.image_height - 0.5)
    np.testing.assert_allclose(toff, [0.015, 0.0, -0.015])
