"""Build a complete synthetic sliding-window problem (states + observations
+ preintegrations) directly from a closed-form scene — the solver-level test
harness and benchmark workload."""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie
from ..imu.preintegration import ImuNoise, Preintegration, preintegrate
from ..solver.problem import FeatureObs, WindowState
from .synthetic import Trajectory, generate_imu_interval, make_landmarks, project_points

# forward-looking camera: camera z → body x (body x = forward)
R_IC_FORWARD = ((0.0, 0.0, 1.0), (-1.0, 0.0, 0.0), (0.0, -1.0, 0.0))


class WindowProblem(NamedTuple):
    state_true: WindowState
    obs: FeatureObs
    pres: Preintegration
    gravity: jax.Array
    times: jax.Array
    points: jax.Array
    raw_dt: jax.Array  # [F-1, N] raw IMU buffers (for step-level consumers)
    raw_acc: jax.Array  # [F-1, N+1, 3]
    raw_gyr: jax.Array  # [F-1, N+1, 3]
    raw_mask: jax.Array  # [F-1, N]


def build_window_problem(
    frames: int = 11,
    max_landmarks: int = 64,
    key=None,
    t0: float = 1.0,
    frame_dt: float = 0.1,
    imu_hz: float = 200.0,
    noise: ImuNoise = ImuNoise(),
    ba=(0.02, -0.01, 0.015),
    bg=(0.002, 0.003, -0.001),
    pix_noise: float = 0.0,
    imu_noise: bool = False,
    dtype=jnp.float64,
) -> WindowProblem:
    """Exact window problem: ground-truth states, masked feature grid, and
    per-interval preintegrations (linearized at the true biases)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    k_pts, k_noise, k_imu = jax.random.split(key, 3)

    traj = Trajectory.figure8()
    gravity = jnp.asarray([0.0, 0.0, 9.81], dtype)
    tic = jnp.asarray([0.06, -0.01, 0.02], dtype)
    qic = lie.R2q(jnp.asarray(R_IC_FORWARD, dtype))
    ba = jnp.asarray(ba, dtype)
    bg = jnp.asarray(bg, dtype)

    times = t0 + jnp.arange(frames, dtype=dtype) * frame_dt

    p = jax.vmap(traj.pos_fn)(times).astype(dtype)
    q = jax.vmap(traj.q)(times).astype(dtype)
    v = jax.vmap(traj.vel)(times).astype(dtype)
    state = WindowState(
        p=p, q=q, v=v,
        ba=jnp.tile(ba[None], (frames, 1)), bg=jnp.tile(bg[None], (frames, 1)),
        tic=tic, qic=qic, td=jnp.zeros((), dtype),
    )

    # landmarks in a shell the forward camera actually sees
    points = make_landmarks(k_pts, max_landmarks, center=(0.0, 0.0, 0.8),
                            spread=(14.0, 14.0, 3.0), dtype=dtype)

    pts, valid = jax.vmap(lambda pp, qq: project_points(pp, qq, tic, qic, points))(p, q)
    pts = jnp.swapaxes(pts, 0, 1)  # [L, F, 2]
    valid = jnp.swapaxes(valid, 0, 1)  # [L, F]
    if pix_noise > 0:
        pts = pts + pix_noise * jax.random.normal(k_noise, pts.shape, dtype)

    # anchor = first valid frame; need ≥2 observations to be active
    first = jnp.argmax(valid, axis=1).astype(jnp.int32)
    nobs = jnp.sum(valid, axis=1)
    active = (nobs >= 2) & (first < frames - 2)

    # ground-truth inverse depth in the anchor camera
    def inv_depth_at(l, f):
        P_b = lie.qrotate(lie.qconj(q[f]), points[l] - p[f])
        P_c = lie.qrotate(lie.qconj(qic), P_b - tic)
        return 1.0 / jnp.maximum(P_c[2], 1e-3)

    lam = jax.vmap(inv_depth_at)(jnp.arange(max_landmarks), first)

    obs = FeatureObs(
        pt=pts,
        vel=jnp.zeros_like(pts),
        toff=jnp.zeros((max_landmarks, frames), dtype),
        valid=valid,
        anchor=first,
        inv_depth=lam,
        active=active,
    )

    # preintegrate each interval at the true biases
    n_max = int(round(frame_dt * imu_hz)) + 2
    keys = jax.random.split(k_imu, frames - 1)

    def one_interval(i):
        return generate_imu_interval(
            traj, float(times[0]) + i * frame_dt, float(times[0]) + (i + 1) * frame_dt,
            imu_hz, gravity, n_max, ba=ba, bg=bg,
            noise_acc=noise.acc_n if imu_noise else 0.0,
            noise_gyr=noise.gyr_n if imu_noise else 0.0,
            key=keys[i] if imu_noise else None,
            dtype=dtype,
        )

    ivs = [one_interval(i) for i in range(frames - 1)]
    dts = jnp.stack([x[0] for x in ivs])
    accs = jnp.stack([x[1] for x in ivs])
    gyrs = jnp.stack([x[2] for x in ivs])
    masks = jnp.stack([x[3] for x in ivs])
    pres = jax.vmap(lambda d, a, g, m: preintegrate(d, a, g, ba, bg, noise, m))(
        dts, accs, gyrs, masks
    )
    return WindowProblem(state, obs, pres, gravity, times, points,
                         raw_dt=dts, raw_acc=accs, raw_gyr=gyrs, raw_mask=masks)


def perturb_state(state: WindowState, key, pos_sigma=0.05, rot_sigma=0.02,
                  vel_sigma=0.05, bias_sigma=0.005, skip_first: int = 1):
    """Gaussian perturbation of window states (first `skip_first` frames held)."""
    F = state.p.shape[0]
    dtype = state.p.dtype
    ks = jax.random.split(key, 5)
    m = (jnp.arange(F) >= skip_first).astype(dtype)[:, None]
    dp = pos_sigma * jax.random.normal(ks[0], (F, 3), dtype) * m
    dth = rot_sigma * jax.random.normal(ks[1], (F, 3), dtype) * m
    dv = vel_sigma * jax.random.normal(ks[2], (F, 3), dtype) * m
    dba = bias_sigma * jax.random.normal(ks[3], (F, 3), dtype) * m
    dbg = bias_sigma * jax.random.normal(ks[4], (F, 3), dtype) * m
    return state._replace(
        p=state.p + dp,
        q=lie.qnormalize(lie.qmul(state.q, lie.deltaQ(dth))),
        v=state.v + dv,
        ba=state.ba + dba,
        bg=state.bg + dbg,
    )
