"""Synthetic ground-truth generator — the estimator's test harness.

TPU-native analog of the reference's data_generator package
(data_generator/src/data_generator.cpp:17-49: deterministic closed-form
trajectory, 500 random landmarks in a box, perfect IMU + feature tracks in
the front-end wire format, with optional noise/bias injection toggles).

Here the trajectory is an analytic function of time and *all* derivatives
(velocity, acceleration, body rates) come from `jax.jacfwd` — no finite
differencing, so the generated IMU is exact to machine precision and the
estimator can be tested at zero noise.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie


class Trajectory(NamedTuple):
    """Closed-form trajectory: world position + body orientation vs time."""

    pos_fn: Callable  # t -> [3]
    ypr_fn: Callable  # t -> [3] radians (yaw, pitch, roll)

    @staticmethod
    def figure8(scale: float = 4.0, period: float = 20.0, height: float = 1.2):
        """A smooth figure-8 with bounded excitation on all axes."""
        w = 2.0 * jnp.pi / period

        def pos(t):
            return jnp.stack([
                scale * jnp.sin(w * t),
                0.5 * scale * jnp.sin(2.0 * w * t),
                height * jnp.sin(3.0 * w * t) * 0.3,
            ])

        def ypr(t):
            return jnp.stack([
                0.6 * jnp.sin(w * t),
                0.25 * jnp.sin(2.0 * w * t + 0.5),
                0.2 * jnp.sin(1.5 * w * t + 1.0),
            ])

        return Trajectory(pos, ypr)

    @staticmethod
    def circuit(radius: float = 4.0, period: float = 30.0, height: float = 1.0):
        """A closed circuit inside the textured room (sim/render.py): the
        body flies the circle facing along the path (forward camera sees the
        walls), with small z/pitch/roll excitation for IMU observability.
        After exactly `period` seconds the pose repeats — a genuine revisit
        for loop-closure tests."""
        w = 2.0 * jnp.pi / period

        def pos(t):
            return jnp.stack([
                radius * jnp.cos(w * t),
                radius * jnp.sin(w * t),
                height + 0.25 * jnp.sin(4.0 * w * t),
            ])

        def ypr(t):
            return jnp.stack([
                w * t + jnp.pi / 2.0 + 0.08 * jnp.sin(5.0 * w * t),
                0.12 * jnp.sin(3.0 * w * t + 0.4),
                0.10 * jnp.sin(2.0 * w * t + 0.7),
            ])

        return Trajectory(pos, ypr)

    def R(self, t):
        return lie.ypr2R(self.ypr_fn(t) * 180.0 / jnp.pi)

    def q(self, t):
        return lie.R2q(self.R(t))

    def vel(self, t):
        return jax.jacfwd(self.pos_fn)(t)

    def acc_world(self, t):
        return jax.jacfwd(lambda s: jax.jacfwd(self.pos_fn)(s))(t)

    def omega_body(self, t):
        """Body angular rate from skew(ω_b) = Rᵀ dR/dt."""
        dR = jax.jacfwd(lambda s: self.R(s))(t)
        W = self.R(t).T @ dR
        return jnp.stack([W[2, 1], W[0, 2], W[1, 0]])

    def imu_at(self, t, gravity):
        """Exact accelerometer/gyro specific-force measurements."""
        a_b = self.R(t).T @ (self.acc_world(t) + gravity)
        return a_b, self.omega_body(t)


def generate_imu_interval(
    traj: Trajectory,
    t0: float,
    t1: float,
    hz: float,
    gravity: jax.Array,
    n_max: int,
    ba: jax.Array | None = None,
    bg: jax.Array | None = None,
    noise_acc: float = 0.0,
    noise_gyr: float = 0.0,
    key: jax.Array | None = None,
    dtype=jnp.float64,
):
    """Sample IMU between two frames, padded to n_max steps.

    Returns (dt [n_max], acc [n_max+1, 3], gyr [n_max+1, 3], mask [n_max]).
    """
    n = int(round((t1 - t0) * hz))
    assert n <= n_max, (n, n_max)
    ts = t0 + jnp.arange(n_max + 1, dtype=dtype) / hz
    ts = jnp.minimum(ts, t1)
    a, w = jax.vmap(lambda t: traj.imu_at(t, gravity))(ts)
    a = a.astype(dtype)
    w = w.astype(dtype)
    if ba is not None:
        a = a + ba
    if bg is not None:
        w = w + bg
    if key is not None and (noise_acc > 0 or noise_gyr > 0):
        k1, k2 = jax.random.split(key)
        a = a + noise_acc * jax.random.normal(k1, a.shape, dtype)
        w = w + noise_gyr * jax.random.normal(k2, w.shape, dtype)
    dt = jnp.diff(ts)
    mask = jnp.arange(n_max) < n
    return dt, a, w, mask


def make_landmarks(key, n: int, center=(0.0, 0.0, 0.0), spread=(12.0, 12.0, 4.0),
                   dtype=jnp.float64):
    """Random 3D points in a box (data_generator.cpp:17-23 uses ±30 m)."""
    u = jax.random.uniform(key, (n, 3), minval=-1.0, maxval=1.0, dtype=dtype)
    return jnp.asarray(center, dtype) + u * jnp.asarray(spread, dtype)


def project_points(
    p_wb: jax.Array,  # [3] body position
    q_wb: jax.Array,  # [4]
    tic: jax.Array,
    qic: jax.Array,
    points: jax.Array,  # [N, 3] world
    z_min: float = 0.3,
    tan_fov: float = 1.0,
):
    """Project world points into the (normalized-plane) camera at a pose.

    Returns (pt [N, 2] normalized coords, valid [N])."""
    P_b = lie.qrotate(lie.qconj(q_wb), points - p_wb[None])
    P_c = lie.qrotate(lie.qconj(qic), P_b - tic[None])
    z = P_c[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    pt = P_c[:, :2] / zs[:, None]
    valid = (z > z_min) & (jnp.abs(pt[:, 0]) < tan_fov) & (jnp.abs(pt[:, 1]) < tan_fov)
    return pt, valid


def feature_velocity(
    traj: Trajectory, t, tic, qic, points, dtype=jnp.float64
):
    """Analytic normalized-plane velocity of each landmark at time t
    (what undistortedPoints computes by finite differencing,
    feature_tracker.cpp:258-306)."""

    def pt_of_t(s):
        pt, _ = project_points(traj.pos_fn(s), traj.q(s), tic, qic, points)
        return pt

    return jax.jacfwd(pt_of_t)(jnp.asarray(t, dtype))


class SimScene(NamedTuple):
    """A bundled synthetic scene for estimator-level tests."""

    traj: Trajectory
    points: jax.Array
    tic: jax.Array
    qic: jax.Array
    gravity: jax.Array
