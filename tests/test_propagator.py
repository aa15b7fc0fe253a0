"""Batched vs per-sample midpoint propagation equivalence.

The estimator defers its newest-state propagation (estimator.cpp:107-114)
from IMU rate to one vectorized batch per frame; this must be the exact same
recurrence.  The per-sample reference here is the literal transcription the
per-IMU path used before the batching (and still uses in ImuPropagator)."""
import numpy as np

from vins_tpu.core import nplie
from vins_tpu.estimator.propagator import ImuPropagator, midpoint_propagate_batch

G = np.array([0.0, 0.0, 9.81])


def _sequential(p, q, v, ba, bg, dt, acc, gyr):
    p, q, v = p.copy(), q.copy(), v.copy()
    for k in range(len(dt)):
        un_acc_0 = nplie.qrotate(q, acc[k] - ba) - G
        un_gyr = 0.5 * (gyr[k] + gyr[k + 1]) - bg
        q = nplie.qmul(q, np.array([1.0, *(0.5 * un_gyr * dt[k])]))
        q = q / np.linalg.norm(q)
        un_acc_1 = nplie.qrotate(q, acc[k + 1] - ba) - G
        un_acc = 0.5 * (un_acc_0 + un_acc_1)
        p = p + dt[k] * v + 0.5 * dt[k] ** 2 * un_acc
        v = v + dt[k] * un_acc
    return p, q, v


def test_batch_matches_sequential():
    rng = np.random.default_rng(3)
    for n in (1, 2, 7, 20):
        dt = rng.uniform(0.004, 0.006, n)
        acc = rng.normal([0, 0, 9.81], 1.0, (n + 1, 3))
        gyr = rng.normal(0.0, 0.5, (n + 1, 3))
        p0, v0 = rng.normal(0, 1, 3), rng.normal(0, 0.5, 3)
        q0 = nplie.qnormalize(rng.normal(0, 1, 4))
        ba, bg = rng.normal(0, 0.05, 3), rng.normal(0, 0.01, 3)
        pb, qb, vb = midpoint_propagate_batch(
            p0, q0, v0, ba, bg, G, dt, acc, gyr)
        ps, qs, vs = _sequential(p0, q0, v0, ba, bg, dt, acc, gyr)
        np.testing.assert_allclose(pb, ps, atol=1e-12)
        np.testing.assert_allclose(qb, qs, atol=1e-14)
        np.testing.assert_allclose(vb, vs, atol=1e-12)


def test_imu_rate_predictor_matches_batch():
    """ImuPropagator.predict's per-sample chain (its job is per-sample
    output) must agree with the frame-rate batch over the same samples."""
    rng = np.random.default_rng(5)
    n = 20
    dt = 0.005
    acc = rng.normal([0, 0, 9.81], 0.8, (n + 1, 3))
    gyr = rng.normal(0.0, 0.4, (n + 1, 3))
    prop = ImuPropagator(g_norm=9.81)
    prop.predict(0.0, acc[0], gyr[0])  # boundary sample sets prev
    for k in range(n):
        prop.predict((k + 1) * dt, acc[k + 1], gyr[k + 1])
    pb, qb, vb = midpoint_propagate_batch(
        np.zeros(3), np.array([1.0, 0, 0, 0]), np.zeros(3),
        np.zeros(3), np.zeros(3), G, np.full(n, dt), acc, gyr)
    np.testing.assert_allclose(prop.p, pb, atol=1e-12)
    np.testing.assert_allclose(prop.q, qb, atol=1e-14)
    np.testing.assert_allclose(prop.v, vb, atol=1e-12)
