"""IMU-rate state propagation for low-latency output.

Re-expression of the reference's `predict`/`update` pair in the estimator
node (vins_estimator/src/estimator_node.cpp:42-96): between optimized frames
the latest pose is midpoint-propagated at IMU rate (published as
`imu_propagate` for control loops); after every solve the propagator is
re-based onto the optimized state and the buffered IMU since the frame
timestamp is replayed.  Pure numpy — the math is ~30 flops per sample and
latency-critical, so no device round-trip.
"""
from __future__ import annotations

import collections

import numpy as np


def _quat_mul(a, b):
    w1, x1, y1, z1 = a
    w2, x2, y2, z2 = b
    return np.array([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ])


def _quat_rot(q, v):
    w, x, y, z = q
    R = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])
    return R @ v


def _delta_q(w_dt):
    return np.array([1.0, 0.5 * w_dt[0], 0.5 * w_dt[1], 0.5 * w_dt[2]])


class ImuPropagator:
    def __init__(self, g_norm: float = 9.81007, buf_len: int = 2000):
        self.g = np.array([0.0, 0.0, g_norm])
        self.buf = collections.deque(maxlen=buf_len)  # (t, acc, gyr)
        self.reset()

    def reset(self):
        self.t = None
        self.p = np.zeros(3)
        self.q = np.array([1.0, 0, 0, 0])
        self.v = np.zeros(3)
        self.ba = np.zeros(3)
        self.bg = np.zeros(3)
        self.acc_prev = np.zeros(3)
        self.gyr_prev = np.zeros(3)

    def predict(self, t: float, acc, gyr):
        """One IMU sample (estimator_node.cpp:42-78).  Returns (p, q, v)."""
        acc = np.asarray(acc, float)
        gyr = np.asarray(gyr, float)
        self.buf.append((t, acc, gyr))
        if self.t is None:
            self.t = t
            self.acc_prev, self.gyr_prev = acc, gyr
            return self.p, self.q, self.v
        dt = t - self.t
        self.t = t
        un_acc_0 = _quat_rot(self.q, self.acc_prev - self.ba) - self.g
        un_gyr = 0.5 * (self.gyr_prev + gyr) - self.bg
        self.q = _quat_mul(self.q, _delta_q(un_gyr * dt))
        self.q /= np.linalg.norm(self.q)
        un_acc_1 = _quat_rot(self.q, acc - self.ba) - self.g
        un_acc = 0.5 * (un_acc_0 + un_acc_1)
        self.p = self.p + dt * self.v + 0.5 * dt * dt * un_acc
        self.v = self.v + dt * un_acc
        self.acc_prev, self.gyr_prev = acc, gyr
        return self.p, self.q, self.v

    def rebase(self, t: float, p, q, v, ba, bg):
        """Re-sync onto an optimized state and replay buffered IMU newer than
        t (estimator_node.cpp:80-96 update())."""
        self.t = t
        self.p = np.asarray(p, float).copy()
        self.q = np.asarray(q, float).copy()
        self.v = np.asarray(v, float).copy()
        self.ba = np.asarray(ba, float).copy()
        self.bg = np.asarray(bg, float).copy()
        replay = [s for s in self.buf if s[0] > t]
        self.buf.clear()
        if replay:
            self.acc_prev, self.gyr_prev = replay[0][1], replay[0][2]
        for s in replay:
            self.predict(*s)
