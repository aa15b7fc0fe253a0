"""Measurement queue: thread-safe IMU/feature alignment runtime.

The online counterpart of the reference's estimator_node buffer machinery
(vins_estimator/src/estimator_node.cpp: imu_buf/feature_buf + condvar,
`getMeasurements` :98-136, out-of-order IMU rejection :138-146).  The native
C++ engine (native/measurement_queue.cc in libvinsio.so) carries the hot
path — lock-held deque surgery at IMU rate — off the GIL so a decoder thread
and the estimator thread can run concurrently; a pure-Python fallback with
identical semantics takes over when the library isn't built.

Alignment contract (shared with io/euroc.py::iter_measurements): for a frame
at t_img, deliver every IMU sample with t <= t_img + td; when the last real
sample lands strictly before t_img + td, append a row linearly interpolated
at exactly t_img + td (the straddling-sample split of
estimator_node.cpp:246-264) so every interval ends at the frame time.  The
final delivered row is retained as the next interval's opening boundary, so
consecutive intervals tile the timeline with no gap; frames older than the
whole IMU buffer are dropped.
"""
from __future__ import annotations

import ctypes
import os
import threading
from typing import NamedTuple

import numpy as np

_LIB = None
_LIB_TRIED = False


def _native():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    path = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                        "libvinsio.so")
    try:
        lib = ctypes.CDLL(os.path.abspath(path))
    except OSError:
        _LIB = None  # not built: Python fallback, silently
        return _LIB
    try:
        d = ctypes.c_double
        dp = ctypes.POINTER(d)
        lib.vmq_create.restype = ctypes.c_void_p
        lib.vmq_create.argtypes = [ctypes.c_long, ctypes.c_long]
        lib.vmq_destroy.argtypes = [ctypes.c_void_p]
        lib.vmq_push_imu.argtypes = [ctypes.c_void_p, d, dp, dp]
        lib.vmq_push_feature.argtypes = [ctypes.c_void_p, d, ctypes.c_int64]
        lib.vmq_close.argtypes = [ctypes.c_void_p]
        lib.vmq_restart.argtypes = [ctypes.c_void_p]
        lib.vmq_stats.argtypes = [ctypes.c_void_p] + [ctypes.POINTER(ctypes.c_long)] * 4
        lib.vmq_next.restype = ctypes.c_long
        lib.vmq_next.argtypes = [ctypes.c_void_p, d, dp, ctypes.c_long,
                                 dp, ctypes.POINTER(ctypes.c_int64), ctypes.c_int]
        _LIB = lib
    except AttributeError as e:
        # the .so exists but predates the queue symbols: loud, not silent —
        # a stale binary must never quietly downgrade the runtime
        raise RuntimeError(
            f"stale native/libvinsio.so (missing {e}); rebuild with "
            "`make -C native`") from e
    return _LIB


class Aligned(NamedTuple):
    t_img: float
    payload: int
    imu_t: np.ndarray      # [n]
    imu_acc: np.ndarray    # [n,3]
    imu_gyr: np.ndarray    # [n,3]


class _NativeQueue:
    def __init__(self, lib, imu_cap: int, feat_cap: int, max_rows: int):
        self._lib = lib
        self._h = lib.vmq_create(imu_cap, feat_cap)
        self._buf = np.empty((max_rows, 7), np.float64)

    def push_imu(self, t, acc, gyr) -> bool:
        a = np.ascontiguousarray(acc, np.float64)
        g = np.ascontiguousarray(gyr, np.float64)
        rc = self._lib.vmq_push_imu(
            self._h, float(t),
            a.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            g.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        return rc == 0

    def push_feature(self, t, payload: int = 0) -> bool:
        return self._lib.vmq_push_feature(self._h, float(t), int(payload)) == 0

    def close(self):
        self._lib.vmq_close(self._h)

    def restart(self):
        self._lib.vmq_restart(self._h)

    def stats(self):
        vals = [ctypes.c_long() for _ in range(4)]
        self._lib.vmq_stats(self._h, *[ctypes.byref(v) for v in vals])
        return {"dropped_frames": vals[0].value, "rejected_imu": vals[1].value,
                "imu_len": vals[2].value, "feat_len": vals[3].value}

    def next(self, td: float = 0.0, blocking: bool = True):
        t_img = ctypes.c_double()
        payload = ctypes.c_int64()
        while True:
            n = self._lib.vmq_next(
                self._h, float(td),
                self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                self._buf.shape[0], ctypes.byref(t_img), ctypes.byref(payload),
                1 if blocking else 0)
            if n <= -2:
                self._buf = np.empty((-(n + 2) * 2, 7), np.float64)
                continue
            if n == 0:
                return None
            if n == -1:
                raise BlockingIOError("no aligned measurement ready")
            rows = self._buf[:n]
            return Aligned(t_img.value, payload.value, rows[:, 0].copy(),
                           rows[:, 1:4].copy(), rows[:, 4:7].copy())

    def __del__(self):
        lib = getattr(self, "_lib", None)
        if lib is not None and getattr(self, "_h", None):
            lib.vmq_destroy(self._h)
            self._h = None


class _PyQueue:
    """Pure-Python fallback, semantics identical to the native engine."""

    def __init__(self, imu_cap: int, feat_cap: int):
        self._imu: list = []
        self._feat: list = []
        self._last_imu_t = -np.inf
        self._imu_cap, self._feat_cap = imu_cap, feat_cap
        self._closed = False
        self._first = True
        self._dropped = 0
        self._rejected = 0
        self._cv = threading.Condition()

    def push_imu(self, t, acc, gyr) -> bool:
        with self._cv:
            if t <= self._last_imu_t or len(self._imu) >= self._imu_cap:
                self._rejected += t <= self._last_imu_t
                return False
            self._last_imu_t = t
            self._imu.append((float(t), np.asarray(acc, float).copy(),
                              np.asarray(gyr, float).copy()))
            self._cv.notify_all()
            return True

    def push_feature(self, t, payload: int = 0) -> bool:
        with self._cv:
            if len(self._feat) >= self._feat_cap:
                return False
            self._feat.append((float(t), int(payload)))
            self._cv.notify_all()
            return True

    def close(self):
        with self._cv:
            self._closed = True
            self._cv.notify_all()

    def restart(self):
        with self._cv:
            self._imu.clear()
            self._feat.clear()
            self._last_imu_t = -np.inf
            self._first = True
            self._closed = False
            self._cv.notify_all()

    def stats(self):
        with self._cv:
            return {"dropped_frames": self._dropped, "rejected_imu": self._rejected,
                    "imu_len": len(self._imu), "feat_len": len(self._feat)}

    def next(self, td: float = 0.0, blocking: bool = True):
        with self._cv:
            while True:
                if self._feat and self._imu:
                    t_f, payload = self._feat[0]
                    t_end = t_f + td
                    if self._imu[0][0] > t_end:
                        self._feat.pop(0)
                        if not self._first:
                            self._dropped += 1
                        continue
                    if self._imu[-1][0] > t_end:
                        n = 0
                        while n < len(self._imu) and self._imu[n][0] <= t_end:
                            n += 1
                        rows = list(self._imu[:n])
                        if rows[-1][0] < t_end:
                            # split the straddling sample: linear interp at
                            # exactly t_end (estimator_node.cpp:246-264)
                            t0, a0, g0 = self._imu[n - 1]
                            t1, a1, g1 = self._imu[n]
                            w = (t_end - t0) / (t1 - t0)
                            interp = (t_end, a0 + w * (a1 - a0),
                                      g0 + w * (g1 - g0))
                            rows.append(interp)
                            del self._imu[:n]
                            self._imu.insert(0, interp)
                        else:
                            del self._imu[: n - 1]
                        self._feat.pop(0)
                        self._first = False
                        self._cv.notify_all()
                        return Aligned(
                            t_f, payload,
                            np.asarray([r[0] for r in rows]),
                            np.stack([r[1] for r in rows]),
                            np.stack([r[2] for r in rows]),
                        )
                if self._closed:
                    return None
                if not blocking:
                    raise BlockingIOError("no aligned measurement ready")
                self._cv.wait()


def MeasurementQueue(imu_cap: int = 1 << 20, feat_cap: int = 1 << 16,
                     max_rows: int = 4096, native: bool | None = None):
    """Create a measurement queue; native C++ engine when available (or
    `native=True` to require it), Python otherwise."""
    lib = _native()
    if native is None:
        native = lib is not None
    if native:
        if lib is None:
            raise RuntimeError("libvinsio.so with vmq_* not built; run `make -C native`")
        return _NativeQueue(lib, imu_cap, feat_cap, max_rows)
    return _PyQueue(imu_cap, feat_cap)
