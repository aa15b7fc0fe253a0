"""Measurement queue (native C++ engine + Python fallback): the reference's
estimator_node buffer/alignment runtime (estimator_node.cpp:98-146)."""
import threading

import numpy as np
import pytest

from vins_tpu.io.mq import MeasurementQueue, _native


def _random_stream(seed, n_imu=400, n_img=25, imu_hz=200.0, img_hz=10.0):
    rng = np.random.default_rng(seed)
    t_imu = np.arange(n_imu) / imu_hz + rng.uniform(0, 1e-4, n_imu).cumsum()
    acc = rng.normal(size=(n_imu, 3))
    gyr = rng.normal(size=(n_imu, 3))
    t_img = np.arange(n_img) / img_hz + 0.013
    return t_imu, acc, gyr, t_img


def _drain(q, td=0.0):
    out = []
    while True:
        m = q.next(td=td)
        if m is None:
            return out
        out.append(m)


@pytest.mark.parametrize("native", [False, True])
def test_alignment_matches_iter_measurements(native):
    if native and _native() is None:
        pytest.skip("native lib not built")
    from vins_tpu.io.euroc import CamIndex, ImuData, iter_measurements

    t_imu, acc, gyr, t_img = _random_stream(0)
    q = MeasurementQueue(native=native)
    for k in range(len(t_imu)):
        assert q.push_imu(t_imu[k], acc[k], gyr[k])
    for t in t_img:
        q.push_feature(t, payload=int(t * 1e6))
    q.close()
    got = _drain(q, td=0.003)

    ref = list(iter_measurements(
        ImuData(t_imu, gyr=gyr, acc=acc),
        CamIndex(t_img, [str(i) for i in range(len(t_img))]), td=0.003))
    assert len(got) == len(ref)
    for g, r in zip(got, ref):
        assert g.t_img == r.t_img
        np.testing.assert_array_equal(g.imu_t, r.imu_t)
        np.testing.assert_array_equal(g.imu_acc, r.imu_acc)
        np.testing.assert_array_equal(g.imu_gyr, r.imu_gyr)


@pytest.mark.parametrize("native", [False, True])
def test_out_of_order_imu_rejected(native):
    if native and _native() is None:
        pytest.skip("native lib not built")
    q = MeasurementQueue(native=native)
    assert q.push_imu(1.0, np.zeros(3), np.zeros(3))
    assert not q.push_imu(0.5, np.zeros(3), np.zeros(3))  # rejected
    assert q.push_imu(1.5, np.zeros(3), np.zeros(3))
    assert q.stats()["rejected_imu"] == 1


@pytest.mark.parametrize("native", [False, True])
def test_pre_imu_frames_skipped(native):
    if native and _native() is None:
        pytest.skip("native lib not built")
    q = MeasurementQueue(native=native)
    q.push_feature(0.5)          # before any IMU: silently skipped
    for t in (1.0, 1.1, 1.2, 1.3):
        q.push_imu(t, np.zeros(3), np.zeros(3))
    q.push_feature(1.15, payload=7)
    q.close()
    out = _drain(q)
    assert len(out) == 1
    assert out[0].payload == 7
    # real samples <= t_img plus the interpolated split at exactly t_img
    np.testing.assert_allclose(out[0].imu_t, [1.0, 1.1, 1.15])


@pytest.mark.parametrize("native", [False, True])
def test_boundary_sample_retained(native):
    if native and _native() is None:
        pytest.skip("native lib not built")
    q = MeasurementQueue(native=native)
    for t in np.arange(0.0, 1.0, 0.1):
        q.push_imu(t, np.full(3, t), np.zeros(3))
    q.push_feature(0.25)
    q.push_feature(0.55)
    q.close()
    a, b = _drain(q)
    # interval 2 opens with interval 1's last sample (estimator_node keeps
    # one boundary sample per interval)
    assert a.imu_t[-1] == b.imu_t[0]


@pytest.mark.parametrize("native", [False, True])
def test_threaded_producer_consumer(native):
    if native and _native() is None:
        pytest.skip("native lib not built")
    t_imu, acc, gyr, t_img = _random_stream(1, n_imu=2000, n_img=90)
    q = MeasurementQueue(native=native)
    got = []

    def producer():
        ki = 0
        for k in range(len(t_imu)):
            q.push_imu(t_imu[k], acc[k], gyr[k])
            while ki < len(t_img) and t_img[ki] <= t_imu[k]:
                q.push_feature(t_img[ki], payload=ki)
                ki += 1
        q.close()

    def consumer():
        got.extend(_drain(q))

    tp = threading.Thread(target=producer)
    tc = threading.Thread(target=consumer)
    tc.start(); tp.start()
    tp.join(timeout=30); tc.join(timeout=30)
    assert not tp.is_alive() and not tc.is_alive()
    assert [m.payload for m in got] == list(range(len(got)))
    assert len(got) >= 80
    # every interval ends at/before its frame and chains boundaries
    for i in range(1, len(got)):
        assert got[i].imu_t[0] == got[i - 1].imu_t[-1]


@pytest.mark.parametrize("native", [False, True])
def test_restart_clears(native):
    if native and _native() is None:
        pytest.skip("native lib not built")
    q = MeasurementQueue(native=native)
    q.push_imu(1.0, np.zeros(3), np.zeros(3))
    q.push_feature(2.0)
    q.restart()
    s = q.stats()
    assert s["imu_len"] == 0 and s["feat_len"] == 0
    # after restart, older timestamps are accepted again
    assert q.push_imu(0.1, np.zeros(3), np.zeros(3))


@pytest.mark.parametrize("native", [False, True])
def test_interval_ends_exactly_at_frame_time(native):
    """The straddling IMU sample is split by linear interpolation at exactly
    t_img + td (estimator_node.cpp:246-264)."""
    if native and _native() is None:
        pytest.skip("native lib not built")
    q = MeasurementQueue(native=native)
    # samples at 0.0, 0.1, ... with acc = t (linear -> interp is exact)
    for t in np.arange(0.0, 1.0, 0.1):
        q.push_imu(t, np.full(3, t), np.full(3, 2 * t))
    td = 0.003
    q.push_feature(0.244 - td)
    q.push_feature(0.531 - td)
    q.close()
    a, b = _drain(q, td=td)
    np.testing.assert_allclose(a.imu_t[-1], 0.244)
    np.testing.assert_allclose(a.imu_acc[-1], 0.244)   # linear signal -> exact
    np.testing.assert_allclose(a.imu_gyr[-1], 0.488)
    # the interpolated row is the next interval's opening boundary
    np.testing.assert_allclose(b.imu_t[0], 0.244)
    np.testing.assert_allclose(b.imu_acc[0], a.imu_acc[-1])
    np.testing.assert_allclose(b.imu_t[-1], 0.531)
