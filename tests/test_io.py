"""I/O tests: PNG decode (native C++ and pure-Python paths), EuRoC CSV
parsing + measurement alignment, TUM trajectory writing."""
import os
import subprocess

import numpy as np
import pytest

from vins_tpu.io.euroc import (GroundTruth, ImuData, CamIndex,
                               iter_measurements, load_groundtruth, write_tum)
from vins_tpu.io.png import _native, _read_png_gray_py, read_png_gray, write_png_gray


@pytest.fixture(scope="module")
def png_file(tmp_path_factory):
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (48, 64), np.uint8)
    path = str(tmp_path_factory.mktemp("png") / "t.png")
    write_png_gray(path, img)
    return path, img


def test_png_python_decoder(png_file):
    path, img = png_file
    out = _read_png_gray_py(path)
    np.testing.assert_array_equal(out, img)


def test_png_native_decoder(png_file):
    # build on demand so the test works from a clean checkout
    root = os.path.join(os.path.dirname(__file__), "..", "native")
    if not os.path.exists(os.path.join(root, "libvinsio.so")):
        subprocess.run(["make", "-C", root], check=True)
        import vins_tpu.io.png as pngmod

        pngmod._LIB_TRIED = False  # retry load
    lib = _native()
    assert lib is not None, "native decoder failed to build/load"
    path, img = png_file
    out = read_png_gray(path)
    np.testing.assert_array_equal(out, img)


def test_measurement_alignment():
    imu = ImuData(
        t=np.arange(0.0, 2.0, 0.01),
        gyr=np.zeros((200, 3)),
        acc=np.tile([0.0, 0, 9.81], (200, 1)),
    )
    cam = CamIndex(t=np.arange(0.1, 1.9, 0.1), paths=["x"] * 18)
    ms = list(iter_measurements(imu, cam))
    assert len(ms) == 18
    # every interval ends at/before its image and the boundary sample is kept
    t_prev = None
    for m in ms:
        assert (m.imu_t <= m.t_img + 1e-9).all()
        if t_prev is not None:
            assert m.imu_t[0] <= t_prev + 0.01 + 1e-9  # boundary retained
        t_prev = m.t_img
    total = sum(len(m.imu_t) for m in ms)
    assert total >= 180  # no dropped spans


def test_groundtruth_reader_reference_csv():
    path = "/root/reference/benchmark_publisher/config/MH_05_difficult/data.csv"
    gt = load_groundtruth(path)
    assert len(gt.t) > 1000
    assert abs(np.linalg.norm(gt.q[0]) - 1.0) < 1e-6


def test_tum_roundtrip(tmp_path):
    t = np.array([1.0, 2.0])
    p = np.array([[1.0, 2, 3], [4, 5, 6]])
    q = np.array([[1.0, 0, 0, 0], [0.707, 0.707, 0, 0]])
    path = str(tmp_path / "traj.tum")
    write_tum(path, t, p, q)
    d = np.loadtxt(path)
    np.testing.assert_allclose(d[:, 1:4], p, atol=1e-6)
    np.testing.assert_allclose(d[0, 7], 1.0, atol=1e-6)  # qw last
