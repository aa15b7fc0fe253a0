"""Config-file loading + fisheye mask (the reference's per-platform yaml
system, readParameters in feature_tracker/vins_estimator/pose_graph)."""
import os

import numpy as np

from vins_tpu.config import load_config
from vins_tpu.pipeline import circular_fov_mask

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_load_euroc_config():
    cfg = load_config(os.path.join(ROOT, "config/euroc.yaml"))
    assert cfg.image_width == 752 and cfg.image_height == 480
    assert cfg.max_cnt == 150 and cfg.min_dist == 30
    assert cfg.camera["model_type"] == "PINHOLE"
    assert abs(cfg.camera["projection_parameters"]["fx"] - 461.6) < 1e-6
    assert cfg.acc_n == 0.08 and cfg.g_norm == 9.81007
    assert cfg.loop_closure and not cfg.estimate_td and not cfg.fisheye
    R = np.asarray(cfg.extrinsic_R)
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-6)


def test_load_tum_config():
    cfg = load_config(os.path.join(ROOT, "config/tum.yaml"))
    assert cfg.camera["model_type"] == "KANNALA_BRANDT"
    assert cfg.fisheye
    assert cfg.image_width == 512

    from vins_tpu.core.cameras import camera_from_yaml

    cam = camera_from_yaml(cfg.camera)
    import jax.numpy as jnp

    uv = jnp.asarray([[256.0, 256.0], [300.0, 200.0]])
    rays = cam.lift(uv)
    uv2 = cam.project(rays)
    assert np.allclose(np.asarray(uv2), np.asarray(uv), atol=1e-3)


def test_load_simulation_config():
    cfg = load_config(os.path.join(ROOT, "config/simulation.yaml"))
    assert not cfg.loop_closure
    assert cfg.camera["distortion_parameters"]["k1"] == 0.0


def test_circular_fov_mask():
    m = circular_fov_mask(480, 752)
    assert m[240, 376]  # center in
    assert not m[0, 0] and not m[479, 751]  # corners out
    assert not m[240, 0] and not m[240, 751]  # left/right edge out (r=h/2)
    assert m[240, 376 - 200] and m[240, 376 + 200]


def test_all_platform_configs_load_and_build_cameras():
    """Every shipped platform yaml (the reference's config/<platform>
    packages) parses and builds its camera model; MEI platforms exercise the
    unified-sphere model at runtime, realsense exercises rolling shutter."""
    import os

    import jax.numpy as jnp
    import numpy as np

    from vins_tpu.config import load_config
    from vins_tpu.core.cameras import (EquidistantCamera, MeiCamera,
                                       PinholeCamera, camera_from_yaml)

    base = os.path.join(os.path.dirname(__file__), "..", "config")
    expect = {
        "euroc.yaml": PinholeCamera,
        "tum.yaml": EquidistantCamera,
        "cla.yaml": EquidistantCamera,
        "3dm.yaml": MeiCamera,
        "black_box.yaml": MeiCamera,
        "realsense.yaml": PinholeCamera,
        "realsense_fisheye.yaml": EquidistantCamera,
    }
    for name, cls in expect.items():
        cfg = load_config(os.path.join(base, name))
        cam = camera_from_yaml(cfg.camera, dtype=jnp.float64)
        assert isinstance(cam, cls), (name, type(cam))
        # project/lift round trip near the center third of the image
        P = jnp.asarray([[0.2, -0.1, 1.0], [0.05, 0.12, 2.0]])
        uv = cam.project(P)
        rays = cam.lift(uv)
        np.testing.assert_allclose(
            np.asarray(rays[:, :2] / rays[:, 2:3]),
            np.asarray(P[:, :2] / P[:, 2:3]), atol=1e-5)
    # rolling-shutter platform wired through config
    rs = load_config(os.path.join(base, "realsense.yaml"))
    assert rs.rolling_shutter and abs(rs.rolling_shutter_tr - 0.033) < 1e-9
    assert rs.estimate_td
    bb = load_config(os.path.join(base, "black_box.yaml"))
    assert bb.estimate_extrinsic == 1 and abs(bb.pg_skip_dis - 0.1) < 1e-9
