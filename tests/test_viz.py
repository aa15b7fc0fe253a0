"""Debug imagery + observability (feature_tracker_node.cpp:167-201 track
overlay, keyframe.cpp:416-468 loop-match image, pubPointCloud, and
printStatistics, visualization.cpp:92-137)."""
import numpy as np

from vins_tpu.utils.viz import (draw_loop_match, draw_track_overlay, save_pgm,
                                save_ppm, write_ply)


def test_track_overlay_colors_by_age():
    img = np.full((60, 80), 100.0)
    uv = np.array([[10.0, 10.0], [50.0, 30.0]])
    cnt = np.array([1, 40])  # fresh vs long-tracked
    rgb = draw_track_overlay(img, uv, cnt, window=20)
    assert rgb.shape == (60, 80, 3)
    assert rgb[10, 10, 2] > 200 and rgb[10, 10, 0] < 50   # fresh: blue
    assert rgb[30, 50, 0] > 200 and rgb[30, 50, 2] < 50   # old: red


def test_loop_match_side_by_side(tmp_path):
    a = np.full((40, 60), 80.0)
    b = np.full((40, 60), 120.0)
    uc = np.array([[5.0, 5.0], [20.0, 30.0]])
    uo = np.array([[50.0, 6.0], [10.0, 28.0]])
    out = draw_loop_match(a, b, uc, uo, inliers=np.array([True, False]))
    assert out.shape == (40, 120, 3)
    # a green line exists somewhere between the first pair
    assert (out[:, :, 1] == 255).any()
    save_ppm(str(tmp_path / "m.ppm"), out)
    save_pgm(str(tmp_path / "g.pgm"), a)
    write_ply(str(tmp_path / "c.ply"), np.random.default_rng(0).normal(size=(5, 3)))
    assert (tmp_path / "m.ppm").stat().st_size > 100
    assert "element vertex 5" in (tmp_path / "c.ply").read_text()


def test_pipeline_statistics_report():
    import jax.numpy as jnp

    from vins_tpu.config import VinsConfig
    from vins_tpu.core.cameras import PinholeCamera
    from vins_tpu.pipeline import Pipeline

    cfg = VinsConfig(loop_closure=True)
    pipe = Pipeline(cfg, PinholeCamera.create(460.0, 460.0, 376.0, 240.0))
    rep = pipe.print_statistics()
    assert "position" in rep and "extrinsic" in rep and "pose graph" in rep
    assert pipe.landmarks_world().shape == (0, 3)
    assert pipe.debug_track_overlay() is None
