"""AR overlay (reference ar_demo/src/ar_demo_node.cpp: virtual cube + axes
projected through the estimated camera pose with landmark occlusion)."""
import jax.numpy as jnp
import numpy as np

from vins_tpu.ar.overlay import (ArOverlay, cube_in_camera, draw_axes,
                                 occlude, rasterize_cube)
from vins_tpu.core.cameras import PinholeCamera

CAM = PinholeCamera.create(460.0, 460.0, 320.0, 240.0)
IMG = np.full((480, 640), 128.0, np.float32)


def _pose_identity():
    return jnp.zeros(3), jnp.asarray([1.0, 0.0, 0.0, 0.0])


def test_cube_renders_in_front():
    p, q = _pose_identity()
    corners = cube_in_camera(p, q, jnp.asarray([0.0, 0.0, 3.0]), 0.8)
    out, zbuf = rasterize_cube(jnp.asarray(IMG), corners, CAM)
    assert out.shape == (480, 640, 3)
    hit = np.isfinite(np.asarray(zbuf))
    assert hit.any()
    # projected footprint is centered and roughly 0.8/3*460 ≈ 123 px wide
    ys, xs = np.nonzero(hit)
    assert abs(xs.mean() - 320) < 3 and abs(ys.mean() - 240) < 3
    assert 100 < np.ptp(xs) < 160
    # nearest cube depth = 3 - 0.4
    assert abs(np.asarray(zbuf)[hit].min() - 2.6) < 0.05
    # pixels changed only inside the footprint
    base = np.broadcast_to(IMG[..., None], (480, 640, 3))
    changed = np.any(np.asarray(out) != base, -1)
    assert changed[hit].all() and not changed[~hit].any()


def test_cube_behind_camera_invisible():
    p, q = _pose_identity()
    corners = cube_in_camera(p, q, jnp.asarray([0.0, 0.0, -3.0]), 0.8)
    out, zbuf = rasterize_cube(jnp.asarray(IMG), corners, CAM)
    assert not np.isfinite(np.asarray(zbuf)).any()


def test_occlusion_hides_cube():
    p, q = _pose_identity()
    corners = cube_in_camera(p, q, jnp.asarray([0.0, 0.0, 3.0]), 0.8)
    out, zbuf = rasterize_cube(jnp.asarray(IMG), corners, CAM)
    # a landmark at 1.5 m straight ahead occludes the cube center pixels
    lm_uv = jnp.asarray([[320.0, 240.0]])
    occ = occlude(out, jnp.asarray(IMG), zbuf, lm_uv, jnp.asarray([1.5]),
                  jnp.asarray([True]), radius=10.0)
    occ = np.asarray(occ)
    assert np.allclose(occ[240, 320], 128.0)   # restored base image
    assert not np.allclose(occ[240, 280], 128.0)  # outside splat: cube stays


def test_axes_drawn():
    p = jnp.asarray([0.0, 0.0, -2.0])  # camera 2 m behind world origin
    q = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    rgb = jnp.broadcast_to(jnp.asarray(IMG)[..., None], (480, 640, 3))
    out = np.asarray(draw_axes(rgb, p, q, CAM, jnp.zeros(3)))
    # z axis points away: projects to the principal point; x axis extends +u
    assert (out != 128.0).any()
    reds = (out[..., 0] == 255) & (out[..., 1] == 0)
    assert reds.any()
    ys, xs = np.nonzero(reds)
    assert xs.max() > 320


def test_overlay_wrapper_end_to_end():
    ov = ArOverlay(camera=CAM, center_w=jnp.asarray([0.0, 0.0, 3.0]), size=0.8)
    p, q = _pose_identity()
    lm_w = jnp.asarray([[0.0, 0.0, 1.5], [5.0, 5.0, 50.0]])
    out = ov.render(IMG, p, q, lm_w=lm_w, lm_valid=jnp.asarray([True, True]))
    out = np.asarray(out)
    assert out.shape == (480, 640, 3)
    assert np.allclose(out[240, 320], 128.0)  # occluded center
