"""AR overlay — the TPU-native counterpart of the reference's ar_demo
(ar_demo/src/ar_demo_node.cpp: a 0.8 m virtual cube + world axes placed in
the map, projected through the estimated camera pose and drawn
occlusion-aware on the live image; `project_object` :170, `callback` :354).

Re-expressed as dense fixed-shape device math instead of per-pixel OpenCV
polygon fills:

  * cube faces → 12 triangles → per-pixel barycentric coverage + interpolated
    depth, z-buffered with one argmin over triangles (one fused program, no
    painter's-algorithm sort),
  * world axes → distance-to-segment masks,
  * occlusion vs the estimated landmark cloud → splat landmark depths into a
    dilated sparse z-map and hide cube pixels that fall behind it (the
    reference culls by comparing the cube's corner depths to nearby point
    cloud; keyframe.cpp-free equivalent).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie

# unit cube corners (±0.5), and the 6 faces as corner-index quads
_CORNERS = jnp.asarray(
    [[x, y, z] for x in (-0.5, 0.5) for y in (-0.5, 0.5) for z in (-0.5, 0.5)]
)
# faces: -x +x -y +y -z +z (right-handed quads)
_FACES = jnp.asarray([
    [0, 1, 3, 2], [4, 6, 7, 5],
    [0, 4, 5, 1], [2, 3, 7, 6],
    [0, 2, 6, 4], [1, 5, 7, 3],
], jnp.int32)
# per-face RGB (matches the reference's one-color-per-face cube)
_FACE_RGB = jnp.asarray([
    [255, 80, 80], [180, 0, 0],
    [80, 255, 80], [0, 180, 0],
    [80, 80, 255], [0, 0, 180],
], jnp.float32)


def cube_in_camera(p_wc: jax.Array, q_wc: jax.Array, center_w: jax.Array,
                   size: float | jax.Array = 0.8):
    """Camera-frame coordinates of the cube's 8 corners.  (p_wc, q_wc) is the
    world-from-camera pose, as published on /vins_estimator/camera_pose."""
    q_cw = lie.qconj(q_wc)
    Pw = _CORNERS.astype(p_wc.dtype) * size + center_w
    return jax.vmap(lambda X: lie.qrotate(q_cw, X - p_wc))(Pw)  # [8,3]


@functools.partial(jax.jit, static_argnames=("alpha",))
def rasterize_cube(img: jax.Array, corners_cam: jax.Array, cam,
                   alpha: float = 0.6):
    """Draw the cube onto `img` ([H,W] gray or [H,W,3]); z-buffer over the 12
    face triangles in one vectorized pass.  `cam` is any core.cameras model
    (a NamedTuple pytree with a batched .project).
    Returns ([H,W,3] float RGB, [H,W] cube depth with +inf where empty)."""
    H, W = img.shape[:2]
    rgb = img[..., None] * jnp.ones((3,), img.dtype) if img.ndim == 2 else img
    rgb = rgb.astype(jnp.float32)

    uv = cam.project(corners_cam)                  # [8,2]
    z = corners_cam[:, 2]                           # [8]

    quads = _FACES                                  # [6,4]
    tri_idx = jnp.concatenate(
        [quads[:, jnp.asarray([0, 1, 2])], quads[:, jnp.asarray([0, 2, 3])]], 0
    )                                               # [12,3]
    tri_face = jnp.concatenate([jnp.arange(6)] * 2) # [12]

    pa, pb, pc = (uv[tri_idx[:, k]] for k in range(3))     # [12,2] each
    za, zb, zc = (z[tri_idx[:, k]] for k in range(3))      # [12]

    yy, xx = jnp.mgrid[:H, :W]
    p = jnp.stack([xx, yy], -1).astype(jnp.float32)        # [H,W,2]

    def edge(a, b, q):
        return ((b[:, 0] - a[:, 0])[:, None, None]
                * (q[None, ..., 1] - a[:, 1][:, None, None])
                - (b[:, 1] - a[:, 1])[:, None, None]
                * (q[None, ..., 0] - a[:, 0][:, None, None]))

    w0 = edge(pb, pc, p)   # [12,H,W] barycentric numerators
    w1 = edge(pc, pa, p)
    w2 = edge(pa, pb, p)
    area = (w0 + w1 + w2)
    safe = jnp.where(jnp.abs(area) < 1e-9, 1.0, area)
    b0, b1, b2 = w0 / safe, w1 / safe, w2 / safe
    inside = ((b0 >= 0) & (b1 >= 0) & (b2 >= 0)) | ((b0 <= 0) & (b1 <= 0) & (b2 <= 0))
    # a triangle only counts when fully in front of the camera
    front = ((za > 0.05) & (zb > 0.05) & (zc > 0.05))[:, None, None]
    # perspective-correct enough for an overlay: interpolate 1/z linearly
    inv_z = (b0 / za[:, None, None] + b1 / zb[:, None, None]
             + b2 / zc[:, None, None])
    depth = 1.0 / jnp.maximum(inv_z, 1e-6)
    depth = jnp.where(inside & front & (jnp.abs(area) > 1e-9), depth, jnp.inf)

    best = jnp.argmin(depth, axis=0)                        # [H,W]
    zbuf = jnp.min(depth, axis=0)                           # [H,W]
    face = tri_face[best]
    color = _FACE_RGB[face]                                 # [H,W,3]
    hit = jnp.isfinite(zbuf)
    out = jnp.where(hit[..., None], (1 - alpha) * rgb + alpha * color, rgb)
    return out, zbuf


@jax.jit
def occlude(out: jax.Array, base: jax.Array, zbuf: jax.Array,
            lm_uv: jax.Array, lm_depth: jax.Array, lm_valid: jax.Array,
            radius: float = 12.0, margin: float = 0.3):
    """Hide cube pixels that fall behind the estimated landmark cloud: splat
    each valid landmark's depth over a `radius`-px disk; where the splatted
    scene depth is closer than the cube (by > margin), restore the camera
    image (the reference's occlusion handling, ar_demo_node.cpp)."""
    H, W = zbuf.shape
    yy, xx = jnp.mgrid[:H, :W]

    def splat(carry, lm):
        uv, d, v = lm[:2], lm[2], lm[3]
        dist2 = (xx - uv[0]) ** 2 + (yy - uv[1]) ** 2
        inside = (dist2 <= radius ** 2) & (v > 0.5) & (d > 0.05)
        return jnp.where(inside, jnp.minimum(carry, d), carry), None

    lm = jnp.concatenate(
        [lm_uv, lm_depth[:, None], lm_valid.astype(zbuf.dtype)[:, None]], -1)
    scene_z, _ = jax.lax.scan(splat, jnp.full((H, W), jnp.inf, zbuf.dtype), lm)
    base_rgb = (base[..., None] * jnp.ones((3,), base.dtype)
                if base.ndim == 2 else base).astype(out.dtype)
    hidden = jnp.isfinite(zbuf) & (scene_z + margin < zbuf)
    return jnp.where(hidden[..., None], base_rgb, out)


@jax.jit
def draw_axes(out: jax.Array, p_wc, q_wc, cam,
              origin_w, length: float = 0.4, width_px: float = 1.5):
    """World coordinate axes at origin_w, x=red y=green z=blue (the
    reference's axis marker)."""
    q_cw = lie.qconj(q_wc)
    ends_w = origin_w + jnp.eye(3, dtype=out.dtype) * length
    pts_w = jnp.concatenate([origin_w[None], ends_w], 0)
    pts_c = jax.vmap(lambda X: lie.qrotate(q_cw, X - p_wc))(pts_w)
    uv = cam.project(pts_c)
    H, W = out.shape[:2]
    yy, xx = jnp.mgrid[:H, :W]
    p = jnp.stack([xx, yy], -1).astype(out.dtype)
    colors = jnp.asarray([[255, 0, 0], [0, 255, 0], [0, 0, 255]], out.dtype)

    def seg_mask(a, b, vis):
        ab = b - a
        t = jnp.clip(((p - a) * ab).sum(-1) / jnp.maximum((ab * ab).sum(), 1e-9),
                     0.0, 1.0)
        d2 = ((p - (a + t[..., None] * ab)) ** 2).sum(-1)
        return (d2 <= width_px ** 2) & vis

    img = out
    for k in range(3):
        vis = (pts_c[0, 2] > 0.05) & (pts_c[k + 1, 2] > 0.05)
        m = seg_mask(uv[0], uv[k + 1], vis)
        img = jnp.where(m[..., None], colors[k], img)
    return img


class ArOverlay(NamedTuple):
    """Host-side convenience wrapper: cube placement + camera, call per frame
    with the estimator's camera pose and (optionally) landmark cloud."""
    camera: object
    center_w: jax.Array
    size: float = 0.8

    def render(self, img, p_wc, q_wc, lm_w=None, lm_valid=None):
        cam = self.camera
        corners = cube_in_camera(jnp.asarray(p_wc), jnp.asarray(q_wc),
                                 self.center_w, self.size)
        out, zbuf = rasterize_cube(jnp.asarray(img), corners, cam)
        if lm_w is not None and lm_w.shape[0]:
            q_cw = lie.qconj(jnp.asarray(q_wc))
            lm_c = jax.vmap(lambda X: lie.qrotate(q_cw, X - jnp.asarray(p_wc)))(
                jnp.asarray(lm_w))
            lm_uv = cam.project(lm_c)
            valid = (jnp.asarray(lm_valid, bool)
                     if lm_valid is not None else jnp.ones(lm_w.shape[0], bool))
            out = occlude(out, jnp.asarray(img), zbuf, lm_uv, lm_c[:, 2],
                          valid & (lm_c[:, 2] > 0.05))
        out = draw_axes(out, jnp.asarray(p_wc), jnp.asarray(q_wc), cam,
                        jnp.zeros(3, out.dtype))
        return out
