"""Pyramidal Lucas-Kanade optical flow, batched over features.

TPU-native replacement for cv::calcOpticalFlowPyrLK(21×21, 3 levels)
(feature_tracker/src/feature_tracker.cpp:113).  Fixed shapes throughout: all
MAX_CNT feature slots are tracked every frame (invalid slots masked), each
level runs a fixed iteration count with an ε-freeze (converged features stop
moving instead of exiting the loop), and the status mirrors OpenCV's
min-eigenvalue + border checks.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.linalg import inv2x2
from .image import bilinear, build_pyramid


def _patch_grid(win: int, dtype):
    half = win // 2
    r = jnp.arange(-half, half + 1, dtype=dtype)
    ox, oy = jnp.meshgrid(r, r, indexing="xy")
    return jnp.stack([ox.ravel(), oy.ravel()], axis=-1)  # [win², 2]


def _lk_level(img0, img1, p0, g, valid, offs, iters, eps, min_eig_thresh):
    """One pyramid level for all features.  p0: [N,2] feature positions in
    this level's coordinates; g: [N,2] current flow guesses (positions in
    img1).  Returns (g_new, ok)."""
    dtype = img0.dtype

    def per_feature(p, gk, v):
        pts0 = p[None, :] + offs  # [P,2]
        # template intensities + gradients (central differences on img0)
        t = bilinear(img0, pts0)
        dx = jnp.asarray([1.0, 0.0], dtype)
        dy = jnp.asarray([0.0, 1.0], dtype)
        gx = 0.5 * (bilinear(img0, pts0 + dx) - bilinear(img0, pts0 - dx))
        gy = 0.5 * (bilinear(img0, pts0 + dy) - bilinear(img0, pts0 - dy))
        G = jnp.stack(
            [
                jnp.stack([jnp.sum(gx * gx), jnp.sum(gx * gy)]),
                jnp.stack([jnp.sum(gx * gy), jnp.sum(gy * gy)]),
            ]
        )
        # min eigenvalue of G, normalized per pixel (OpenCV minEigThreshold)
        tr = G[0, 0] + G[1, 1]
        det = G[0, 0] * G[1, 1] - G[0, 1] * G[1, 0]
        disc = jnp.sqrt(jnp.maximum(0.25 * tr * tr - det, 0.0))
        min_eig = (0.5 * tr - disc) / offs.shape[0]
        ok = (min_eig > min_eig_thresh) & v
        Ginv = inv2x2(G + 1e-9 * jnp.eye(2, dtype=dtype))

        def body(i, gcur):
            pts1 = gcur[None, :] + offs
            d = bilinear(img1, pts1) - t
            b = jnp.stack([jnp.sum(d * gx), jnp.sum(d * gy)])
            step = -Ginv @ b
            # ε-freeze: converged features stop updating
            move = jnp.linalg.norm(step) > eps
            return gcur + jnp.where(move & ok, step, 0.0)

        gk = jax.lax.fori_loop(0, iters, body, gk)
        return gk, ok

    return jax.vmap(per_feature)(p0, g, valid)


@functools.partial(
    jax.jit, static_argnames=("win", "levels", "iters")
)
def lk_pyramidal(
    img0: jax.Array,  # [H,W] previous frame (CLAHE'd, float)
    img1: jax.Array,  # [H,W] current frame
    pts: jax.Array,  # [N,2] feature positions in img0 (x, y)
    valid: jax.Array,  # [N] bool
    win: int = 21,
    levels: int = 3,
    iters: int = 10,
    eps: float = 0.01,
    min_eig_thresh: float = 1e-4,
    border: int = 1,
):
    """Track pts from img0 to img1.  Returns (pts1 [N,2], status [N]).

    Status false ⇔ invalid input, degenerate gradient structure, or tracked
    out of border (inBorder, feature_tracker.cpp:5-11, BORDER_SIZE=1)."""
    H, W = img0.shape
    dtype = pts.dtype
    img0 = img0.astype(dtype)
    img1 = img1.astype(dtype)
    pyr0 = build_pyramid(img0, levels)
    pyr1 = build_pyramid(img1, levels)
    offs = _patch_grid(win, dtype)

    scale_top = 2.0 ** (levels - 1)
    g = pts / scale_top
    ok = valid
    for lvl in range(levels - 1, -1, -1):
        p0 = pts / (2.0**lvl)
        g, ok_l = _lk_level(pyr0[lvl], pyr1[lvl], p0, g, valid, offs, iters,
                            eps, min_eig_thresh)
        ok = ok & ok_l
        if lvl > 0:
            g = g * 2.0

    # OpenCV rejects points whose integration window leaves the image; the
    # reference then applies its own 1-px inBorder test on top
    half = win // 2
    m = max(border, half + 1)
    in_border = (
        (g[:, 0] >= m) & (g[:, 0] < W - m)
        & (g[:, 1] >= m) & (g[:, 1] < H - m)
    )
    return g, ok & in_border
