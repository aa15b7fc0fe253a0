"""Chessboard corner detection for calibration input.

The TPU-native counterpart of the reference's in-tree detector
(camera_model/src/chessboard/Chessboard.cc, ~2k LoC of hand-rolled corner
+ grid logic).  Re-expressed as dense image ops:

  1. X-corner (saddle) response over the whole image — one fused stencil,
  2. grid non-max suppression + top-k,
  3. sub-pixel refinement by the gradient-orthogonality condition
     (the cv::cornerSubPix fixed point), batched over corners,
  4. grid ordering: the inner-corner lattice is recovered by projecting
     corners onto the two dominant lattice directions (works for the
     fully-visible boards the calibration tool expects).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.linalg import inv2x2
import numpy as np

from ..frontend.image import bilinear


@jax.jit
def xcorner_response(img: jax.Array) -> jax.Array:
    """Saddle-point response: chessboard X-corners are minima of det(Hessian)
    (strongly negative), invariant to board rotation.  Returns [H,W] with
    large positive values at X-corners."""
    dt = img.dtype
    g = jnp.asarray([1.0, 4, 6, 4, 1], dt) / 16.0
    k = g[:, None] * g[None, :]

    def conv(x, kk):
        return jax.lax.conv_general_dilated(
            x[None, None], kk[None, None], (1, 1), "SAME"
        )[0, 0]

    sm = conv(img, k)
    dxx = conv(sm, jnp.asarray([[0.0, 0, 0], [1, -2, 1], [0, 0, 0]], dt))
    dyy = conv(sm, jnp.asarray([[0.0, 1, 0], [0, -2, 0], [0, 1, 0]], dt))
    dxy = conv(sm, jnp.asarray([[0.25, 0, -0.25], [0, 0, 0], [-0.25, 0, 0.25]], dt))
    return -(dxx * dyy - dxy * dxy)  # saddle ⇒ det(H) < 0


@functools.partial(jax.jit, static_argnames=("max_pts", "nms_rad"))
def detect_corners(img: jax.Array, max_pts: int, nms_rad: int = 5,
                   rel_thresh: float = 0.2):
    """Top-`max_pts` X-corners, NMS = keep only local maxima of the response
    within a (2·nms_rad+1)² window (exact ties both survive; the host-side
    dedupe in order_grid merges them).  Returns (pts [max_pts,2] (x,y),
    ok [max_pts])."""
    resp = xcorner_response(img)
    H, W = resp.shape
    w = 2 * nms_rad + 1
    mp = jax.lax.reduce_window(resp, -jnp.inf, jax.lax.max, (w, w), (1, 1),
                               "SAME")
    thr = rel_thresh * jnp.max(resp)
    tied = (resp >= mp) & (resp > thr)
    # deterministic tie-break (symmetric renderings produce exact-tie
    # plateaus): of the tied maxima in a window, keep the largest index
    idx2 = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W)
    ipool = jax.lax.reduce_window(jnp.where(tied, idx2, -1), jnp.int32(-1),
                                  jax.lax.max, (w, w), (1, 1), "SAME")
    flat = jnp.where(tied & (idx2 == ipool), resp, -jnp.inf).ravel()
    vals, idx = jax.lax.top_k(flat, max_pts)
    pts = jnp.stack([idx % W, idx // W], -1).astype(img.dtype)
    return pts, jnp.isfinite(vals)


@functools.partial(jax.jit, static_argnames=("win", "iters"))
def subpix_refine(img: jax.Array, pts: jax.Array, win: int = 5,
                  iters: int = 4) -> jax.Array:
    """cv::cornerSubPix's fixed point: at a corner c, for every window pixel
    p, ∇I(p) ⊥ (p − c).  Solve the 2×2 normal equations repeatedly."""
    dt = img.dtype
    r = jnp.arange(-win, win + 1, dtype=dt)
    ox, oy = jnp.meshgrid(r, r, indexing="xy")
    offs = jnp.stack([ox.ravel(), oy.ravel()], -1)  # [P,2]
    wgt = jnp.exp(-(ox**2 + oy**2).ravel() / (2.0 * (win / 2.0) ** 2))
    dx = jnp.asarray([1.0, 0.0], dt)
    dy = jnp.asarray([0.0, 1.0], dt)

    def refine_one(c):
        def body(_, c):
            p = c[None, :] + offs
            gx = 0.5 * (bilinear(img, p + dx) - bilinear(img, p - dx))
            gy = 0.5 * (bilinear(img, p + dy) - bilinear(img, p - dy))
            gxx = jnp.sum(wgt * gx * gx)
            gxy = jnp.sum(wgt * gx * gy)
            gyy = jnp.sum(wgt * gy * gy)
            bx = jnp.sum(wgt * (gx * gx * p[:, 0] + gx * gy * p[:, 1]))
            by = jnp.sum(wgt * (gx * gy * p[:, 0] + gy * gy * p[:, 1]))
            A = jnp.asarray([[gxx, gxy], [gxy, gyy]], dt)
            b = jnp.stack([bx, by])
            Ad = A + 1e-9 * jnp.eye(2, dtype=dt)
            c_new = (inv2x2(Ad) @ b[:, None])[:, 0]
            return jnp.where(jnp.all(jnp.isfinite(c_new)), c_new, c)

        return jax.lax.fori_loop(0, iters, body, c)

    return jax.vmap(refine_one)(pts)


def _lattice_h(corners4: np.ndarray, rows: int, cols: int) -> np.ndarray:
    """Homography mapping lattice coords (j∈[0,cols-1], i∈[0,rows-1]) to the
    four image-space outer corners [c00, c10, c01, c11]."""
    src = np.array([[0, 0], [cols - 1, 0], [0, rows - 1], [cols - 1, rows - 1]],
                   float)
    A = []
    for (X, Y), (x, y) in zip(src, corners4):
        A.append([X, Y, 1, 0, 0, 0, -x * X, -x * Y, -x])
        A.append([0, 0, 0, X, Y, 1, -y * X, -y * Y, -y])
    _, _, Vt = np.linalg.svd(np.asarray(A))
    return Vt[-1].reshape(3, 3)


def order_grid(pts: np.ndarray, ok: np.ndarray, rows: int, cols: int):
    """Arrange detected corners into a (rows·cols) lattice, robust to board
    rotation and perspective: take the 4 extreme detections as the outer
    lattice corners, fit the lattice→image homography, map every ideal node
    and snap it to its nearest detection (one refinement round re-fits the
    homography from all matches).  Returns (ordered [rows*cols, 2], ok)."""
    p = np.asarray(pts, float)[np.asarray(ok)]
    # dedupe: exact response ties can survive NMS and converge to the same
    # sub-pixel corner — keep the first (strongest) of any cluster within 3 px
    keep = []
    for q_ in p:
        if not keep or np.min(np.linalg.norm(np.asarray(keep) - q_, axis=-1)) > 3.0:
            keep.append(q_)
    p = np.asarray(keep)
    if len(p) < rows * cols:
        return None, False
    # keep the rows·cols strongest (candidates arrive response-ranked):
    # board-edge pseudo-corners respond measurably weaker than full saddles
    p = p[: rows * cols]
    c = p.mean(0)
    q = p - c
    _, _, Vt = np.linalg.svd(q, full_matrices=False)
    a, b = q @ Vt[0], q @ Vt[1]
    # outer lattice corners = extremes of the diagonal projections
    c00 = p[np.argmin(a + b)]
    c11 = p[np.argmax(a + b)]
    c10 = p[np.argmax(a - b)]
    c01 = p[np.argmin(a - b)]

    jj, ii = np.meshgrid(np.arange(cols), np.arange(rows))
    nodes = np.stack([jj.ravel(), ii.ravel(), np.ones(rows * cols)], -1)

    def snap(Hm):
        pr = nodes @ Hm.T
        pr = pr[:, :2] / pr[:, 2:3]
        d = np.linalg.norm(pr[:, None, :] - p[None, :, :], axis=-1)
        idx = np.argmin(d, axis=1)
        return idx, d[np.arange(len(idx)), idx]

    Hm = _lattice_h(np.stack([c00, c10, c01, c11]), rows, cols)
    idx, derr = snap(Hm)
    # refinement: re-fit the homography from all confident matches (absorbs
    # lens distortion better than the 4-corner fit)
    good = derr < np.median(derr) * 3 + 1e-9
    if good.sum() >= 8:
        A = []
        for (X, Y, _), (x, y) in zip(nodes[good], p[idx[good]]):
            A.append([X, Y, 1, 0, 0, 0, -x * X, -x * Y, -x])
            A.append([0, 0, 0, X, Y, 1, -y * X, -y * Y, -y])
        _, _, Vt2 = np.linalg.svd(np.asarray(A))
        idx, derr = snap(Vt2[-1].reshape(3, 3))
    if len(np.unique(idx)) != rows * cols:
        return None, False
    grid = p[idx].reshape(rows, cols, 2)
    # canonical orientation: row-major, first corner at min (y, x)
    if grid[0, 0, 1] > grid[-1, 0, 1]:
        grid = grid[::-1]
    if grid[0, 0, 0] > grid[0, -1, 0]:
        grid = grid[:, ::-1]
    return grid.reshape(-1, 2), True


def find_chessboard(img, rows: int, cols: int):
    """Full detection (the reference's Chessboard::findCorners): returns
    (corners [rows*cols, 2] ordered row-major, ok)."""
    im = jnp.asarray(img, jnp.float32)
    # over-detect: boundary-straddling corners appear twice (deduped below)
    pts, ok = detect_corners(im, max_pts=rows * cols + 16)
    pts = subpix_refine(im, pts)
    return order_grid(np.asarray(pts), np.asarray(ok), rows, cols)


def board_object_points(rows: int, cols: int, square: float) -> np.ndarray:
    """Board-plane coordinates of the inner-corner lattice, row-major."""
    jj, ii = np.meshgrid(np.arange(cols), np.arange(rows))
    return (np.stack([jj.ravel(), ii.ravel()], -1) * square).astype(float)
