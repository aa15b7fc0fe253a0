"""Shi-Tomasi corner detection with grid non-max suppression.

TPU-native replacement for cv::goodFeaturesToTrack(MAX_CNT, 0.01, MIN_DIST)
plus the reference's greedy mask suppression (feature_tracker.cpp:36-69
setMask + :149).  The sequential circle-mask greedy is re-expressed as
grid-cell suppression: one winner per MIN_DIST-sized cell, cells occupied by
(or adjacent to) existing tracked features suppressed — same intent
(track-length priority + spatial spread), fully parallel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _shift2d(x: jax.Array, dy: int, dx: int) -> jax.Array:
    """x shifted by (dy, dx) with zero padding — a static-slice stencil tap.
    Single-channel 3×3 convs lower poorly on the TPU conv unit (C=1 wastes
    the 8/128 channel tiling); explicit shifted adds run on the VPU at
    bandwidth speed instead (measured 26 ms → ~2 ms for the 6-conv chain)."""
    H, W = x.shape
    out = jnp.zeros_like(x)
    ys = slice(max(dy, 0), H + min(dy, 0))
    xs = slice(max(dx, 0), W + min(dx, 0))
    yd = slice(max(-dy, 0), H + min(-dy, 0))
    xd = slice(max(-dx, 0), W + min(-dx, 0))
    return out.at[yd, xd].set(x[ys, xs])


def _conv3x3_shifted(x: jax.Array, k) -> jax.Array:
    """'SAME' 3×3 correlation as 9 shifted adds (k row-major 3×3 list)."""
    out = None
    for j in range(3):
        for i in range(3):
            w = k[j][i]
            if w == 0.0:
                continue
            term = _shift2d(x, j - 1, i - 1) * w
            out = term if out is None else out + term
    return out


@jax.jit
def shi_tomasi_response(img: jax.Array) -> jax.Array:
    """Min-eigenvalue corner response (cv::cornerMinEigenVal, Sobel 3 +
    3×3 block sum), [H,W] — stencil formulation (see _shift2d)."""
    sx = [[-1 / 8.0, 0.0, 1 / 8.0], [-2 / 8.0, 0.0, 2 / 8.0],
          [-1 / 8.0, 0.0, 1 / 8.0]]
    sy = [list(r) for r in zip(*sx)]
    box = [[1.0] * 3] * 3
    gx = _conv3x3_shifted(img, sx)
    gy = _conv3x3_shifted(img, sy)
    Ixx = _conv3x3_shifted(gx * gx, box)
    Iyy = _conv3x3_shifted(gy * gy, box)
    Ixy = _conv3x3_shifted(gx * gy, box)
    tr = 0.5 * (Ixx + Iyy)
    disc = jnp.sqrt(jnp.maximum((0.5 * (Ixx - Iyy)) ** 2 + Ixy * Ixy, 0.0))
    return tr - disc


@functools.partial(jax.jit, static_argnames=("cell", "max_new"))
def detect_grid(
    response: jax.Array,  # [H,W]
    existing: jax.Array,  # [M,2] tracked feature positions (x, y)
    existing_valid: jax.Array,  # [M]
    max_new: int,
    cell: int = 30,  # MIN_DIST
    quality: float = 0.01,
    border: int = 4,
):
    """Top-`max_new` new corners: per-cell argmax, cells within one ring of an
    existing feature suppressed, response ≥ quality·global-max
    (goodFeaturesToTrack semantics), ranked by response.

    Returns (pts [max_new,2], ok [max_new])."""
    H, W = response.shape
    dt = response.dtype
    gh, gw = H // cell, W // cell
    r = response[: gh * cell, : gw * cell]

    # border + degenerate suppression
    ys = jnp.arange(gh * cell)
    xs = jnp.arange(gw * cell)
    bmask = (
        (ys[:, None] >= border) & (ys[:, None] < H - border)
        & (xs[None, :] >= border) & (xs[None, :] < W - border)
    )
    r = jnp.where(bmask, r, -jnp.inf)

    cells = r.reshape(gh, cell, gw, cell).transpose(0, 2, 1, 3).reshape(gh, gw, -1)
    best = jnp.argmax(cells, axis=-1)  # [gh,gw]
    best_val = jnp.take_along_axis(cells, best[..., None], axis=-1)[..., 0]
    by = best // cell + jnp.arange(gh)[:, None] * cell
    bx = best % cell + jnp.arange(gw)[None, :] * cell

    # occupancy: cells holding or neighboring an existing feature
    ex = jnp.clip((existing[:, 0] // cell).astype(jnp.int32), 0, gw - 1)
    ey = jnp.clip((existing[:, 1] // cell).astype(jnp.int32), 0, gh - 1)
    occ = jnp.zeros((gh, gw), bool)
    occ = occ.at[ey, ex].max(existing_valid)
    k = jnp.ones((3, 3), jnp.float32)
    occ = jax.lax.conv_general_dilated(
        occ[None, None].astype(jnp.float32), k[None, None], (1, 1), "SAME"
    )[0, 0] > 0

    thresh = quality * jnp.max(jnp.where(jnp.isfinite(best_val), best_val, 0.0))
    good = (~occ) & (best_val > thresh) & jnp.isfinite(best_val)

    flat_val = jnp.where(good, best_val, -jnp.inf).ravel()
    take = jax.lax.top_k(flat_val, max_new)
    vals, idx = take
    pts = jnp.stack([bx.ravel()[idx], by.ravel()[idx]], axis=-1).astype(dt)
    return pts, jnp.isfinite(vals)
