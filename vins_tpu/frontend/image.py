"""Image-space primitives: bilinear sampling, gradients, pyramid, CLAHE.

TPU-native replacements for the OpenCV calls in the reference front-end
(feature_tracker/src/feature_tracker.cpp:87-93 CLAHE; :113 pyramidal LK uses
an internal pyrDown).  Everything is fixed-shape, batched, and fusable; the
histogram work in CLAHE is expressed as one-hot matmuls (MXU-friendly) rather
than scatter loops.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def bilinear(img: jax.Array, xy: jax.Array) -> jax.Array:
    """Bilinear sample `img` [H,W] at xy [...,2] (x=col, y=row), clamped."""
    H, W = img.shape
    x = jnp.clip(xy[..., 0], 0.0, W - 1.001)
    y = jnp.clip(xy[..., 1], 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


def scharr_gradients(img: jax.Array):
    """Scharr 3×3 x/y gradients (what cv::calcOpticalFlowPyrLK uses
    internally), 'same' padding.  Returns (gx, gy), each [H,W]."""
    kx = jnp.asarray([[-3.0, 0, 3], [-10, 0, 10], [-3, 0, 3]], img.dtype) / 32.0
    ky = kx.T
    img4 = img[None, None]
    def conv(k):
        return jax.lax.conv_general_dilated(
            img4, k[None, None], (1, 1), "SAME"
        )[0, 0]
    return conv(kx), conv(ky)


def pyr_down(img: jax.Array) -> jax.Array:
    """Gaussian 5×5 blur + 2× decimation (cv::pyrDown)."""
    g = jnp.asarray([1.0, 4, 6, 4, 1], img.dtype) / 16.0
    k = g[:, None] * g[None, :]
    out = jax.lax.conv_general_dilated(
        img[None, None], k[None, None], (2, 2), [(2, 2), (2, 2)]
    )[0, 0]
    return out


def build_pyramid(img: jax.Array, levels: int = 3):
    """List of `levels` images, level 0 = full resolution."""
    pyr = [img]
    for _ in range(levels - 1):
        pyr.append(pyr_down(pyr[-1]))
    return pyr


@functools.partial(jax.jit, static_argnames=("tiles", "nbins"))
def clahe(img: jax.Array, clip_limit: float = 3.0, tiles: int = 8,
          nbins: int = 256) -> jax.Array:
    """Contrast-limited adaptive histogram equalization
    (cv::createCLAHE(3.0, (8,8)), feature_tracker.cpp:87-93).

    Tile histograms via one-hot matmul; clipped excess redistributed
    uniformly; per-pixel mapping bilinearly interpolated between the four
    nearest tile mappings — the standard CLAHE construction."""
    H, W = img.shape
    dt = jnp.float32
    th, tw = H // tiles, W // tiles
    x = img[: th * tiles, : tw * tiles].astype(dt)

    bins = jnp.clip((x * (nbins / 256.0)).astype(jnp.int32), 0, nbins - 1)
    tiled = bins.reshape(tiles, th, tiles, tw).transpose(0, 2, 1, 3).reshape(
        tiles * tiles, th * tw
    )
    onehot = jax.nn.one_hot(tiled, nbins, dtype=dt)  # [T², th·tw, nbins]
    hist = onehot.sum(axis=1)  # [T², nbins]

    # clip + redistribute (OpenCV semantics: limit scaled by tile size)
    limit = jnp.maximum(clip_limit * th * tw / nbins, 1.0)
    excess = jnp.sum(jnp.maximum(hist - limit, 0.0), axis=1, keepdims=True)
    hist = jnp.minimum(hist, limit) + excess / nbins

    cdf = jnp.cumsum(hist, axis=1)
    lut = (cdf - cdf[:, :1]) / jnp.maximum(cdf[:, -1:] - cdf[:, :1], 1.0) * 255.0
    lut = lut.reshape(tiles, tiles, nbins)

    # bilinear interpolation of the 4 neighboring tile LUTs per pixel
    yy = (jnp.arange(th * tiles, dtype=dt) + 0.5) / th - 0.5
    xx = (jnp.arange(tw * tiles, dtype=dt) + 0.5) / tw - 0.5
    y0 = jnp.clip(jnp.floor(yy).astype(jnp.int32), 0, tiles - 1)
    x0 = jnp.clip(jnp.floor(xx).astype(jnp.int32), 0, tiles - 1)
    y1 = jnp.clip(y0 + 1, 0, tiles - 1)
    x1 = jnp.clip(x0 + 1, 0, tiles - 1)
    fy = jnp.clip(yy - y0, 0.0, 1.0)[:, None]
    fx = jnp.clip(xx - x0, 0.0, 1.0)[None, :]

    b = bins  # [H',W']
    g = lambda ty, tx: lut[ty[:, None], tx[None, :], b]
    out = (
        g(y0, x0) * (1 - fy) * (1 - fx)
        + g(y0, x1) * (1 - fy) * fx
        + g(y1, x0) * fy * (1 - fx)
        + g(y1, x1) * fy * fx
    )
    full = img.astype(dt)
    full = full.at[: th * tiles, : tw * tiles].set(out)
    return full
