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


def _shift_rows(x: jax.Array, d: int) -> jax.Array:
    """out[i] = x[i+d], zero-filled at the borders (matches the previous
    conv_general_dilated zero padding)."""
    H = x.shape[0]
    if d == 0:
        return x
    if d > 0:
        return jnp.concatenate([x[d:], jnp.zeros((d,) + x.shape[1:], x.dtype)])
    return jnp.concatenate([jnp.zeros((-d,) + x.shape[1:], x.dtype), x[:d]])


def pyr_down(img: jax.Array) -> jax.Array:
    """Gaussian 5×5 blur + 2× decimation (cv::pyrDown).

    Separable 5-tap stencil (shifted adds) + strided slice: single-channel
    small convs lower poorly on the TPU conv unit (measured 7 ms for the
    3-level pyramid; the stencil form is bandwidth-bound)."""
    g = [1 / 16.0, 4 / 16.0, 6 / 16.0, 4 / 16.0, 1 / 16.0]
    # rows pass (zero padding to match conv_general_dilated's (2,2) pad)
    v = sum(w * _shift_rows(img, d) for w, d in zip(g, (-2, -1, 0, 1, 2)))
    vt = v.T
    h = sum(w * _shift_rows(vt, d) for w, d in zip(g, (-2, -1, 0, 1, 2)))
    return h.T[::2, ::2]


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

    if th % 2 == 0 and tw % 2 == 0:
        out = _apply_lut_blocked(bins, lut, tiles, th, tw, nbins, dt)
    else:
        out = _apply_lut_gather(bins, lut, tiles, th, tw, dt)
    full = img.astype(dt)
    full = full.at[: th * tiles, : tw * tiles].set(out)
    return full


def _apply_lut_gather(bins, lut, tiles, th, tw, dt):
    """Reference formulation: bilinear interpolation of the 4 neighboring
    tile LUTs, one 3D gather per pixel per corner."""
    yy = (jnp.arange(th * tiles, dtype=dt) + 0.5) / th - 0.5
    xx = (jnp.arange(tw * tiles, dtype=dt) + 0.5) / tw - 0.5
    y0 = jnp.clip(jnp.floor(yy).astype(jnp.int32), 0, tiles - 1)
    x0 = jnp.clip(jnp.floor(xx).astype(jnp.int32), 0, tiles - 1)
    y1 = jnp.clip(y0 + 1, 0, tiles - 1)
    x1 = jnp.clip(x0 + 1, 0, tiles - 1)
    fy = jnp.clip(yy - y0, 0.0, 1.0)[:, None]
    fx = jnp.clip(xx - x0, 0.0, 1.0)[None, :]
    g = lambda ty, tx: lut[ty[:, None], tx[None, :], bins]
    return (
        g(y0, x0) * (1 - fy) * (1 - fx)
        + g(y0, x1) * (1 - fy) * fx
        + g(y1, x0) * fy * (1 - fx)
        + g(y1, x1) * fy * fx
    )


def _apply_lut_blocked(bins, lut, tiles, th, tw, nbins, dt):
    """Half-tile-shifted block formulation of the same interpolation: pad by
    half a tile so every (tiles+1)² block shares ONE set of 4 corner LUTs
    and constant per-position weights; each corner's mapped image is then a
    batched per-block 256-entry table lookup.  Equivalent to the per-pixel
    gather path (edge blocks have identical corner pairs, making the clipped
    weights irrelevant), but ~10× faster on TPU, where the per-pixel 3D
    gather dominated the whole CLAHE (16 ms of a 16.4 ms kernel)."""
    o_y, o_x = th // 2, tw // 2
    Tp = tiles + 1
    binsp = jnp.pad(bins, ((o_y, th - o_y), (o_x, tw - o_x)), mode="edge")
    blocks = binsp.reshape(Tp, th, Tp, tw).transpose(0, 2, 1, 3).reshape(
        Tp * Tp, th * tw)
    k = jnp.arange(Tp)
    lo = jnp.clip(k - 1, 0, tiles - 1)
    hi = jnp.clip(k, 0, tiles - 1)

    def corner(sel_y, sel_x):
        return lut[sel_y[:, None], sel_x[None, :], :].reshape(Tp * Tp, nbins)

    # the 4 corner lookups as ONE one-hot contraction: TPU gathers run at
    # ~65 M elements/s (measured — the original per-pixel LUT gather was 16
    # of CLAHE's 16.4 ms) while the same lookup as a fused compare-reduce
    # runs at VPU speed, exactly like the histogram above
    L4 = jnp.stack([corner(sy, sx) for sy in (lo, hi) for sx in (lo, hi)],
                   axis=-1)  # [Tp², nbins, 4]
    oh = jax.nn.one_hot(blocks, nbins, dtype=dt)  # [Tp², th·tw, nbins]
    maps4 = jnp.einsum("tib,tbc->tic", oh, L4,
                       precision=jax.lax.Precision.HIGHEST)  # [Tp², th·tw, 4]
    fy = ((jnp.arange(th, dtype=dt) + 0.5) / th)[:, None]
    fx = ((jnp.arange(tw, dtype=dt) + 0.5) / tw)[None, :]
    ws = jnp.stack([(wy * wx).reshape(-1)
                    for wy in (1 - fy, fy) for wx in (1 - fx, fx)],
                   axis=-1)  # [th·tw, 4]
    outb = jnp.sum(maps4 * ws[None], axis=-1)
    out = outb.reshape(Tp, Tp, th, tw).transpose(0, 2, 1, 3).reshape(
        Tp * th, Tp * tw)
    return out[o_y:o_y + th * tiles, o_x:o_x + tw * tiles]
