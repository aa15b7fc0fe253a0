"""Pyramidal Lucas-Kanade optical flow, batched over features.

TPU-native replacement for cv::calcOpticalFlowPyrLK(21×21, 3 levels)
(feature_tracker/src/feature_tracker.cpp:113).  Fixed shapes throughout: all
MAX_CNT feature slots are tracked every frame (invalid slots masked), each
level runs a fixed iteration count with an ε-freeze (converged features stop
moving instead of exiting the loop), and the status mirrors OpenCV's
min-eigenvalue + border checks.

Memory-access shape: every sample is a CONTIGUOUS `lax.dynamic_slice`
patch + static shifted-slice arithmetic for sub-pixel bilinear — never an
elementwise gather.  A batched block slice is one efficient gather-of-blocks
on TPU, while the round-2 formulation (per-pixel `img[y, x]` bilinear over
21×21×10 iterations×3 levels×150 features ≈ 40 M random gathers/frame) was
the front-end's entire 170 ms budget.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.linalg import inv2x2
from .image import build_pyramid


def _shift_bilinear(patch: jax.Array, fx, fy):
    """Sample `patch` on the unit-shifted grid: out[j,i] = bilinear value at
    (i + fx, j + fy) with fx,fy ∈ [0,1).  [P,P] → [P-1,P-1], static slices."""
    a = patch[:-1, :-1]
    b = patch[:-1, 1:]
    c = patch[1:, :-1]
    d = patch[1:, 1:]
    return (a * (1 - fx) * (1 - fy) + b * fx * (1 - fy)
            + c * (1 - fx) * fy + d * fx * fy)


def _lk_level(img0, img1, p0, g, valid, win, iters, eps, min_eig_thresh,
              search: int = 10):
    """One pyramid level for all features.  p0: [N,2] feature positions in
    this level's coordinates (img0/img1 are edge-padded by `pad = half+2`,
    matching cv::buildOpticalFlowPyramid's replicated borders); g: [N,2]
    current flow guesses (positions in img1).  Returns (g_new, ok).

    Memory shape: per feature, ONE [WS,WS] search window is sliced from
    img1 up front (WS = win+1+2·search) and every LK iteration then slices
    inside that small resident tensor — the iteration loop never touches
    the full image again.  The round-4 formulation gathered a fresh 22×22
    patch from the full image every iteration (10 iters × 3 levels × 150
    features of HBM block-gathers = the entire LK budget); flows beyond
    ±`search` px per level clamp to the window edge, which in practice
    means the feature had already failed (pyramid priming keeps per-level
    refinements within a couple of pixels)."""
    dtype = img0.dtype
    half = win // 2
    pad = half + 2
    Hp, Wp = img0.shape  # padded dims
    W = Wp - 2 * pad
    H = Hp - 2 * pad
    P0 = win + 3  # template patch: bilinear + central-difference margin
    P1 = win + 1  # iteration patch: bilinear margin
    # per-feature img1 search window, capped by the level image itself
    # (top pyramid levels of small images can be smaller than the window)
    search = min(search, (min(Hp, Wp) - P1) // 2)
    WS = P1 + 2 * search

    def per_feature(p, gk, v):
        # ---- template + gradients from img0, one block slice -------------
        ix = jnp.floor(p[0]).astype(jnp.int32)
        iy = jnp.floor(p[1]).astype(jnp.int32)
        fx = p[0] - ix.astype(dtype)
        fy = p[1] - iy.astype(dtype)
        x0 = jnp.clip(ix - half - 1 + pad, 0, Wp - P0)
        y0 = jnp.clip(iy - half - 1 + pad, 0, Hp - P0)
        patch0 = jax.lax.dynamic_slice(img0, (y0, x0), (P0, P0))
        S = _shift_bilinear(patch0, fx, fy)  # [win+2, win+2]
        t = S[1:win + 1, 1:win + 1]
        gx = 0.5 * (S[1:win + 1, 2:win + 2] - S[1:win + 1, 0:win])
        gy = 0.5 * (S[2:win + 2, 1:win + 1] - S[0:win, 1:win + 1])

        G = jnp.stack([
            jnp.stack([jnp.sum(gx * gx), jnp.sum(gx * gy)]),
            jnp.stack([jnp.sum(gx * gy), jnp.sum(gy * gy)]),
        ])
        # min eigenvalue of G, normalized per pixel (OpenCV minEigThreshold)
        tr = G[0, 0] + G[1, 1]
        det = G[0, 0] * G[1, 1] - G[0, 1] * G[1, 0]
        disc = jnp.sqrt(jnp.maximum(0.25 * tr * tr - det, 0.0))
        min_eig = (0.5 * tr - disc) / (win * win)
        ok = (min_eig > min_eig_thresh) & v
        Ginv = inv2x2(G + 1e-9 * jnp.eye(2, dtype=dtype))

        # ---- one search window from img1 ---------------------------------
        wx0 = jnp.clip(jnp.floor(gk[0]).astype(jnp.int32) - half - search + pad,
                       0, Wp - WS)
        wy0 = jnp.clip(jnp.floor(gk[1]).astype(jnp.int32) - half - search + pad,
                       0, Hp - WS)
        window = jax.lax.dynamic_slice(img1, (wy0, wx0), (WS, WS))

        def body(i, gcur):
            # patch corner in window-local coordinates
            lx = jnp.floor(gcur[0] - half).astype(jnp.int32) + pad - wx0
            ly = jnp.floor(gcur[1] - half).astype(jnp.int32) + pad - wy0
            gfx = (gcur[0] - half) - jnp.floor(gcur[0] - half)
            gfy = (gcur[1] - half) - jnp.floor(gcur[1] - half)
            lx = jnp.clip(lx, 0, WS - P1)
            ly = jnp.clip(ly, 0, WS - P1)
            patch1 = jax.lax.dynamic_slice(window, (ly, lx), (P1, P1))
            d = _shift_bilinear(patch1, gfx, gfy) - t  # [win, win]
            b = jnp.stack([jnp.sum(d * gx), jnp.sum(d * gy)])
            step = -Ginv @ b
            # ε-freeze: converged features stop updating
            move = jnp.linalg.norm(step) > eps
            return gcur + jnp.where(move & ok, step, 0.0)

        gk = jax.lax.fori_loop(0, iters, body, gk)
        return gk, ok

    return jax.vmap(per_feature)(p0, g, valid)


@functools.partial(
    jax.jit, static_argnames=("win", "levels", "iters", "use_pallas")
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
    use_pallas: bool | None = None,
):
    """Track pts from img0 to img1.  Returns (pts1 [N,2], status [N]).

    Status false ⇔ invalid input, degenerate gradient structure, or tracked
    out of border (inBorder, feature_tracker.cpp:5-11, BORDER_SIZE=1).

    On TPU the per-level iteration runs as a Pallas kernel
    (klt_pallas.lk_level_pallas) — identical numerics, no iteration-time
    HBM gathers; elsewhere (CPU tests) the XLA formulation is used."""
    H, W = img0.shape
    dtype = pts.dtype
    img0 = img0.astype(dtype)
    img1 = img1.astype(dtype)
    pad = win // 2 + 2
    pyr0 = [jnp.pad(p, pad, mode="edge") for p in build_pyramid(img0, levels)]
    pyr1 = [jnp.pad(p, pad, mode="edge") for p in build_pyramid(img1, levels)]

    import os

    if use_pallas is None:
        use_pallas = (jax.default_backend() == "tpu"
                      and not os.environ.get("VINS_NO_PALLAS"))
    # diagnostic override: force the XLA path with a given per-level search
    # radius (e.g. 10000 = whole image, the pre-window semantics)
    _search_env = os.environ.get("VINS_LK_SEARCH")
    if use_pallas:
        from .klt_pallas import (BLK1_H, BLK_W, PAD_BOTTOM, PAD_RIGHT,
                                 lk_level_pallas)

        def padmin(a):
            h, w = a.shape
            return jnp.pad(a, ((0, max(PAD_BOTTOM, BLK1_H - h)),
                               (0, max(PAD_RIGHT, BLK_W - w))),
                           mode="edge")

        pyr0 = [padmin(p) for p in pyr0]
        pyr1 = [padmin(p) for p in pyr1]

    scale_top = 2.0 ** (levels - 1)
    g = pts / scale_top
    ok = valid
    for lvl in range(levels - 1, -1, -1):
        p0 = pts / (2.0**lvl)
        top = lvl == levels - 1
        if _search_env:
            g, ok_l = _lk_level(pyr0[lvl], pyr1[lvl], p0, g, valid, win,
                                iters, eps, min_eig_thresh,
                                search=int(_search_env))
        elif use_pallas and not top:
            # lower levels: flows are pyramid-primed (≤ a few px) — the
            # Pallas kernel's ±SEARCH window is ample
            g, ok_l = lk_level_pallas(pyr0[lvl], pyr1[lvl], p0, g, valid,
                                      win=win, iters=iters, eps=eps,
                                      min_eig_thresh=min_eig_thresh)
        else:
            # top (coarsest) level: the initial guess is the RAW previous
            # position, so per-level flow can reach tens of px for
            # near-scene features under fast motion — use a wide search
            # window (the level image is small, so this stays cheap)
            g, ok_l = _lk_level(pyr0[lvl], pyr1[lvl], p0, g, valid, win,
                                iters, eps, min_eig_thresh,
                                search=32 if top else 10)
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
