"""Pallas TPU kernel for the pyramidal Lucas-Kanade iteration loop.

The XLA formulation (klt.py) spends its whole budget on per-iteration
block-gathers: vmapped `dynamic_slice` patches lower to gathers that run at
~65 M elements/s on the tunnel-attached v5e (measured 11 ms/frame at 150
features, 77 ms at a batch of 8 streams).  The kernel removes every
iteration-time HBM access:

  * grid over feature groups (B features/program, levels separate calls);
  * the whole (padded) pyramid level lives in VMEM — a level-0 EuRoC image
    is ~2.4 MB, far under the 16 MB VMEM budget — so patch access is a
    tile-aligned VMEM load + a pair of dynamic-shift rolls, with NO DMA at
    all (a per-feature-DMA variant measured 150 us/program of pure DMA
    issue overhead; direct VMEM loads removed it);
  * the template/gradient setup and all `iters` Gauss-Newton refinements run
    on VMEM-resident data (small VPU ops).

Numerics match klt._lk_level exactly (same shifted-slice bilinear, same
ε-freeze and min-eigenvalue gate); only reduction order differs (f32
round-off).  Equivalence is pinned by tests/test_klt_pallas.py (CPU
interpreter) and the TPU parity check in tools/probe_klt_pallas.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 16         # features per program
BLK0_H = 32    # template DMA block rows (P0=24 + 8-row alignment residual)
BLK_W = 256    # DMA block lanes (patch extent + 128-lane alignment residual)
BLK1_H = 64    # search-window rows (P1 + 2*search + residual; MUST be a
               # power of two — dynamic sublane rolls on non-power-of-two
               # row counts mis-compile in Mosaic, verified empirically)
WIN1_H = 48    # valid window rows after the alignment residual
WIN1_W = 128   # valid window lanes after the alignment residual
SEARCH = 12    # per-level flow range handled in-window (klt.py runs the
               # TOP level with a wide-search XLA pass; lower levels are
               # pyramid-primed so +-12 px has ample margin)
# Mosaic requires DMA slice starts tile-aligned to (8, 128): corners are
# quantized down and the residual offset is folded into the in-kernel rolls.
PAD_RIGHT = 280   # extra right image padding so aligned DMAs never clip
PAD_BOTTOM = 72   # extra bottom padding, same reason


def _shift_bilinear(patch, fx, fy):
    a = patch[:-1, :-1]
    b = patch[:-1, 1:]
    c = patch[1:, :-1]
    d = patch[1:, 1:]
    return (a * (1 - fx) * (1 - fy) + b * fx * (1 - fy)
            + c * (1 - fx) * fy + d * fx * fy)


def _make_kernel(win: int, iters: int, eps: float, min_eig_thresh: float,
                 interpret: bool):
    P0 = win + 3
    P1 = win + 1
    half = win // 2
    if interpret:
        _roll = lambda x, s, ax: jnp.roll(x, s, axis=ax)
    else:
        _roll = lambda x, s, ax: pltpu.roll(x, s, ax)

    def kernel(scal, img0, img1, out):
        # scal: [B, 13] f32 — columns:
        #   0 y0a   1 x0a    template block corners (tile-aligned)
        #   2 wy0a  3 wx0a   search-window block corners (tile-aligned)
        #   4 fx    5 fy     template bilinear fractions
        #   6 g0x   7 g0y    initial guesses (PADDED image coords)
        #   8 ok0            validity gate
        #   9 r0y  10 r0x    template offset inside its aligned block
        #  11 rwy  12 rwx    window offset inside its aligned block

        rows = []
        for b in range(B):
            # corners are host-quantized to the (8, 128) tile grid;
            # pl.multiple_of makes that provable to Mosaic
            t_iy = pl.multiple_of(scal[b, 0].astype(jnp.int32), 8)
            t_ix = pl.multiple_of(scal[b, 1].astype(jnp.int32), 128)
            w_iy = pl.multiple_of(scal[b, 2].astype(jnp.int32), 8)
            w_ix = pl.multiple_of(scal[b, 3].astype(jnp.int32), 128)
            t_blk = img0[pl.ds(t_iy, BLK0_H), pl.ds(t_ix, BLK_W)]
            w_blk = img1[pl.ds(w_iy, BLK1_H), pl.ds(w_ix, BLK_W)]
            fx = scal[b, 4]
            fy = scal[b, 5]
            gx0 = scal[b, 6]
            gy0 = scal[b, 7]
            ok_in = scal[b, 8] > 0.5
            wy0c = scal[b, 2]
            wx0c = scal[b, 3]

            r0y = scal[b, 9].astype(jnp.int32)
            r0x = scal[b, 10].astype(jnp.int32)
            rwy = scal[b, 11].astype(jnp.int32)
            rwx = scal[b, 12].astype(jnp.int32)

            # rotate the template's alignment residual away, then slice
            # statically down to the patch before the bilinear math (the
            # full 256-lane rows would cost 8x the VPU work for nothing)
            t_rows = _roll(t_blk, -r0y, 0)[0:P0, :]
            t_full = _roll(t_rows, -r0x, 1)[:, 0:P0 + 8]
            S = _shift_bilinear(t_full, fx, fy)   # [P0-1, P0+7]
            t = S[1:win + 1, 1:win + 1]
            gxi = 0.5 * (S[1:win + 1, 2:win + 2] - S[1:win + 1, 0:win])
            gyi = 0.5 * (S[2:win + 2, 1:win + 1] - S[0:win, 1:win + 1])

            g00 = jnp.sum(gxi * gxi)
            g01 = jnp.sum(gxi * gyi)
            g11 = jnp.sum(gyi * gyi)
            tr = g00 + g11
            det = g00 * g11 - g01 * g01
            disc = jnp.sqrt(jnp.maximum(0.25 * tr * tr - det, 0.0))
            min_eig = (0.5 * tr - disc) / (win * win)
            ok = (min_eig > min_eig_thresh) & ok_in
            idet = 1.0 / (g00 * g11 - g01 * g01 + 1e-9)
            i00 = g11 * idet
            i01 = -g01 * idet
            i11 = g00 * idet

            def body(_, carry):
                gx_c, gy_c = carry
                jx = jnp.floor(gx_c - half)
                jy = jnp.floor(gy_c - half)
                gfx = (gx_c - half) - jx
                gfy = (gy_c - half) - jy
                # offsets relative to the ALIGNED corner; the clip bounds
                # shift by the residual so the patch always stays inside
                # the valid (unaligned) window content — identical clamping
                # semantics to the XLA path
                lx = jnp.clip(jx.astype(jnp.int32) - wx0c.astype(jnp.int32),
                              rwx, rwx + WIN1_W - P1)
                ly = jnp.clip(jy.astype(jnp.int32) - wy0c.astype(jnp.int32),
                              rwy, rwy + WIN1_H - P1)
                # Mosaic cannot load at dynamic lane offsets — rotate the
                # window so the patch lands at (0,0), then slice statically
                w_full = _roll(w_blk, -ly, 0)[0:P1, :]
                patch1 = _roll(w_full, -lx, 1)[:, 0:P1]
                d = _shift_bilinear(patch1, gfx, gfy) - t
                b0 = jnp.sum(d * gxi)
                b1 = jnp.sum(d * gyi)
                sx = -(i00 * b0 + i01 * b1)
                sy = -(i01 * b0 + i11 * b1)
                move = jnp.sqrt(sx * sx + sy * sy) > eps
                upd = move & ok
                return (gx_c + jnp.where(upd, sx, 0.0),
                        gy_c + jnp.where(upd, sy, 0.0))

            gx_f, gy_f = jax.lax.fori_loop(0, iters, body, (gx0, gy0))
            rows.append(jnp.stack([gx_f, gy_f, jnp.where(ok, 1.0, 0.0),
                                   jnp.zeros_like(gx_f)]))
        # single full-block store (partial-tile row writes violate the
        # (8,128) sublane tiling)
        out[:, :] = jnp.stack(rows)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("win", "iters", "eps", "min_eig_thresh", "interpret"))
def lk_level_pallas(img0p, img1p, p0, g, valid, win=21, iters=10, eps=0.01,
                    min_eig_thresh=1e-4, interpret=False):
    """Pallas replacement for klt._lk_level.  img0p/img1p are the
    edge-padded level images (pad = win//2 + 2, possibly right/bottom
    extended so Hp≥BLK1_H and Wp≥BLK_W); p0/g are feature positions in
    UNPADDED level coordinates.  Returns (g_new [N,2], ok [N])."""
    dtype = img0p.dtype
    N = p0.shape[0]
    Np = ((N + B - 1) // B) * B
    half = win // 2
    pad = half + 2
    P0 = win + 3
    Hp, Wp = img0p.shape

    def padN(a, fill=0.0):
        return jnp.concatenate(
            [a, jnp.full((Np - N,) + a.shape[1:], fill, a.dtype)])

    p0 = padN(p0)
    g = padN(g)
    valid = padN(valid, False)

    # Clamp positions so every DMA block stays inside the (extra-padded)
    # image; the bounds exceed the real image for any in-border feature, so
    # only invalid/escaped features are affected (they fail the border test
    # downstream anyway).
    px_max = Wp - BLK_W - 1 - pad + half + 1
    py_max = Hp - BLK0_H - 8 - pad + half + 1
    gx_max = Wp - BLK_W - 1 + SEARCH + half - pad
    gy_max = Hp - BLK1_H - 8 + SEARCH + half - pad
    p0 = jnp.stack([jnp.clip(jnp.nan_to_num(p0[:, 0]), 0.0, px_max),
                    jnp.clip(jnp.nan_to_num(p0[:, 1]), 0.0, py_max)], axis=-1)
    g = jnp.stack([jnp.clip(jnp.nan_to_num(g[:, 0]), 0.0, gx_max),
                   jnp.clip(jnp.nan_to_num(g[:, 1]), 0.0, gy_max)], axis=-1)

    # host-side (traced) prep: DMA corners, template fractions
    ix = jnp.floor(p0[:, 0]).astype(jnp.int32)
    iy = jnp.floor(p0[:, 1]).astype(jnp.int32)
    fx = p0[:, 0] - ix.astype(dtype)
    fy = p0[:, 1] - iy.astype(dtype)
    x0 = ix - half - 1 + pad
    y0 = iy - half - 1 + pad
    y0a = (y0 // 8) * 8
    x0a = (x0 // 128) * 128
    r0y = y0 - y0a
    r0x = x0 - x0a

    # search window corners around the initial guess (padded coords)
    wx0 = jnp.clip(jnp.floor(g[:, 0]).astype(jnp.int32) - half - SEARCH + pad,
                   0, Wp - BLK_W)
    wy0 = jnp.clip(jnp.floor(g[:, 1]).astype(jnp.int32) - half - SEARCH + pad,
                   0, Hp - BLK1_H)
    wy0a = (wy0 // 8) * 8
    wx0a = (wx0 // 128) * 128
    rwy = wy0 - wy0a
    rwx = wx0 - wx0a

    # guesses in PADDED image coordinates (kernel works in padded coords)
    gx0 = g[:, 0] + pad
    gy0 = g[:, 1] + pad

    scal = jnp.stack([
        y0a.astype(dtype), x0a.astype(dtype),
        wy0a.astype(dtype), wx0a.astype(dtype),
        fx, fy, gx0, gy0, valid.astype(dtype),
        r0y.astype(dtype), r0x.astype(dtype),
        rwy.astype(dtype), rwx.astype(dtype),
    ], axis=-1)  # [Np, 13]

    kernel = _make_kernel(win, iters, eps, min_eig_thresh, interpret)
    out = pl.pallas_call(
        kernel,
        grid=(Np // B,),
        in_specs=[
            pl.BlockSpec((B, 13), lambda p: (p, 0), memory_space=pltpu.VMEM),
            # whole level images resident in VMEM (copied once; the block
            # never changes across grid steps so pallas reuses it)
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, 4), lambda p: (p, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, 4), dtype),
        interpret=interpret,
    )(scal, img0p, img1p)

    g_new = jnp.stack([out[:N, 0] - pad, out[:N, 1] - pad], axis=-1)
    ok = out[:N, 2] > 0.5
    return g_new, ok
