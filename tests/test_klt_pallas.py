"""Pallas LK kernel ≡ XLA reference (interpret mode on the CPU mesh).

The TPU front end runs `klt_pallas.lk_level_pallas` (VMEM-resident LK, see
the module docstring); numerics must match `klt._lk_level` bit-for-nearly-
bit — same bilinear, ε-freeze, min-eig gate, and clamping semantics."""
import jax
import jax.numpy as jnp
import numpy as np

from vins_tpu.frontend.klt import _lk_level, lk_pyramidal
from vins_tpu.frontend.klt_pallas import (BLK1_H, BLK_W, PAD_BOTTOM,
                                          PAD_RIGHT, lk_level_pallas)


def _padmin(a):
    h, w = a.shape
    return jnp.pad(a, ((0, max(PAD_BOTTOM, BLK1_H - h)),
                       (0, max(PAD_RIGHT, BLK_W - w))), mode="edge")


def test_lk_level_pallas_matches_xla():
    rng = np.random.default_rng(0)
    H, W, N, win = 120, 160, 24, 21
    pad = win // 2 + 2
    img0 = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    img1 = (jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32) * 0.1
            + jnp.roll(img0, (1, 2), (0, 1)) * 0.9)
    img0p = jnp.pad(img0, pad, mode="edge")
    img1p = jnp.pad(img1, pad, mode="edge")
    # positions spread over the full image including borders
    p0 = jnp.asarray(rng.uniform(1, 115, (N, 2)), jnp.float32)
    g = p0 + jnp.asarray(rng.uniform(-2, 2, (N, 2)), jnp.float32)
    valid = jnp.asarray(rng.uniform(size=N) > 0.2)

    g_ref, ok_ref = _lk_level(img0p, img1p, p0, g, valid, win, 10, 0.01, 1e-4)
    g_pl, ok_pl = lk_level_pallas(_padmin(img0p), _padmin(img1p), p0, g,
                                  valid, win=win, iters=10, interpret=True)
    np.testing.assert_array_equal(np.array(ok_ref), np.array(ok_pl))
    both = np.array(ok_ref)
    np.testing.assert_allclose(np.array(g_pl)[both], np.array(g_ref)[both],
                               atol=1e-3)


def test_lk_pyramidal_pallas_tracks_shift():
    """Full 3-level pyramid through the pallas path (interpret) recovers a
    known subpixel shift — the same acceptance as the XLA test."""
    from tests.test_frontend import shifted, smooth_texture

    key = jax.random.PRNGKey(1)
    img0 = smooth_texture(key, scale=6)
    dx, dy = 5.3, -3.7
    img1 = shifted(img0, -dx, -dy)
    pts = jnp.asarray(
        [[60.0, 60.0], [160.0, 80.0], [240.0, 180.0], [100.0, 200.0]],
        jnp.float32)
    valid = jnp.ones(4, bool)
    # use_pallas=True on CPU routes through interpret=False pallas — force
    # the level calls directly instead
    win, levels = 21, 3
    pad = win // 2 + 2
    pyr0 = [img0]
    pyr1 = [img1]
    from vins_tpu.frontend.image import build_pyramid
    pyr0 = [_padmin(jnp.pad(p, pad, mode="edge"))
            for p in build_pyramid(img0, levels)]
    pyr1 = [_padmin(jnp.pad(p, pad, mode="edge"))
            for p in build_pyramid(img1, levels)]
    g = pts / 4.0
    ok = valid
    for lvl in range(levels - 1, -1, -1):
        p0 = pts / (2.0 ** lvl)
        g, ok_l = lk_level_pallas(pyr0[lvl], pyr1[lvl], p0, g, valid,
                                  win=win, iters=10, interpret=True)
        ok = ok & ok_l
        if lvl > 0:
            g = g * 2.0
    assert bool(jnp.all(ok))
    err = np.array(g) - (np.array(pts) + np.array([dx, dy]))
    assert np.abs(err).max() < 0.05, err
