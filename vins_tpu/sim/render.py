"""Textured-room image renderer — the real-data proxy.

The reference's de-facto integration test is replaying EuRoC bags
(README.md:66-89); with no dataset on disk we synthesize the closest thing:
a box room whose six faces carry band-limited procedural textures, ray-cast
through the calibrated camera model (including lens distortion) along a
closed-form trajectory.  The images feed the REAL front-end (CLAHE →
Shi-Tomasi → pyramidal LK → F-RANSAC) and the REAL loop-closure stack
(FAST + BRIEF + retrieval), unlike the landmark-wire-format synthetic driver
(sim/driver.py) that bypasses pixels entirely.

TPU notes: textures are ANALYTIC (sums of random plane waves — sparse
spectral noise) rather than sampled images, because per-pixel bilinear
gathers are slow on TPU while dense FMA is free: each face costs
[H·W] × K fused multiply-adds on the VPU.  One jitted call renders a frame
in ~a millisecond.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import lie
from ..core.precision import highest_matmul_precision


def spectral_texture_params(key, k: int = 96, f_lo: float = 2.0,
                            f_mid: float = 64.0, f_hi: float = 400.0,
                            hi_amp: float = 0.12):
    """Random plane-wave components for one face, two bands: a fractal
    (amp ∝ 1/√f) low band in [f_lo, f_mid] cycles/span for large-scale
    structure + a flat-amplitude high band in [f_mid, f_hi] that puts
    few-pixel-scale contrast in the image — FAST/BRIEF need step-like
    detail that a pure 1/f spectrum lacks.  Measured on the circuit scene:
    1/√f alone → FAST ≈ 0 corners; hi_amp 0.12/f_hi 400 → FAST saturates
    (256/256) while KLT track survival stays ~120/150 per frame (stronger
    high bands shimmer under motion and halve survival).  Returns [K, 4]
    rows (fu, fv, phase, amp)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    kl = k // 2
    kh = k - kl
    f1 = jnp.exp(jax.random.uniform(k1, (kl,), minval=jnp.log(f_lo),
                                    maxval=jnp.log(f_mid)))
    a1 = 1.0 / jnp.sqrt(f1)
    a1 = 0.5 * a1 / jnp.sum(a1)
    f2 = jnp.exp(jax.random.uniform(k2, (kh,), minval=jnp.log(f_mid),
                                    maxval=jnp.log(f_hi)))
    a2 = jnp.full((kh,), hi_amp / jnp.sqrt(kh))
    f = jnp.concatenate([f1, f2])
    amp = jnp.concatenate([a1, a2])
    th = jax.random.uniform(k3, (k,), minval=0.0, maxval=2 * jnp.pi)
    ph = jax.random.uniform(k4, (k,), minval=0.0, maxval=2 * jnp.pi)
    return jnp.stack([f * jnp.cos(th), f * jnp.sin(th), ph, amp], -1)


def sample_texture(params: jax.Array, a: jax.Array, b: jax.Array) -> jax.Array:
    """Evaluate the spectral texture at in-plane coords (a, b) ∈ [0,1]²;
    returns values in [0, 1].  params [K,4], a/b [...]."""
    arg = (2 * jnp.pi) * (a[..., None] * params[:, 0] + b[..., None] * params[:, 1]) \
        + params[:, 2]
    v = jnp.sum(params[:, 3] * jnp.cos(arg), axis=-1)  # roughly [-1, 1]
    return jnp.clip(0.5 + 0.75 * v, 0.0, 1.0)


class Room(NamedTuple):
    """Axis-aligned box [lo, hi] with one spectral texture per face.

    Faces ordered: x=lo, x=hi, y=lo, y=hi, z=lo, z=hi."""

    lo: jax.Array       # [3]
    hi: jax.Array       # [3]
    textures: jax.Array  # [6, K, 4] plane-wave params

    @staticmethod
    def make(key=None, lo=(-8.0, -8.0, -2.0), hi=(8.0, 8.0, 4.0),
             k: int = 96):
        key = key if key is not None else jax.random.PRNGKey(7)
        keys = jax.random.split(key, 6)
        tex = jnp.stack([spectral_texture_params(keys[i], k) for i in range(6)])
        return Room(jnp.asarray(lo, jnp.float32), jnp.asarray(hi, jnp.float32),
                    tex)


def _pixel_rays(camera, H: int, W: int) -> jax.Array:
    """Per-pixel unit ray directions in the CAMERA frame, through the real
    lens model (camera.lift undoes distortion) — precompute once."""
    vv, uu = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    uv = jnp.stack([uu.ravel(), vv.ravel()], -1)  # [HW, 2]
    rays = camera.lift(uv)  # [HW, 3]
    return rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)


@highest_matmul_precision
@functools.partial(jax.jit, static_argnames=("H", "W"))
def _render_body(rays, p_b, q_b, tic, Ric, room: Room, H: int, W: int):
    """Fused body-pose → image render (one dispatch per frame)."""
    R_b = lie.q2R(q_b).astype(jnp.float32)
    p_c = jnp.asarray(p_b, jnp.float32) + R_b @ tic
    R_wc = R_b @ Ric
    return _render(rays, p_c, R_wc, room, H, W)


@highest_matmul_precision
@functools.partial(jax.jit, static_argnames=("H", "W"))
def _render(rays, p_c, R_wc, room: Room, H: int, W: int):
    """Ray-cast the box interior: rays [HW,3] camera-frame, camera at p_c
    with R_wc (world←camera).  Returns [H,W] float32 in [0,255]."""
    d = rays @ R_wc.T  # world-frame directions [HW,3]
    o = p_c[None, :]

    best_t = jnp.full((rays.shape[0],), jnp.inf, jnp.float32)
    shade = jnp.zeros((rays.shape[0],), jnp.float32)

    face_axes = [(0, 1, 2), (0, 1, 2), (1, 0, 2), (1, 0, 2), (2, 0, 1), (2, 0, 1)]
    span = room.hi - room.lo
    for f, (ax, ta, tb) in enumerate(face_axes):
        bound = room.lo[ax] if f % 2 == 0 else room.hi[ax]
        t = (bound - o[:, ax]) / jnp.where(jnp.abs(d[:, ax]) < 1e-9, 1e-9, d[:, ax])
        hit = o + t[:, None] * d
        a = (hit[:, ta] - room.lo[ta]) / span[ta]
        b = (hit[:, tb] - room.lo[tb]) / span[tb]
        inside = (t > 1e-3) & (a >= 0) & (a <= 1) & (b >= 0) & (b <= 1)
        closer = inside & (t < best_t)
        v = sample_texture(room.textures[f], a, b)
        # slight per-face lighting so faces are distinguishable
        v = v * (0.75 + 0.05 * f)
        best_t = jnp.where(closer, t, best_t)
        shade = jnp.where(closer, v, shade)

    img = 20.0 + 215.0 * shade
    return img.reshape(H, W)


class RoomRenderer:
    """Renders grayscale frames of a textured room through a camera model."""

    def __init__(self, camera, H: int, W: int, room: Room | None = None,
                 tic=(0.0, 0.0, 0.0), Ric=np.eye(3)):
        self.camera = camera
        self.H, self.W = H, W
        self.room = room or Room.make()
        self.tic = jnp.asarray(tic, jnp.float32)
        self.Ric = jnp.asarray(Ric, jnp.float32)
        self.rays = _pixel_rays(camera, H, W)

    def render_device(self, p_b, q_b) -> jax.Array:
        """Render from a BODY pose (applies the camera extrinsic); the
        result stays on the device — downstream consumers (CLAHE, KLT,
        BRIEF) are all device programs."""
        return _render_body(
            self.rays, jnp.asarray(p_b), jnp.asarray(q_b),
            self.tic, self.Ric, self.room, self.H, self.W,
        )

    def render_body(self, p_b, q_b) -> np.ndarray:
        """Host-side copy of `render_device` (for viewing/saving)."""
        return np.asarray(self.render_device(p_b, q_b))
