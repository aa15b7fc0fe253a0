"""Quaternion / SO(3) utilities, batched and jit-friendly.

Re-expresses the math utilities of the reference VIO stack
(vins_estimator/src/utility/utility.h:15-143) as pure JAX functions.
Quaternions are stored as ``[w, x, y, z]`` (Hamilton convention, active
rotation: ``R(q) v = q ⊗ [0,v] ⊗ q*``).  All functions broadcast over
leading batch dimensions.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# basic quaternion algebra
# ---------------------------------------------------------------------------


def qmul(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product q1 ⊗ q2; inputs [..., 4] as [w,x,y,z]."""
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def qconj(q: jax.Array) -> jax.Array:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def qnormalize(q: jax.Array) -> jax.Array:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def qrotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector(s) v [..., 3] by quaternion(s) q [..., 4]."""
    w = q[..., :1]
    u = q[..., 1:]
    # q v q* = v + 2 w (u × v) + 2 u × (u × v)
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def deltaQ(dtheta: jax.Array) -> jax.Array:
    """Small-angle quaternion [1, dθ/2], normalized (utility.h:15-28)."""
    half = 0.5 * dtheta
    one = jnp.ones_like(half[..., :1])
    return qnormalize(jnp.concatenate([one, half], axis=-1))


def qexp(dtheta: jax.Array) -> jax.Array:
    """Exact exponential map so(3) → quaternion (stable near 0)."""
    angle = jnp.linalg.norm(dtheta, axis=-1, keepdims=True)
    half = 0.5 * angle
    # sinc-style stable coefficients
    small = angle < 1e-6
    k = jnp.where(small, 0.5 - angle**2 / 48.0, jnp.sin(half) / jnp.where(small, 1.0, angle))
    w = jnp.cos(half)
    return jnp.concatenate([w, k * dtheta], axis=-1)


def qlog(q: jax.Array) -> jax.Array:
    """Logarithm map quaternion → so(3) rotation vector."""
    q = jnp.where(q[..., :1] < 0, -q, q)
    w = jnp.clip(q[..., :1], -1.0, 1.0)
    v = q[..., 1:]
    vnorm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(vnorm, w)
    small = vnorm < 1e-9
    scale = jnp.where(small, 2.0 / jnp.clip(w, 1e-12, None), angle / jnp.where(small, 1.0, vnorm))
    return scale * v


def skew(v: jax.Array) -> jax.Array:
    """[..., 3] → [..., 3, 3] cross-product matrix (utility.h:30-38)."""
    x, y, z = jnp.moveaxis(v, -1, 0)
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def Qleft(q: jax.Array) -> jax.Array:
    """4×4 matrix L(q) with L(q) p = q ⊗ p (utility.h:50-58)."""
    w = q[..., 0]
    v = q[..., 1:]
    top = jnp.concatenate([w[..., None], -v], axis=-1)[..., None, :]
    bottom = jnp.concatenate(
        [v[..., :, None], w[..., None, None] * jnp.eye(3, dtype=q.dtype) + skew(v)], axis=-1
    )
    return jnp.concatenate([top, bottom], axis=-2)


def Qright(p: jax.Array) -> jax.Array:
    """4×4 matrix R(p) with R(p) q = q ⊗ p (utility.h:60-68)."""
    w = p[..., 0]
    v = p[..., 1:]
    top = jnp.concatenate([w[..., None], -v], axis=-1)[..., None, :]
    bottom = jnp.concatenate(
        [v[..., :, None], w[..., None, None] * jnp.eye(3, dtype=p.dtype) - skew(v)], axis=-1
    )
    return jnp.concatenate([top, bottom], axis=-2)


# ---------------------------------------------------------------------------
# rotation matrix conversions
# ---------------------------------------------------------------------------


def q2R(q: jax.Array) -> jax.Array:
    """Quaternion [..., 4] → rotation matrix [..., 3, 3]."""
    w, x, y, z = jnp.moveaxis(qnormalize(q), -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )


def R2q(R: jax.Array) -> jax.Array:
    """Rotation matrix [..., 3, 3] → quaternion [..., 4] (w ≥ 0).

    Branch-free Shepperd-style selection of the most stable of the four
    candidate computations (jit/vmap friendly).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # candidate squared magnitudes (4x^2 - 1 + tr-like quantities, all >= -1)
    qw2 = 1.0 + tr
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22
    cand = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    idx = jnp.argmax(cand, axis=-1)

    sw = jnp.sqrt(jnp.clip(qw2, 1e-12, None)) * 2.0  # 4 qw
    q_w = jnp.stack([0.25 * sw, (m21 - m12) / sw, (m02 - m20) / sw, (m10 - m01) / sw], axis=-1)
    sx = jnp.sqrt(jnp.clip(qx2, 1e-12, None)) * 2.0  # 4 qx
    q_x = jnp.stack([(m21 - m12) / sx, 0.25 * sx, (m01 + m10) / sx, (m02 + m20) / sx], axis=-1)
    sy = jnp.sqrt(jnp.clip(qy2, 1e-12, None)) * 2.0  # 4 qy
    q_y = jnp.stack([(m02 - m20) / sy, (m01 + m10) / sy, 0.25 * sy, (m12 + m21) / sy], axis=-1)
    sz = jnp.sqrt(jnp.clip(qz2, 1e-12, None)) * 2.0  # 4 qz
    q_z = jnp.stack([(m10 - m01) / sz, (m02 + m20) / sz, (m12 + m21) / sz, 0.25 * sz], axis=-1)

    q = jnp.take_along_axis(
        jnp.stack([q_w, q_x, q_y, q_z], axis=-2), idx[..., None, None], axis=-2
    )[..., 0, :]
    q = jnp.where(q[..., :1] < 0, -q, q)
    return qnormalize(q)


# ---------------------------------------------------------------------------
# Euler (yaw-pitch-roll, degrees — matching the reference convention)
# ---------------------------------------------------------------------------


def R2ypr(R: jax.Array) -> jax.Array:
    """Rotation → [yaw, pitch, roll] in DEGREES (utility.h:70-89)."""
    n = R[..., :, 0]
    o = R[..., :, 1]
    a = R[..., :, 2]
    y = jnp.arctan2(n[..., 1], n[..., 0])
    p = jnp.arctan2(-n[..., 2], n[..., 0] * jnp.cos(y) + n[..., 1] * jnp.sin(y))
    r = jnp.arctan2(
        a[..., 0] * jnp.sin(y) - a[..., 1] * jnp.cos(y),
        -o[..., 0] * jnp.sin(y) + o[..., 1] * jnp.cos(y),
    )
    return jnp.stack([y, p, r], axis=-1) / jnp.pi * 180.0


def ypr2R(ypr: jax.Array) -> jax.Array:
    """[yaw, pitch, roll] DEGREES → rotation matrix (utility.h:91-112)."""
    y, p, r = jnp.moveaxis(ypr / 180.0 * jnp.pi, -1, 0)
    cy, sy = jnp.cos(y), jnp.sin(y)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cr, sr = jnp.cos(r), jnp.sin(r)
    zero = jnp.zeros_like(y)
    one = jnp.ones_like(y)
    Rz = jnp.stack(
        [
            jnp.stack([cy, -sy, zero], axis=-1),
            jnp.stack([sy, cy, zero], axis=-1),
            jnp.stack([zero, zero, one], axis=-1),
        ],
        axis=-2,
    )
    Ry = jnp.stack(
        [
            jnp.stack([cp, zero, sp], axis=-1),
            jnp.stack([zero, one, zero], axis=-1),
            jnp.stack([-sp, zero, cp], axis=-1),
        ],
        axis=-2,
    )
    Rx = jnp.stack(
        [
            jnp.stack([one, zero, zero], axis=-1),
            jnp.stack([zero, cr, -sr], axis=-1),
            jnp.stack([zero, sr, cr], axis=-1),
        ],
        axis=-2,
    )
    return Rz @ Ry @ Rx


def g2R(g: jax.Array) -> jax.Array:
    """Rotation taking gravity direction g to +z with zero yaw (utility.cpp).

    Returns R0 with R0 @ (g/|g|) = [0,0,1] and yaw(R0) = 0.
    """
    ng1 = g / jnp.linalg.norm(g, axis=-1, keepdims=True)
    ng2 = jnp.asarray([0.0, 0.0, 1.0], dtype=g.dtype)
    # quaternion from two vectors
    c = jnp.sum(ng1 * ng2, axis=-1, keepdims=True)
    axis = jnp.cross(ng1, jnp.broadcast_to(ng2, ng1.shape))
    # handle near-antiparallel robustly enough for gravity vectors (never truly flipped)
    q = qnormalize(jnp.concatenate([1.0 + c, axis], axis=-1))
    R0 = q2R(q)
    yaw = R2ypr(R0)[..., 0]
    fix = ypr2R(jnp.stack([-yaw, jnp.zeros_like(yaw), jnp.zeros_like(yaw)], axis=-1))
    return fix @ R0


def normalize_angle(deg: jax.Array) -> jax.Array:
    """Wrap angle in degrees to [-180, 180) (utility.h:134-143; the
    floor-based formula maps +180 to -180)."""
    return deg - 360.0 * jnp.floor((deg + 180.0) / 360.0)


# ---------------------------------------------------------------------------
# pose boxplus (local parameterization)
# ---------------------------------------------------------------------------


def pose_boxplus(p: jax.Array, q: jax.Array, dp: jax.Array, dth: jax.Array):
    """SE(3)-style update used by the solver: p += dp, q ← q ⊗ δq(dθ).

    Mirrors the reference pose local parameterization
    (factor/pose_local_parameterization.cpp:3-19).
    """
    return p + dp, qnormalize(qmul(q, deltaQ(dth)))
