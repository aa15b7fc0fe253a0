"""Small dense linear-algebra helpers shaped for TPU.

TPU XLA implements LU decomposition (jnp.linalg.solve / inv) only for f32;
every normal-equation system in this codebase is SPD (J^T J + ridge), so we
solve via Cholesky (supported at f64) and invert tiny blocks in closed form
— which is also faster: no pivoting, pure fused vector math.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def spd_solve(H: jax.Array, b: jax.Array) -> jax.Array:
    """Solve H x = b for SPD H via Jacobi-scaled Cholesky."""
    d = jnp.sqrt(jnp.clip(jnp.diagonal(H), 1e-30, None))
    Hn = H / d[:, None] / d[None, :]
    c, low = jax.scipy.linalg.cho_factor(Hn)
    return jax.scipy.linalg.cho_solve((c, low), b / d) / d


def inv3x3(M: jax.Array) -> jax.Array:
    """Closed-form (adjugate) inverse of [..., 3, 3] matrices."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv_det = 1.0 / det
    adj = jnp.stack([
        jnp.stack([A, -(b * i - c * h), b * f - c * e], -1),
        jnp.stack([B, a * i - c * g, -(a * f - c * d)], -1),
        jnp.stack([C, -(a * h - b * g), a * e - b * d], -1),
    ], -2)
    return adj * inv_det[..., None, None]


def inv2x2(M: jax.Array) -> jax.Array:
    """Closed-form inverse of [..., 2, 2] matrices."""
    a, b = M[..., 0, 0], M[..., 0, 1]
    c, d = M[..., 1, 0], M[..., 1, 1]
    inv_det = 1.0 / (a * d - b * c)
    return jnp.stack([
        jnp.stack([d, -b], -1),
        jnp.stack([-c, a], -1),
    ], -2) * inv_det[..., None, None]
