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


def eigh3x3(M: jax.Array):
    """Closed-form eigendecomposition of symmetric [...,3,3] matrices
    (trigonometric / Cardano method + cross-product eigenvectors).

    TPU has no native small-matrix eigensolver — jnp.linalg.eigh lowers to a
    sequential QR-iteration loop that costs ~ms per batch; this is pure
    fused vector math.  Returns (w [...,3] ascending, V [...,3,3] columns)."""
    dt = M.dtype
    q = jnp.trace(M, axis1=-2, axis2=-1)[..., None, None] / 3.0
    B = M - q * jnp.eye(3, dtype=dt)
    p2 = jnp.sum(B * B, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-38))
    detB = (
        B[..., 0, 0] * (B[..., 1, 1] * B[..., 2, 2] - B[..., 1, 2] * B[..., 2, 1])
        - B[..., 0, 1] * (B[..., 1, 0] * B[..., 2, 2] - B[..., 1, 2] * B[..., 2, 0])
        + B[..., 0, 2] * (B[..., 1, 0] * B[..., 2, 1] - B[..., 1, 1] * B[..., 2, 0])
    )
    r = jnp.clip(detB / (2.0 * p ** 3), -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    q0 = q[..., 0, 0]
    w2 = q0 + 2.0 * p * jnp.cos(phi)                      # largest
    w0 = q0 + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)  # smallest
    w1 = 3.0 * q0 - w0 - w2
    w = jnp.stack([w0, w1, w2], axis=-1)  # ascending

    def eigvec(lam):
        # v ∝ cross of two rows of (M − λI); pick the most independent pair
        A = M - lam[..., None, None] * jnp.eye(3, dtype=dt)
        c01 = jnp.cross(A[..., 0, :], A[..., 1, :])
        c02 = jnp.cross(A[..., 0, :], A[..., 2, :])
        c12 = jnp.cross(A[..., 1, :], A[..., 2, :])
        n01 = jnp.sum(c01 * c01, axis=-1)
        n02 = jnp.sum(c02 * c02, axis=-1)
        n12 = jnp.sum(c12 * c12, axis=-1)
        best = jnp.stack([n01, n02, n12], axis=-1)
        k = jnp.argmax(best, axis=-1)
        v = jnp.take_along_axis(
            jnp.stack([c01, c02, c12], axis=-2), k[..., None, None], axis=-2
        )[..., 0, :]
        nv = jnp.linalg.norm(v, axis=-1, keepdims=True)
        # triple-degenerate M (≈ λI): every direction is an eigenvector
        v = jnp.where(nv < 1e-18, jnp.asarray([1.0, 0.0, 0.0], dt), v / jnp.maximum(nv, 1e-20))
        return v

    # the cross-product construction is only well-conditioned for an
    # ISOLATED eigenvalue (rank(M−λI)=2); a repeated pair — the essential
    # matrix case (0,1,1) — makes it garbage.  Recipe: extract the most
    # isolated eigenvalue's vector, then deflate to the orthogonal plane
    # and solve the remaining symmetric 2×2 in closed form (any orthonormal
    # basis of a repeated pair's eigenspace is a valid eigenbasis).
    gap_lo = w[..., 1] - w[..., 0]
    use_lo = gap_lo >= (w[..., 2] - w[..., 1])
    lam_iso = jnp.where(use_lo, w[..., 0], w[..., 2])
    v_iso = eigvec(lam_iso)

    # orthonormal basis {b1, b2} of the plane ⊥ v_iso
    ref = jnp.where(
        jnp.abs(v_iso[..., :1]) > 0.9,
        jnp.asarray([0.0, 1.0, 0.0], dt), jnp.asarray([1.0, 0.0, 0.0], dt))
    b1 = jnp.cross(v_iso, ref)
    b1 = b1 / jnp.maximum(jnp.linalg.norm(b1, axis=-1, keepdims=True), 1e-20)
    b2 = jnp.cross(v_iso, b1)
    # 2×2 restriction N = Bᵀ M B, closed-form Jacobi rotation
    Mb1 = (M @ b1[..., None])[..., 0]
    Mb2 = (M @ b2[..., None])[..., 0]
    n11 = jnp.sum(b1 * Mb1, axis=-1)
    n12 = jnp.sum(b1 * Mb2, axis=-1)
    n22 = jnp.sum(b2 * Mb2, axis=-1)
    theta = 0.5 * jnp.arctan2(2.0 * n12, n11 - n22)
    c, sn = jnp.cos(theta), jnp.sin(theta)
    e1 = c[..., None] * b1 + sn[..., None] * b2
    e2 = -sn[..., None] * b1 + c[..., None] * b2
    l1 = c * c * n11 + 2 * c * sn * n12 + sn * sn * n22
    l2 = sn * sn * n11 - 2 * c * sn * n12 + c * c * n22
    swap = l1 > l2
    lo_v = jnp.where(swap[..., None], e2, e1)
    hi_v = jnp.where(swap[..., None], e1, e2)
    v0 = jnp.where(use_lo[..., None], v_iso, lo_v)
    v1 = jnp.where(use_lo[..., None], lo_v, hi_v)
    v2 = jnp.where(use_lo[..., None], hi_v, v_iso)
    V = jnp.stack([v0, v1, v2], axis=-1)  # columns
    return w, V


def svd3x3(E: jax.Array):
    """Closed-form SVD of [...,3,3] via eigh3x3(EᵀE) (no TPU QR loop).
    Returns (U, s [...,3] descending, Vt) with det-sign folded into U's last
    column so U is always a proper frame when E has rank ≥ 2."""
    w, V = eigh3x3(jnp.swapaxes(E, -1, -2) @ E)
    # descending singular values
    s = jnp.sqrt(jnp.maximum(w[..., ::-1], 0.0))
    Vd = V[..., ::-1]
    u0 = E @ Vd[..., 0:1]
    u1 = E @ Vd[..., 1:2]
    u0 = u0[..., 0] / jnp.maximum(s[..., 0:1], 1e-20)
    u1 = u1[..., 0] / jnp.maximum(s[..., 1:2], 1e-20)
    # re-orthogonalize u1 against u0 (f32 safety) and complete the frame
    u1 = u1 - jnp.sum(u0 * u1, axis=-1, keepdims=True) * u0
    u1 = u1 / jnp.maximum(jnp.linalg.norm(u1, axis=-1, keepdims=True), 1e-20)
    u2 = jnp.cross(u0, u1)
    # u2 is forced to complete a right-handed U; flip v2 so E v2 = s2 u2
    # still holds when det(E) < 0 (s2 ≈ 0 leaves the sign irrelevant)
    sgn = jnp.sum((E @ Vd[..., 2:3])[..., 0] * u2, axis=-1, keepdims=True)
    sgn = jnp.where(sgn < 0, -1.0, 1.0).astype(E.dtype)
    Vd = Vd.at[..., 2].multiply(sgn)
    U = jnp.stack([u0, u1, u2], axis=-1)
    return U, s, jnp.swapaxes(Vd, -1, -2)


def smallest_eigvec(M: jax.Array, iters: int = 8) -> jax.Array:
    """Eigenvector of the smallest eigenvalue of symmetric PSD [...,n,n] via
    ridged inverse iteration (fixed count): Cholesky once, then repeated
    solves — batched matmuls/triangular-solves instead of TPU's sequential
    eigensolver loop."""
    n = M.shape[-1]
    dt = M.dtype
    ridge = 1e-6 * jnp.trace(M, axis1=-2, axis2=-1)[..., None, None] / n \
        + 1e-30
    L = jnp.linalg.cholesky(M + ridge * jnp.eye(n, dtype=dt))
    v = jnp.ones(M.shape[:-1], dt)
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    def body(v, _):
        y = jax.scipy.linalg.cho_solve((L, True), v[..., None])[..., 0]
        v = y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), 1e-30)
        return v, None

    v, _ = jax.lax.scan(body, v, None, length=iters)
    return v


def inv2x2(M: jax.Array) -> jax.Array:
    """Closed-form inverse of [..., 2, 2] matrices."""
    a, b = M[..., 0, 0], M[..., 0, 1]
    c, d = M[..., 1, 0], M[..., 1, 1]
    inv_det = 1.0 / (a * d - b * c)
    return jnp.stack([
        jnp.stack([d, -b], -1),
        jnp.stack([-c, a], -1),
    ], -2) * inv_det[..., None, None]
