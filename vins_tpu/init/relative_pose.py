"""Two-view relative pose from normalized-plane correspondences.

TPU-native replacement of the reference's 5-point path
(vins_estimator/src/initial/solve_5pts.cpp:193-228: cv::findFundamentalMat
FM_RANSAC on normalized points — i.e. the 8-point estimator under RANSAC —
followed by the in-tree backport of cv::recoverPose, :4-100).  Here the whole
pipeline is one fixed-shape jitted program:

  * K RANSAC hypotheses drawn at once, each an 8-point essential solve via
    batched SVD (no data-dependent loop; K is static),
  * Sampson-distance inlier scoring of all hypotheses against all points in
    one einsum,
  * best hypothesis refined by a weighted 8-point solve on its inliers,
  * cheirality resolution over the 4 (R, t) decompositions by batched DLT
    triangulation depth voting (recoverPose equivalent).

All inputs are padded to N points with a validity mask.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie
from ..core.linalg import smallest_eigvec, svd3x3
from ..core.precision import highest_matmul_precision


class RelPose(NamedTuple):
    R: jax.Array  # [3,3] pose of frame j in frame i: X_i = R @ X_j + t
    t: jax.Array  # [3] unit norm
    inliers: jax.Array  # [N] bool
    n_inliers: jax.Array  # [] int32
    ok: jax.Array  # [] bool (enough support, solve_5pts.cpp:196,221)


def _eight_point(x1: jax.Array, x2: jax.Array, w: jax.Array) -> jax.Array:
    """Weighted 8-point essential estimate.  x1,x2: [M,2] normalized-plane
    points with x2ᵀ E x1 = 0; w: [M] row weights.  Returns E [3,3] projected
    onto the essential manifold (singular values 1,1,0)."""
    ones = jnp.ones_like(x1[:, :1])
    h1 = jnp.concatenate([x1, ones], axis=-1)  # [M,3]
    h2 = jnp.concatenate([x2, ones], axis=-1)
    A = (h2[:, :, None] * h1[:, None, :]).reshape(-1, 9) * w[:, None]
    # null vector of A: smallest eigenvector of AᵀA — ridged inverse
    # iteration (core/linalg.py), not jnp.linalg.eigh, which lowers to a
    # sequential QR loop on TPU (~ms per call; this runs 65×/frame)
    E = smallest_eigvec(A.T @ A).reshape(3, 3)
    U, S, Vt = svd3x3(E)
    return (U * jnp.asarray([1.0, 1.0, 0.0], E.dtype)[None, :]) @ Vt


def _sampson_sq(E: jax.Array, x1: jax.Array, x2: jax.Array) -> jax.Array:
    """Squared Sampson distance of each correspondence to E.  [*,N]"""
    ones = jnp.ones_like(x1[..., :1])
    h1 = jnp.concatenate([x1, ones], axis=-1)
    h2 = jnp.concatenate([x2, ones], axis=-1)
    Ex1 = h1 @ jnp.swapaxes(E, -1, -2)  # [N,3] rows E@h1
    Etx2 = h2 @ E  # rows Eᵀ@h2
    num = jnp.sum(h2 * Ex1, axis=-1) ** 2
    den = (
        Ex1[..., 0] ** 2 + Ex1[..., 1] ** 2 + Etx2[..., 0] ** 2 + Etx2[..., 1] ** 2
    )
    return num / jnp.maximum(den, 1e-12)


def _triangulate_two_view(R, t, x1, x2):
    """Two-view depths for cheirality voting, closed form: with rays
    h1 = [x1,1] in frame 1 and h2 = [x2,1] in frame 2 (X_2 = R X_1 + t),
    solve min ‖z1·R h1 − z2·h2 + t‖² — a 2×2 normal system per point
    (replaces the DLT eigh of a [N,4,4] stack, which lowers to TPU's
    sequential eigensolver).  Returns (X [N,3] in frame 1, z1, z2)."""
    ones = jnp.ones_like(x1[..., :1])
    h1 = jnp.concatenate([x1, ones], axis=-1)  # [N,3]
    h2 = jnp.concatenate([x2, ones], axis=-1)
    a = h1 @ R.T  # [N,3] = R h1
    aa = jnp.sum(a * a, axis=-1)
    bb = jnp.sum(h2 * h2, axis=-1)
    ab = jnp.sum(a * h2, axis=-1)
    at = a @ t
    bt = h2 @ t
    det = aa * bb - ab * ab
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    # normal equations of [a, -h2] [z1, z2]ᵀ = -t
    z1 = (-at * bb + ab * bt) / det
    z2 = (-ab * at + aa * bt) / det
    X = z1[..., None] * h1
    return X, z1, z2


def decompose_essential(E: jax.Array):
    """The 4 candidate (R, t) with X_2 = R X_1 + t (solve_5pts.cpp:4-33)."""
    U, _, Vt = svd3x3(E)
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.asarray([[0.0, -1, 0], [1, 0, 0], [0, 0, 1]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


@highest_matmul_precision
@functools.partial(
    jax.jit, static_argnames=("n_hyp", "min_corres", "min_inliers"))
def solve_relative_pose(
    x1: jax.Array,  # [N,2] normalized-plane points in frame i
    x2: jax.Array,  # [N,2] matching points in frame j
    valid: jax.Array,  # [N] bool
    key: jax.Array,
    n_hyp: int = 64,
    thresh: float = 0.3 / 460.0,  # solve_5pts.cpp:204 RANSAC threshold
    min_corres: int = 15,
    min_inliers: int = 12,
) -> RelPose:
    """MotionEstimator::solveRelativeRT equivalent (solve_5pts.cpp:193-228).

    Returns the pose of frame j expressed in frame i (the reference's
    `Rotation = R.tᵀ, Translation = -Rᵀ t` output, :223-225)."""
    # accept numpy inputs (callers pass host arrays for cheap batched
    # transfer); the vmapped fancy-indexing below needs device arrays
    x1 = jnp.asarray(x1)
    x2 = jnp.asarray(x2)
    valid = jnp.asarray(valid)
    N = x1.shape[0]
    dt = x1.dtype
    nvalid = jnp.sum(valid)

    # --- RANSAC: sample K×8 indices from the valid set --------------------
    # Gumbel-top-k over masked logits gives 8 distinct valid indices per
    # hypothesis without rejection loops.
    logits = jnp.where(valid, 0.0, -jnp.inf)[None, :].astype(jnp.float32)
    g = jax.random.gumbel(key, (n_hyp, N), jnp.float32) + logits
    _, idx = jax.lax.top_k(g, 8)  # [K,8]

    Es = jax.vmap(
        lambda ii: _eight_point(x1[ii], x2[ii], jnp.ones((8,), dt))
    )(idx)  # [K,3,3]

    d2 = jax.vmap(lambda E: _sampson_sq(E, x1, x2))(Es)  # [K,N]
    inl = (d2 < thresh * thresh) & valid[None, :]
    scores = jnp.sum(inl, axis=1)
    best = jnp.argmax(scores)

    # --- refinement: weighted 8-point on the best hypothesis's inliers ----
    w = inl[best].astype(dt)
    E = _eight_point(x1, x2, w)
    d2b = _sampson_sq(E, x1, x2)
    inliers = (d2b < thresh * thresh) & valid
    n_inl = jnp.sum(inliers)
    # fall back to the raw best hypothesis if refinement lost support
    use_ref = n_inl >= scores[best]
    E = jnp.where(use_ref, E, Es[best])
    inliers = jnp.where(use_ref, inliers, inl[best])
    n_inl = jnp.maximum(n_inl, scores[best])

    # --- cheirality vote over the 4 decompositions ------------------------
    Rs, ts = decompose_essential(E)

    def depth_votes(R, t):
        _, z1, z2 = _triangulate_two_view(R, t, x1, x2)
        good = (z1 > 0) & (z2 > 0) & inliers
        return jnp.sum(good)

    votes = jax.vmap(depth_votes)(Rs, ts)
    k = jnp.argmax(votes)
    R_21, t_21 = Rs[k], ts[k]

    # output convention: pose of j in i
    R_ij = R_21.T
    t_ij = -R_21.T @ t_21
    ok = (nvalid >= min_corres) & (n_inl > min_inliers)
    return RelPose(R=R_ij, t=t_ij, inliers=inliers, n_inliers=n_inl, ok=ok)
