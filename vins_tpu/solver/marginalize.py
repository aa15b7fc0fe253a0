"""Square-root (SRIF/QR) marginalization → linear prior factor.

Re-expresses the reference's MarginalizationInfo machinery
(marginalization_factor.cpp:89-318) as dense masked linear algebra:

  * MARGIN_OLD (estimator.cpp:826-933): drop frame 0's pose + speed/bias and
    every landmark anchored at frame 0; the information they carry (prior +
    IMU factor 0→1 + projection factors anchored at 0) is folded into a new
    linear prior over the remaining states, whose columns are then shifted
    to the slid window layout (frame k+1 → k).
  * MARGIN_SECOND_NEW (estimator.cpp:935-999): drop only pose[F-2] from the
    existing prior (its observations are discarded, its IMU interval merged).

The prior is stored as (J, r0, linearization state): r(x) = r0 + J·(x ⊟ lin).

Unlike the reference (which assembles H = JᵀJ, Schur-complements, and
eigen-factors back — fine in double precision, marginalization_factor.cpp:
174-297), the elimination here runs in SQUARE-ROOT form: stack all whitened
factor Jacobian rows, annihilate each landmark's inverse-depth column with
an orthogonal projection, and QR-eliminate the dropped pose/speed-bias
columns — the trailing triangle of R IS the new prior's (J, r0).  Working
on J instead of JᵀJ keeps the conditioning at κ instead of κ², which is the
difference between a stable and a divergent prior chain in float32 on TPU
(measured: proxy ATE 1.5 m with the normal-equation path vs 0.1 m in f64;
the QR path closes that gap at f32).  The distributed-landmark path is a
TSQR: per-shard QR of the local projection rows, all_gather the [N,N] R
factors, one final QR — the square-root analog of psum-ing JᵀJ shards.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..imu.preintegration import Preintegration
from .factors import densify_imu, densify_projection, imu_blocks, projection_blocks
from .gn import _cauchy_weights
from .problem import FeatureObs, Layout, Prior, WindowState, prior_residual


def _eliminate_lambda_rows(J_dense, J_lam, r_p):
    """Annihilate each landmark's inverse-depth column from its own
    projection rows by projecting onto the orthogonal complement of the λ
    coefficient vector u = J_lam (P = I − uuᵀ/uᵀu applied row-space-side).
    This IS the square-root marginalization of λ: the one remaining
    u-direction row (λ's conditional factor) is annihilated, the projected
    rows carry exactly the marginal information on the poses.  Numerically
    benign — cancellation is confined to one landmark's small block.
    Shapes: J_dense [L,F,2,D], J_lam [L,F,2], r_p [L,F,2] →
    rows [L·2F, D], rhs [L·2F]."""
    L, F, two, D = J_dense.shape
    dt = J_dense.dtype
    u = J_lam.reshape(L, F * two)                       # [L,K]
    Jd = J_dense.reshape(L, F * two, D)
    rr = r_p.reshape(L, F * two)
    uu = jnp.sum(u * u, axis=-1)                        # [L]
    tiny = 1e-20 if dt == jnp.float64 else 1e-12
    inv_uu = jnp.where(uu > tiny, 1.0 / (uu + tiny), 0.0)
    cJ = jnp.einsum("lk,lkd->ld", u, Jd)                # uᵀJ  [L,D]
    cr = jnp.einsum("lk,lk->l", u, rr)                  # uᵀr  [L]
    Jd = Jd - u[:, :, None] * (cJ * inv_uu[:, None])[:, None, :]
    rr = rr - u * (cr * inv_uu)[:, None]
    return Jd.reshape(L * F * two, D), rr.reshape(L * F * two)


def _marginal_qr(rows, rhs, m: int):
    """QR-eliminate the first `m` columns of the stacked whitened residual
    system r(dx) = rhs + rows·dx; returns the marginal factor on the
    remaining columns: (J_kept [N−m, N−m], r0_kept [N−m])."""
    A = jnp.concatenate([rows, rhs[:, None]], axis=1)
    R = jnp.linalg.qr(A, mode="r")
    n = rows.shape[1]
    return R[m:n, m:n], R[m:n, n]


def marginalize_old(
    state: WindowState,
    obs: FeatureObs,
    pres: Preintegration,
    prior: Prior,
    gravity: jax.Array,
    layout: Layout,
    focal: float = 460.0,
    max_imu_dt: float = 10.0,
    axis_name: str | None = None,
) -> Prior:
    """Marginalize frame 0 (and its anchored landmarks) into a new prior in
    the *slid* window layout.

    Only factors touching dropped variables contribute (marginalization_
    factor.cpp drop_set semantics): the previous prior, IMU factor 0→1, and
    projection factors anchored at frame 0."""
    F = layout.F
    dt = state.p.dtype
    dim_x = layout.dim_x

    anchored0 = obs.anchor == 0  # landmarks to drop
    proj_mask = anchored0[:, None] & jnp.ones((1, F), bool)
    imu_mask = jnp.arange(F - 1) == 0

    # --- whitened residual rows of every factor touching dropped states ----
    proj = projection_blocks(state, obs, focal)
    valid = proj.valid & proj_mask
    sw, _ = _cauchy_weights(proj.r, valid)
    r_p = proj.r * sw[..., None]
    proj = proj._replace(J=proj.J * sw[..., None, None], valid=valid)
    J_dense, J_lam = densify_projection(proj, obs, layout)

    imu = imu_blocks(state, pres, gravity, max_imu_dt)
    im = (imu.valid & imu_mask)[:, None].astype(r_p.dtype)
    imu_rows = densify_imu(imu._replace(J=imu.J * im[..., None]),
                           layout).reshape(-1, dim_x)
    imu_rhs = (imu.r * im).reshape(-1)

    prior_rows = jnp.where(prior.valid, prior.J, jnp.zeros_like(prior.J))
    prior_rhs = prior_residual(prior, state, layout)

    # --- step 1: square-root-eliminate the landmark inverse depths ---------
    proj_rows, proj_rhs = _eliminate_lambda_rows(J_dense, J_lam, r_p)

    # --- step 2: QR-eliminate pose0 (cols 0:6) + sb0 (cols 6F:6F+9) --------
    m_idx = jnp.concatenate([jnp.arange(6), 6 * F + jnp.arange(9)])
    keep_mask = jnp.ones((dim_x,), bool).at[m_idx].set(False)
    k_idx = jnp.where(keep_mask, size=dim_x - 15)[0]
    perm = jnp.concatenate([m_idx, k_idx])

    if axis_name is not None:
        # TSQR over the sharded landmark axis: per-shard QR compresses the
        # local projection rows to one [D+1, D+1] triangle, the gathered
        # triangles + the (replicated) prior/IMU rows take one final QR
        loc = jnp.concatenate(
            [proj_rows[:, perm], proj_rhs[:, None]], axis=1)
        R_loc = jnp.linalg.qr(loc, mode="r")
        proj_cat = jax.lax.all_gather(R_loc, axis_name).reshape(
            -1, dim_x + 1)
        rows = jnp.concatenate([
            proj_cat,
            jnp.concatenate([prior_rows[:, perm], prior_rhs[:, None]], 1),
            jnp.concatenate([imu_rows[:, perm], imu_rhs[:, None]], 1),
        ], axis=0)
        J_k, r0_k = _marginal_qr(rows[:, :-1], rows[:, -1], 15)
    else:
        rows = jnp.concatenate([proj_rows, prior_rows, imu_rows], axis=0)
        rhs = jnp.concatenate([proj_rhs, prior_rhs, imu_rhs])
        J_k, r0_k = _marginal_qr(rows[:, perm], rhs, 15)

    # --- step 3: shift kept columns to the slid layout ---------------------
    # kept layout: poses 1..F-1 (6 each), sbs 1..F-1 (9 each), ext, td
    # slid layout: poses 0..F-2, sbs 0..F-2, ext, td — same packing order, so
    # the kept vector maps to slid coords [0:6(F-1)] ⊕ [6F:6F+9(F-1)] ⊕ tail.
    R = J_k.shape[0]
    J_new = jnp.zeros((layout.dim_x, layout.dim_x), dt)
    npose = 6 * (F - 1)
    nsb = 9 * (F - 1)
    J_new = J_new.at[:R, 0:npose].set(J_k[:, 0:npose])
    J_new = J_new.at[:R, 6 * F : 6 * F + nsb].set(J_k[:, npose : npose + nsb])
    J_new = J_new.at[:R, layout.ext_off :].set(J_k[:, npose + nsb :])
    r0_new = jnp.zeros((layout.dim_x,), dt).at[: R].set(r0_k)

    # linearization point in slid layout: frame k+1 → k; last frame repeats
    # (its columns are zero so the value is irrelevant)
    roll = lambda a: jnp.concatenate([a[1:], a[-1:]], axis=0)
    lin = WindowState(
        p=roll(state.p), q=roll(state.q), v=roll(state.v),
        ba=roll(state.ba), bg=roll(state.bg),
        tic=state.tic, qic=state.qic, td=state.td,
    )
    return Prior(J=J_new, r0=r0_new, lin=lin, valid=jnp.asarray(True))


def marginalize_second_new(prior: Prior, layout: Layout) -> Prior:
    """Drop pose[F-2] from the existing prior only (estimator.cpp:935-999),
    then shift frame F-1 → F-2 in the layout (slideWindow MARGIN_SECOND_NEW:
    the newest frame replaces the second newest)."""
    F = layout.F
    dt = prior.J.dtype

    m_idx = 6 * (F - 2) + jnp.arange(6)
    keep_mask = jnp.ones((layout.dim_x,), bool).at[m_idx].set(False)
    k_idx = jnp.where(keep_mask, size=layout.dim_x - 6)[0]
    perm = jnp.concatenate([m_idx, k_idx])

    # square-root drop: QR-eliminate the 6 pose columns directly on the
    # prior's J — no JᵀJ (which would square the condition number each time
    # a non-keyframe is marginalized, f32-fatal on long low-parallax runs)
    rows = jnp.where(prior.valid, prior.J, jnp.zeros_like(prior.J))
    J_k, r0_k = _marginal_qr(rows[:, perm], prior.r0, 6)

    # scatter kept cols back, then apply the slide's address shift
    # (estimator.cpp:969-984): frame F-1 slots → frame F-2 slots, for both
    # pose and speed/bias.  (Invariant: the prior only ever carries sb of the
    # oldest frame — the sb moves are no-ops on zero columns, kept for
    # faithfulness.)
    R = J_k.shape[0]
    Jf = jnp.zeros((layout.dim_x, layout.dim_x), dt).at[:R, k_idx].set(J_k)
    for src0, dst0, n in (
        (6 * (F - 1), 6 * (F - 2), 6),
        (6 * F + 9 * (F - 1), 6 * F + 9 * (F - 2), 9),
    ):
        src = src0 + jnp.arange(n)
        dst = dst0 + jnp.arange(n)
        Jf = Jf.at[:, dst].set(Jf[:, src]).at[:, src].set(0.0)
    r0f = jnp.zeros((layout.dim_x,), dt).at[:R].set(r0_k)

    lin = prior.lin
    lin = lin._replace(
        p=lin.p.at[F - 2].set(lin.p[F - 1]),
        q=lin.q.at[F - 2].set(lin.q[F - 1]),
        v=lin.v.at[F - 2].set(lin.v[F - 1]),
        ba=lin.ba.at[F - 2].set(lin.ba[F - 1]),
        bg=lin.bg.at[F - 2].set(lin.bg[F - 1]),
    )
    return Prior(J=Jf, r0=r0f, lin=lin, valid=prior.valid)
