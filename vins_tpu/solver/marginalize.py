"""Schur-complement marginalization → linear prior factor.

Re-expresses the reference's MarginalizationInfo machinery
(marginalization_factor.cpp:89-318) as dense masked linear algebra:

  * MARGIN_OLD (estimator.cpp:826-933): drop frame 0's pose + speed/bias and
    every landmark anchored at frame 0; the information they carry (prior +
    IMU factor 0→1 + projection factors anchored at 0) is folded into a new
    linear prior over the remaining states, whose columns are then shifted
    to the slid window layout (frame k+1 → k).
  * MARGIN_SECOND_NEW (estimator.cpp:935-999): drop only pose[F-2] from the
    existing prior (its observations are discarded, its IMU interval merged).

The prior is stored as (J, r0, linearization state): r(x) = r0 + J·(x ⊟ lin)
with J = sqrt(Λ) from an eigendecomposition of the marginal information
(marginalization_factor.cpp:283-291).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..imu.preintegration import Preintegration
from .factors import densify_imu, densify_projection, imu_blocks, projection_blocks
from .gn import _cauchy_weights, _psum
from .problem import FeatureObs, Layout, Prior, WindowState, prior_residual


def _eig_sqrt_factor(H: jax.Array, b: jax.Array, eps: float):
    """Factor information (H, b) into (J, r0) with JᵀJ = H, Jᵀr0 = b... more
    precisely the reference's construction: H = V S Vᵀ,
    J = sqrt(S⁺) Vᵀ, r0 = sqrt(S⁺)⁻¹ Vᵀ b  (marginalization_factor.cpp:283-291).
    Small/negative eigenvalues are truncated (gauge directions carry no
    information)."""
    S, V = jnp.linalg.eigh(H)
    keep = S > eps
    S_sqrt = jnp.sqrt(jnp.where(keep, S, 1.0))
    J = jnp.where(keep[:, None], S_sqrt[:, None] * V.T, 0.0)
    r0 = jnp.where(keep, (V.T @ b) / S_sqrt, 0.0)
    return J, r0


def _assemble_full(
    state: WindowState, obs: FeatureObs, pres: Preintegration, prior: Prior,
    gravity: jax.Array, layout: Layout, focal: float, max_imu_dt: float,
    proj_mask: jax.Array, imu_mask: jax.Array, axis_name: str | None = None,
):
    """Dense Gauss-Newton system (H, b) over [state ⊕ landmarks] using only
    the factors selected by proj_mask [L, F] / imu_mask [F-1]."""
    proj = projection_blocks(state, obs, focal)
    valid = proj.valid & proj_mask
    sw, _ = _cauchy_weights(proj.r, valid)
    r_p = proj.r * sw[..., None]
    proj = proj._replace(J=proj.J * sw[..., None, None], valid=valid)
    J_dense, J_lam = densify_projection(proj, obs, layout)

    imu = imu_blocks(state, pres, gravity, max_imu_dt)
    im = (imu.valid & imu_mask)[:, None].astype(r_p.dtype)
    r_imu = imu.r * im
    J_imu = densify_imu(imu._replace(J=imu.J * im[..., None]), layout)

    r_prior = prior_residual(prior, state, layout)
    J_prior = jnp.where(prior.valid, prior.J, jnp.zeros_like(prior.J))

    H_xx = (
        _psum(jnp.einsum("lfrd,lfre->de", J_dense, J_dense), axis_name)
        + jnp.einsum("kmd,kme->de", J_imu, J_imu)
        + J_prior.T @ J_prior
    )
    b_x = -(
        _psum(jnp.einsum("lfrd,lfr->d", J_dense, r_p), axis_name)
        + jnp.einsum("kmd,km->d", J_imu, r_imu)
        + J_prior.T @ r_prior
    )
    H_xl = jnp.einsum("lfrd,lfr->dl", J_dense, J_lam)
    H_ll = jnp.einsum("lfr,lfr->l", J_lam, J_lam)
    b_l = -jnp.einsum("lfr,lfr->l", J_lam, r_p)
    return H_xx, b_x, H_xl, H_ll, b_l


def marginalize_old(
    state: WindowState,
    obs: FeatureObs,
    pres: Preintegration,
    prior: Prior,
    gravity: jax.Array,
    layout: Layout,
    focal: float = 460.0,
    max_imu_dt: float = 10.0,
    eig_eps: float = 1e-8,
    axis_name: str | None = None,
) -> Prior:
    """Marginalize frame 0 (and its anchored landmarks) into a new prior in
    the *slid* window layout.

    Only factors touching dropped variables contribute (marginalization_
    factor.cpp drop_set semantics): the previous prior, IMU factor 0→1, and
    projection factors anchored at frame 0."""
    F = layout.F
    dt = state.p.dtype

    anchored0 = obs.anchor == 0  # landmarks to drop
    proj_mask = anchored0[:, None] & jnp.ones((1, F), bool)
    imu_mask = jnp.arange(F - 1) == 0

    H_xx, b_x, H_xl, H_ll, b_l = _assemble_full(
        state, obs, pres, prior, gravity, layout, focal, max_imu_dt,
        proj_mask, imu_mask, axis_name,
    )

    # --- step 1: eliminate the (diagonal) landmark block -------------------
    inv_ll = jnp.where(H_ll > 1e-10, 1.0 / (H_ll + 1e-12), 0.0)
    H1 = H_xx - _psum((H_xl * inv_ll[None, :]) @ H_xl.T, axis_name)
    b1 = b_x - _psum(H_xl @ (inv_ll * b_l), axis_name)

    # --- step 2: eliminate pose0 (cols 0:6) + sb0 (cols 6F:6F+9) -----------
    m_idx = jnp.concatenate([jnp.arange(6), 6 * F + jnp.arange(9)])
    keep_mask = jnp.ones((layout.dim_x,), bool).at[m_idx].set(False)
    k_idx = jnp.where(keep_mask, size=layout.dim_x - 15)[0]

    Amm = H1[jnp.ix_(m_idx, m_idx)]
    Amr = H1[jnp.ix_(m_idx, k_idx)]
    Arr = H1[jnp.ix_(k_idx, k_idx)]
    bm = b1[m_idx]
    br = b1[k_idx]
    # eigendecomposition inverse with threshold (marginalization_factor.cpp:267-281)
    S, V = jnp.linalg.eigh(Amm)
    Sinv = jnp.where(S > eig_eps, 1.0 / S, 0.0)
    Amm_inv = (V * Sinv[None, :]) @ V.T
    H_marg = Arr - Amr.T @ Amm_inv @ Amr
    b_marg = br - Amr.T @ (Amm_inv @ bm)

    # note the reference convention: it factors (H, b) with b = +Jᵀr; ours is
    # b = -Jᵀr, so negate to get the residual direction right.
    J_k, r0_k = _eig_sqrt_factor(H_marg, -b_marg, eig_eps)

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
    H = prior.J.T @ prior.J
    b = -(prior.J.T @ prior.r0)  # our b convention

    m_idx = 6 * (F - 2) + jnp.arange(6)
    keep_mask = jnp.ones((layout.dim_x,), bool).at[m_idx].set(False)
    k_idx = jnp.where(keep_mask, size=layout.dim_x - 6)[0]

    Amm = H[jnp.ix_(m_idx, m_idx)]
    Amr = H[jnp.ix_(m_idx, k_idx)]
    Arr = H[jnp.ix_(k_idx, k_idx)]
    S, V = jnp.linalg.eigh(Amm)
    Sinv = jnp.where(S > 1e-8, 1.0 / S, 0.0)
    Amm_inv = (V * Sinv[None, :]) @ V.T
    H_marg = Arr - Amr.T @ Amm_inv @ Amr
    b_marg = b[k_idx] - Amr.T @ (Amm_inv @ b[m_idx])

    J_k, r0_k = _eig_sqrt_factor(H_marg, -b_marg, 1e-8)

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
