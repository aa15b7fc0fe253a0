"""Intrinsic camera calibration: Zhang init + batched GN refinement.

TPU-native re-expression of the reference's offline calibration pipeline
(camera_model/src/calib/CameraCalibration.cc + intrinsic_calib.cc: per-model
initial intrinsics from chessboard homographies, then Ceres autodiff
refinement via CostFunctionFactory.cc).  Here: batched DLT homographies +
Zhang's closed-form absolute-conic solve for the initial K, then one jitted
Gauss-Newton over [intrinsics | per-view extrinsics] with all views and
corners as fixed-shape masked tensors.

Supported models mirror CameraFactory.cc: PINHOLE (radtan),
KANNALA_BRANDT (equidistant θ-polynomial), MEI (unified sphere + radtan,
CataCamera.cc) and SCARAMUZZA (OCAM inverse polynomial,
ScaramuzzaCamera.cc) — the same four the reference's CostFunctionFactory.cc
builds Ceres costs for.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie
from ..core.linalg import inv3x3, spd_solve


# --------------------------------------------------------------------- DLT

def homography_dlt(obj: jax.Array, img: jax.Array, valid: jax.Array) -> jax.Array:
    """Plane→image homography by masked DLT (obj [N,2] board coords, img
    [N,2] pixels).  Hartley-normalized for conditioning; returns H [3,3]
    with H[2,2] = 1."""
    dt = obj.dtype
    w = valid.astype(dt)
    nw = jnp.maximum(jnp.sum(w), 1.0)

    def normalizer(x):
        mu = jnp.sum(x * w[:, None], 0) / nw
        d = jnp.sqrt(jnp.sum((x - mu) ** 2, -1)) * w
        s = jnp.sqrt(2.0) / jnp.maximum(jnp.sum(d) / nw, 1e-12)
        T = jnp.asarray([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]], dt)
        T = T.at[0, 0].set(s).at[1, 1].set(s).at[0, 2].set(-s * mu[0]).at[1, 2].set(-s * mu[1])
        return (x - mu) * s, T

    o, To = normalizer(obj)
    i, Ti = normalizer(img)

    z = jnp.zeros_like(o[:, 0])
    one = jnp.ones_like(z)
    r1 = jnp.stack([o[:, 0], o[:, 1], one, z, z, z,
                    -i[:, 0] * o[:, 0], -i[:, 0] * o[:, 1], -i[:, 0]], -1)
    r2 = jnp.stack([z, z, z, o[:, 0], o[:, 1], one,
                    -i[:, 1] * o[:, 0], -i[:, 1] * o[:, 1], -i[:, 1]], -1)
    A = jnp.concatenate([r1 * w[:, None], r2 * w[:, None]], 0)  # [2N,9]
    _, V = jnp.linalg.eigh(A.T @ A)
    h = V[:, 0]
    Hn = h.reshape(3, 3)
    H = inv3x3(Ti) @ (Hn @ To)  # 3x3: closed form (no f64 LU on TPU)
    return H / H[2, 2]


def zhang_intrinsics(Hs: jax.Array, view_valid: jax.Array) -> jax.Array:
    """Closed-form K from ≥3 homographies (Zhang 2000): constraints on the
    image of the absolute conic B = K⁻ᵀK⁻¹.  Returns [fx, fy, cx, cy]
    (zero-skew solve).  Hs: [V,3,3]."""
    dt = Hs.dtype

    def v_ij(H, a, b):
        return jnp.stack([
            H[0, a] * H[0, b],
            H[0, a] * H[1, b] + H[1, a] * H[0, b],
            H[1, a] * H[1, b],
            H[2, a] * H[0, b] + H[0, a] * H[2, b],
            H[2, a] * H[1, b] + H[1, a] * H[2, b],
            H[2, a] * H[2, b],
        ])

    def rows(H):
        return jnp.stack([v_ij(H, 0, 1), v_ij(H, 0, 0) - v_ij(H, 1, 1)])

    A = jax.vmap(rows)(Hs)  # [V,2,6]
    A = A * view_valid[:, None, None].astype(dt)
    A = A.reshape(-1, 6)
    _, V = jnp.linalg.eigh(A.T @ A)
    b = V[:, 0]
    B11, B12, B22, B13, B23, B33 = b
    # zero-skew closed form (Zhang §3.1, s=0 ⇒ B12≈0 but solve generally)
    cy = (B12 * B13 - B11 * B23) / (B11 * B22 - B12 * B12)
    lam = B33 - (B13 * B13 + cy * (B12 * B13 - B11 * B23)) / B11
    fx = jnp.sqrt(jnp.abs(lam / B11))
    fy = jnp.sqrt(jnp.abs(lam * B11 / (B11 * B22 - B12 * B12)))
    cx = -B13 * fx * fx / lam
    return jnp.stack([fx, fy, cx, cy])


def extrinsics_from_h(H: jax.Array, K: jax.Array):
    """Per-view board pose from its homography: H = K [r1 r2 t]."""
    dt = H.dtype
    Km = jnp.asarray([[K[0], 0, K[2]], [0, K[1], K[3]], [0, 0, 1.0]], dt)
    M = inv3x3(Km) @ H  # 3x3: closed form (no f64 LU on TPU)
    s = 1.0 / jnp.maximum(jnp.linalg.norm(M[:, 0]), 1e-12)
    # cheirality: board in front of camera
    s = s * jnp.sign(M[2, 2])
    r1 = M[:, 0] * s
    r2 = M[:, 1] * s
    t = M[:, 2] * s
    r3 = jnp.cross(r1, r2)
    R = jnp.stack([r1, r2, r3], 1)
    # project to SO(3)
    U, _, Vt = jnp.linalg.svd(R)
    R = U @ jnp.diag(jnp.asarray([1.0, 1.0, jnp.linalg.det(U @ Vt)], dt)) @ Vt
    return R, t


# ----------------------------------------------------------------- models

def project_pinhole(params: jax.Array, Pc: jax.Array) -> jax.Array:
    """[fx,fy,cx,cy,k1,k2,p1,p2] radtan projection (PinholeCamera.cc
    spaceToPlane + distortion, :519-542)."""
    fx, fy, cx, cy, k1, k2, p1, p2 = params
    xy = Pc[..., :2] / Pc[..., 2:3]
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    rad = 1.0 + k1 * r2 + k2 * r2 * r2
    xd = x * rad + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * rad + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    return jnp.stack([fx * xd + cx, fy * yd + cy], -1)


def project_kb(params: jax.Array, Pc: jax.Array) -> jax.Array:
    """[mu,mv,u0,v0,k2,k3,k4,k5] Kannala-Brandt θ-polynomial projection
    (EquidistantCamera.cc spaceToPlane)."""
    mu, mv, u0, v0, k2, k3, k4, k5 = params
    r_xy = jnp.linalg.norm(Pc[..., :2], axis=-1)
    theta = jnp.arctan2(r_xy, Pc[..., 2])
    t2 = theta * theta
    d = theta * (1.0 + t2 * (k2 + t2 * (k3 + t2 * (k4 + t2 * k5))))
    scale = d / jnp.maximum(r_xy, 1e-12)
    return jnp.stack([
        mu * Pc[..., 0] * scale + u0,
        mv * Pc[..., 1] * scale + v0,
    ], -1)


def project_mei(params: jax.Array, Pc: jax.Array) -> jax.Array:
    """[xi,gamma1,gamma2,u0,v0,k1,k2,p1,p2] unified-sphere projection
    (CataCamera.cc spaceToPlane): z' = z + ξ·|P|, radtan, then gamma."""
    xi, fx, fy, cx, cy, k1, k2, p1, p2 = params
    z = Pc[..., 2] + xi * jnp.linalg.norm(Pc, axis=-1)
    x = Pc[..., 0] / z
    y = Pc[..., 1] / z
    r2 = x * x + y * y
    rad = k1 * r2 + k2 * r2 * r2
    dx = x * rad + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    dy = y * rad + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    return jnp.stack([fx * (x + dx) + cx, fy * (y + dy) + cy], -1)


def project_scaramuzza(params: jax.Array, Pc: jax.Array) -> jax.Array:
    """[C,D,E,cx,cy,i0..i7] OCAM world→image (ScaramuzzaCamera.cc:632-653):
    ρ = inv_poly(θ) with θ = atan2(−z, ‖xy‖), then the affine warp."""
    C, D, E, cx, cy = params[:5]
    inv_poly = params[5:]
    norm = jnp.sqrt(Pc[..., 0] ** 2 + Pc[..., 1] ** 2)
    theta = jnp.arctan2(-Pc[..., 2], norm)
    rho = jnp.polyval(inv_poly[::-1], theta)
    inv_norm = 1.0 / jnp.clip(norm, 1e-12, None)
    xn = Pc[..., 0] * inv_norm * rho
    yn = Pc[..., 1] * inv_norm * rho
    return jnp.stack([xn * C + yn * D + cx, xn * E + yn + cy], -1)


SCARA_POLY_DEG = 5  # inverse-polynomial coefficients fitted in calibration
_PROJECT = {"PINHOLE": project_pinhole, "KANNALA_BRANDT": project_kb,
            "MEI": project_mei, "SCARAMUZZA": project_scaramuzza}
_N_INTR = {"PINHOLE": 8, "KANNALA_BRANDT": 8, "MEI": 9,
           "SCARAMUZZA": 5 + SCARA_POLY_DEG}


class CalibResult(NamedTuple):
    intrinsics: jax.Array  # [n_intr(model)]
    rvecs: jax.Array  # [V,4] board→camera quaternions
    tvecs: jax.Array  # [V,3]
    rms: jax.Array  # [] reprojection RMS (pixels)
    per_view_rms: jax.Array  # [V]


@functools.partial(jax.jit, static_argnames=("model", "iters"))
def refine_calibration(
    intr0: jax.Array,  # [8] initial intrinsics
    q0: jax.Array,  # [V,4] initial board rotations (cam←board)
    t0: jax.Array,  # [V,3]
    obj: jax.Array,  # [V,N,2] board-plane coordinates
    img: jax.Array,  # [V,N,2] detected pixels
    valid: jax.Array,  # [V,N]
    view_valid: jax.Array,  # [V]
    model: str = "PINHOLE",
    iters: int = 15,
) -> CalibResult:
    """Joint GN over intrinsics + per-view extrinsics (the reference's Ceres
    problem in CameraCalibration.cc optimize()), LM-damped, fixed iterations."""
    proj = _PROJECT[model]
    n_intr = _N_INTR[model]
    V, N, _ = obj.shape
    dt = obj.dtype
    w = (valid & view_valid[:, None]).astype(dt)
    nobs = jnp.maximum(jnp.sum(w), 1.0)
    dim = n_intr + 6 * V

    def residuals(x):
        intr = x[:n_intr]
        ext = x[n_intr:].reshape(V, 6)

        def per_view(e, qv, tv, o):
            qq = lie.qmul(qv, lie.deltaQ(e[:3]))
            tt = tv + e[3:]
            Pb = jnp.concatenate([o, jnp.zeros((N, 1), dt)], -1)
            Pc = jax.vmap(lambda X: lie.qrotate(qq, X))(Pb) + tt
            return proj(intr, Pc)

        pred = jax.vmap(per_view)(ext, q0, t0, obj)
        return ((pred - img) * w[..., None]).reshape(-1)

    def gn_step(carry, _):
        x, mu, cost = carry
        # only the extrinsic increments are reset each step; intrinsics live
        # in x directly
        r = residuals(x)
        J = jax.jacfwd(residuals)(x)
        H = J.T @ J
        g = J.T @ r
        Hd = H + mu * jnp.diag(jnp.diagonal(H)) + 1e-9 * jnp.eye(dim, dtype=dt)
        dx = -spd_solve(Hd, g)
        x_new = apply_step(x, dx)
        c_new = jnp.sum(residuals(x_new) ** 2)
        ok = c_new < cost
        x = jax.tree.map(lambda a, b: jnp.where(ok, b, a), x, x_new)
        return (x, jnp.where(ok, mu * 0.3, mu * 10.0), jnp.minimum(c_new, cost)), None

    def apply_step(x, dx):
        # fold the extrinsic tangent step into (q0, t0)-relative coords:
        # since residuals re-applies deltaQ(e) each eval, e accumulates
        # additively to first order — adequate within the LM loop because
        # steps stay small; the final pose is composed below.
        return x + dx

    x0 = jnp.concatenate([intr0, jnp.zeros((V * 6,), dt)])
    c0 = jnp.sum(residuals(x0) ** 2)
    (x, _, cost), _ = jax.lax.scan(gn_step, (x0, jnp.asarray(1e-3, dt), c0), None, length=iters)

    intr = x[:n_intr]
    ext = x[n_intr:].reshape(V, 6)
    q = jax.vmap(lambda qv, e: lie.qnormalize(lie.qmul(qv, lie.deltaQ(e[:3]))))(q0, ext)
    t = t0 + ext[:, 3:]

    def per_view_err(e, qv, tv, o, im, wv):
        qq = lie.qmul(qv, lie.deltaQ(e[:3]))
        Pb = jnp.concatenate([o, jnp.zeros((N, 1), dt)], -1)
        Pc = jax.vmap(lambda X: lie.qrotate(qq, X))(Pb) + (tv + e[3:])
        err = jnp.sum((proj(intr, Pc) - im) ** 2, -1) * wv
        return err

    errs = jax.vmap(per_view_err)(ext, q0, t0, obj, img, w)  # [V,N]
    rms = jnp.sqrt(jnp.sum(errs) / nobs)
    pv = jnp.sqrt(jnp.sum(errs, 1) / jnp.maximum(jnp.sum(w, 1), 1.0))
    return CalibResult(intrinsics=intr, rvecs=q, tvecs=t, rms=rms, per_view_rms=pv)


def calibrate(obj, img, valid, model: str = "PINHOLE", iters: int = 15) -> CalibResult:
    """Full pipeline: homographies → Zhang K → per-view extrinsics → GN.

    obj/img: [V,N,2] board coords / pixels, valid: [V,N] (masked fixed
    shapes).  The KANNALA_BRANDT path initializes (mu,mv,u0,v0) from the
    pinhole Zhang solve with zero distortion polynomial — the reference's
    EquidistantCamera::estimateIntrinsics plays the same role."""
    dt = obj.dtype
    V = obj.shape[0]
    view_valid = valid.any(axis=1)
    Hs = jax.vmap(homography_dlt)(obj, img, valid)
    K = zhang_intrinsics(Hs, view_valid)
    Rs, ts = jax.vmap(lambda H: extrinsics_from_h(H, K))(Hs)
    qs = jax.vmap(lie.R2q)(Rs)
    if model == "MEI":
        # ξ₀ = 1: the effective pinhole focal at the center is γ/(1+ξ), so
        # seed γ = 2·f_zhang (CataCamera estimateIntrinsics plays this role)
        intr0 = jnp.concatenate([
            jnp.asarray([1.0], dt), 2.0 * K[:2], K[2:],
            jnp.zeros((4,), dt)])
    elif model == "SCARAMUZZA":
        # linear inverse-polynomial seed (the OCAM-toolbox recipe): with the
        # Zhang extrinsics fixed, ρ(θ) is LINEAR in the coefficients —
        # ρ_obs = ‖uv − center‖, θ from the board pose — one weighted LSQ
        def per_view(qv, tv, o, im):
            N = o.shape[0]
            Pb = jnp.concatenate([o, jnp.zeros((N, 1), dt)], -1)
            Pc = jax.vmap(lambda X: lie.qrotate(qv, X))(Pb) + tv
            theta = jnp.arctan2(-Pc[:, 2],
                                jnp.sqrt(Pc[:, 0] ** 2 + Pc[:, 1] ** 2))
            rho = jnp.linalg.norm(im - K[2:][None], axis=-1)
            return theta, rho

        th, rho = jax.vmap(per_view)(qs, ts, obj, img)  # [V,N] each
        th = th.reshape(-1)
        rho = rho.reshape(-1)
        wv = (valid & view_valid[:, None]).reshape(-1).astype(dt)
        Adm = th[:, None] ** jnp.arange(SCARA_POLY_DEG, dtype=dt)[None]
        Adm = Adm * wv[:, None]
        Hp = Adm.T @ Adm + 1e-9 * jnp.eye(SCARA_POLY_DEG, dtype=dt)
        poly0 = spd_solve(Hp, Adm.T @ (rho * wv))
        intr0 = jnp.concatenate([
            jnp.asarray([1.0, 0.0, 0.0], dt), K[2:], poly0])
    else:
        intr0 = jnp.concatenate([K, jnp.zeros((4,), dt)])
    return refine_calibration(intr0, qs, ts, obj, img, valid, view_valid,
                              model=model, iters=iters)
