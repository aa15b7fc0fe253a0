"""Batched camera models (pinhole+radtan, MEI, Kannala-Brandt, Scaramuzza).

TPU-native re-expression of the camodocal camera library used by the
reference (camera_model/include/camodocal/camera_models/Camera.h:16-22,
PinholeCamera.cc:489-542, CataCamera.cc:556-640, EquidistantCamera.cc:428-,
ScaramuzzaCamera.cc:598-653).  Each model is a NamedTuple pytree whose fields
may carry leading batch dimensions; ``project`` (3D camera-frame point →
pixel) and ``lift`` (pixel → normalized projective ray) broadcast over any
number of point batch dims.  All inverse-distortion solves use a *fixed*
iteration count so everything stays jit/scan friendly (the reference also
uses 8 fixed-point iterations).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class PinholeCamera(NamedTuple):
    """fx, fy, cx, cy + radial-tangential k1,k2,p1,p2 (PinholeCamera.cc)."""

    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    k1: jax.Array
    k2: jax.Array
    p1: jax.Array
    p2: jax.Array

    @staticmethod
    def create(fx, fy, cx, cy, k1=0.0, k2=0.0, p1=0.0, p2=0.0, dtype=jnp.float32):
        return PinholeCamera(*[jnp.asarray(v, dtype=dtype) for v in (fx, fy, cx, cy, k1, k2, p1, p2)])

    def _distort(self, x, y):
        r2 = x * x + y * y
        rad = self.k1 * r2 + self.k2 * r2 * r2
        dx = x * rad + 2.0 * self.p1 * x * y + self.p2 * (r2 + 2.0 * x * x)
        dy = y * rad + self.p1 * (r2 + 2.0 * y * y) + 2.0 * self.p2 * x * y
        return dx, dy

    def project(self, P):
        """Camera-frame 3D point(s) [..., 3] → pixel [..., 2]."""
        x = P[..., 0] / P[..., 2]
        y = P[..., 1] / P[..., 2]
        dx, dy = self._distort(x, y)
        return jnp.stack(
            [self.fx * (x + dx) + self.cx, self.fy * (y + dy) + self.cy], axis=-1
        )

    def lift(self, uv, iters: int = 8):
        """Pixel [..., 2] → normalized plane ray [..., 3] (z = 1).

        Inverse distortion by `iters` fixed-point steps
        (PinholeCamera.cc:489-505 uses n=8).
        """
        mx_d = (uv[..., 0] - self.cx) / self.fx
        my_d = (uv[..., 1] - self.cy) / self.fy
        mx_u, my_u = mx_d, my_d
        for _ in range(iters):
            dx, dy = self._distort(mx_u, my_u)
            mx_u = mx_d - dx
            my_u = my_d - dy
        return jnp.stack([mx_u, my_u, jnp.ones_like(mx_u)], axis=-1)


class MeiCamera(NamedTuple):
    """Unified-sphere (MEI) model: xi + pinhole/radtan (CataCamera.cc)."""

    xi: jax.Array
    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    k1: jax.Array
    k2: jax.Array
    p1: jax.Array
    p2: jax.Array

    @staticmethod
    def create(xi, fx, fy, cx, cy, k1=0.0, k2=0.0, p1=0.0, p2=0.0, dtype=jnp.float32):
        return MeiCamera(*[jnp.asarray(v, dtype=dtype) for v in (xi, fx, fy, cx, cy, k1, k2, p1, p2)])

    def _distort(self, x, y):
        r2 = x * x + y * y
        rad = self.k1 * r2 + self.k2 * r2 * r2
        dx = x * rad + 2.0 * self.p1 * x * y + self.p2 * (r2 + 2.0 * x * x)
        dy = y * rad + self.p1 * (r2 + 2.0 * y * y) + 2.0 * self.p2 * x * y
        return dx, dy

    def project(self, P):
        """CataCamera.cc spaceToPlane: sphere projection + radtan + K."""
        z = P[..., 2] + self.xi * jnp.linalg.norm(P, axis=-1)
        x = P[..., 0] / z
        y = P[..., 1] / z
        dx, dy = self._distort(x, y)
        return jnp.stack(
            [self.fx * (x + dx) + self.cx, self.fy * (y + dy) + self.cy], axis=-1
        )

    def lift(self, uv, iters: int = 8):
        """Pixel → projective ray through unit sphere (CataCamera.cc:556-640)."""
        mx_d = (uv[..., 0] - self.cx) / self.fx
        my_d = (uv[..., 1] - self.cy) / self.fy
        mx_u, my_u = mx_d, my_d
        for _ in range(iters):
            dx, dy = self._distort(mx_u, my_u)
            mx_u = mx_d - dx
            my_u = my_d - dy
        rho2 = mx_u * mx_u + my_u * my_u
        xi = self.xi
        lam = (xi + jnp.sqrt(1.0 + (1.0 - xi * xi) * rho2)) / (1.0 + rho2)
        P = jnp.stack([lam * mx_u, lam * my_u, lam - xi], axis=-1)
        # normalize to z=1 plane (reference returns the sphere ray; downstream
        # always divides by z — we return z=1 directly for consistency)
        return P / P[..., 2:3]


class EquidistantCamera(NamedTuple):
    """Kannala-Brandt θ-polynomial fisheye (EquidistantCamera.cc).

    r(θ) = θ + k2 θ³ + k3 θ⁵ + k4 θ⁷ + k5 θ⁹ (reference naming).
    """

    k2: jax.Array
    k3: jax.Array
    k4: jax.Array
    k5: jax.Array
    mu: jax.Array
    mv: jax.Array
    u0: jax.Array
    v0: jax.Array

    @staticmethod
    def create(k2, k3, k4, k5, mu, mv, u0, v0, dtype=jnp.float32):
        return EquidistantCamera(*[jnp.asarray(v, dtype=dtype) for v in (k2, k3, k4, k5, mu, mv, u0, v0)])

    def _r(self, theta):
        t2 = theta * theta
        return theta * (1.0 + t2 * (self.k2 + t2 * (self.k3 + t2 * (self.k4 + t2 * self.k5))))

    def _r_prime(self, theta):
        t2 = theta * theta
        return 1.0 + t2 * (3.0 * self.k2 + t2 * (5.0 * self.k3 + t2 * (7.0 * self.k4 + t2 * 9.0 * self.k5)))

    def project(self, P):
        theta = jnp.arccos(jnp.clip(P[..., 2] / jnp.linalg.norm(P, axis=-1), -1.0, 1.0))
        phi = jnp.arctan2(P[..., 1], P[..., 0])
        r = self._r(theta)
        return jnp.stack(
            [self.mu * r * jnp.cos(phi) + self.u0, self.mv * r * jnp.sin(phi) + self.v0],
            axis=-1,
        )

    def lift(self, uv, iters: int = 10):
        """Invert r(θ) by Newton iteration (the reference solves the same
        polynomial via a companion-matrix eigen solve,
        EquidistantCamera.cc:716-; fixed-count Newton is XLA-friendly and
        converges to machine precision for |θ| < π/2 fisheye ranges)."""
        x = (uv[..., 0] - self.u0) / self.mu
        y = (uv[..., 1] - self.v0) / self.mv
        theta_d = jnp.sqrt(x * x + y * y)
        phi = jnp.arctan2(y, x)
        theta = theta_d
        for _ in range(iters):
            f = self._r(theta) - theta_d
            theta = theta - f / jnp.clip(self._r_prime(theta), 1e-6, None)
        st, ct = jnp.sin(theta), jnp.cos(theta)
        P = jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), ct], axis=-1)
        return P / P[..., 2:3]


class ScaramuzzaCamera(NamedTuple):
    """OCAM omnidirectional polynomial model (ScaramuzzaCamera.cc:598-653)."""

    poly: jax.Array  # [..., 5]  cam2world polynomial over rho
    inv_poly: jax.Array  # [..., 20]  world2cam polynomial over theta
    C: jax.Array
    D: jax.Array
    E: jax.Array
    center_x: jax.Array
    center_y: jax.Array

    @staticmethod
    def create(poly, inv_poly, C, D, E, center_x, center_y, dtype=jnp.float32):
        poly = jnp.asarray(poly, dtype=dtype)
        inv_poly = jnp.asarray(inv_poly, dtype=dtype)
        return ScaramuzzaCamera(
            poly, inv_poly,
            *[jnp.asarray(v, dtype=dtype) for v in (C, D, E, center_x, center_y)],
        )

    def project(self, P):
        """spaceToPlane (ScaramuzzaCamera.cc:632-653)."""
        norm = jnp.sqrt(P[..., 0] ** 2 + P[..., 1] ** 2)
        theta = jnp.arctan2(-P[..., 2], norm)
        rho = jnp.polyval(self.inv_poly[..., ::-1].T if self.inv_poly.ndim > 1 else self.inv_poly[::-1], theta)
        inv_norm = 1.0 / jnp.clip(norm, 1e-12, None)
        xn = P[..., 0] * inv_norm * rho
        yn = P[..., 1] * inv_norm * rho
        return jnp.stack(
            [xn * self.C + yn * self.D + self.center_x, xn * self.E + yn + self.center_y],
            axis=-1,
        )

    def lift(self, uv):
        """liftProjective (ScaramuzzaCamera.cc:598-622)."""
        xc0 = uv[..., 0] - self.center_x
        xc1 = uv[..., 1] - self.center_y
        inv_scale = 1.0 / (self.C - self.D * self.E)
        xa = inv_scale * (xc0 - self.D * xc1)
        ya = inv_scale * (-self.E * xc0 + self.C * xc1)
        phi = jnp.sqrt(xa * xa + ya * ya)
        z = jnp.polyval(self.poly[..., ::-1].T if self.poly.ndim > 1 else self.poly[::-1], phi)
        P = jnp.stack([xc0, xc1, -z], axis=-1)
        return P / P[..., 2:3]


def camera_from_yaml(cfg: dict, dtype=jnp.float32):
    """Build a camera model from a camodocal-style yaml dict
    (CameraFactory.cc: key ``model_type`` ∈ PINHOLE | MEI | KANNALA_BRANDT |
    scaramuzza).  `cfg` is the parsed yaml mapping."""
    mt = str(cfg.get("model_type", "PINHOLE")).upper()
    if mt == "PINHOLE":
        d = cfg["distortion_parameters"]
        p = cfg["projection_parameters"]
        return PinholeCamera.create(
            p["fx"], p["fy"], p["cx"], p["cy"],
            d.get("k1", 0.0), d.get("k2", 0.0), d.get("p1", 0.0), d.get("p2", 0.0),
            dtype=dtype,
        )
    if mt == "MEI":
        d = cfg["distortion_parameters"]
        p = cfg["projection_parameters"]
        return MeiCamera.create(
            cfg["mirror_parameters"]["xi"],
            p["gamma1"], p["gamma2"], p["u0"], p["v0"],
            d.get("k1", 0.0), d.get("k2", 0.0), d.get("p1", 0.0), d.get("p2", 0.0),
            dtype=dtype,
        )
    if mt == "KANNALA_BRANDT":
        p = cfg["projection_parameters"]
        return EquidistantCamera.create(
            p["k2"], p["k3"], p["k4"], p["k5"], p["mu"], p["mv"], p["u0"], p["v0"],
            dtype=dtype,
        )
    if mt == "SCARAMUZZA":
        p = cfg["poly_parameters"]
        ip = cfg["inv_poly_parameters"]
        a = cfg["affine_parameters"]
        poly = [p[f"p{i}"] for i in range(5)]
        inv_poly = [ip[f"p{i}"] for i in range(20)]
        return ScaramuzzaCamera.create(
            poly, inv_poly, a["ac"], a["ad"], a["ae"], a["cx"], a["cy"], dtype=dtype
        )
    raise ValueError(f"unknown camera model_type: {mt}")
