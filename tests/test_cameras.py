import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vins_tpu.core.cameras import (
    EquidistantCamera,
    MeiCamera,
    PinholeCamera,
    ScaramuzzaCamera,
    camera_from_yaml,
)

EUROC = dict(fx=461.6, fy=460.3, cx=363.0, cy=248.1, k1=-2.917e-01, k2=8.228e-02, p1=5.333e-05, p2=-1.578e-04)


def rand_points(key, n=256, z=(0.5, 10.0), spread=0.6):
    k1, k2 = jax.random.split(key)
    zz = jax.random.uniform(k1, (n, 1), minval=z[0], maxval=z[1], dtype=jnp.float64)
    xy = jax.random.uniform(k2, (n, 2), minval=-spread, maxval=spread, dtype=jnp.float64) * zz
    return jnp.concatenate([xy, zz], axis=-1)


def test_pinhole_project_matches_opencv():
    cam = PinholeCamera.create(**EUROC, dtype=jnp.float64)
    P = np.asarray(rand_points(jax.random.PRNGKey(0)))
    uv = np.asarray(cam.project(jnp.asarray(P)))
    K = np.array([[EUROC["fx"], 0, EUROC["cx"]], [0, EUROC["fy"], EUROC["cy"]], [0, 0, 1]])
    dist = np.array([EUROC["k1"], EUROC["k2"], EUROC["p1"], EUROC["p2"]])
    uv_cv, _ = cv2.projectPoints(P, np.zeros(3), np.zeros(3), K, dist)
    np.testing.assert_allclose(uv, uv_cv[:, 0, :], atol=1e-8)


def test_pinhole_lift_roundtrip():
    cam = PinholeCamera.create(**EUROC, dtype=jnp.float64)
    P = rand_points(jax.random.PRNGKey(1), spread=0.5)
    # 8 fixed-point iterations (reference default) converge to ~5e-6 at the
    # image border for EuRoC-strength distortion; more iters tighten this.
    ray = cam.lift(cam.project(P))
    np.testing.assert_allclose(
        np.asarray(ray[..., :2]), np.asarray(P[..., :2] / P[..., 2:]), atol=2e-5
    )
    ray = cam.lift(cam.project(P), iters=20)
    np.testing.assert_allclose(
        np.asarray(ray[..., :2]), np.asarray(P[..., :2] / P[..., 2:]), atol=1e-9
    )


def test_mei_lift_roundtrip():
    cam = MeiCamera.create(xi=1.8, fx=830.0, fy=831.0, cx=370.0, cy=240.0,
                           k1=-0.05, k2=0.01, p1=1e-4, p2=-1e-4, dtype=jnp.float64)
    P = rand_points(jax.random.PRNGKey(2), spread=0.9)
    uv = cam.project(P)
    ray = cam.lift(uv)
    np.testing.assert_allclose(
        np.asarray(ray[..., :2]), np.asarray(P[..., :2] / P[..., 2:]), atol=1e-6
    )


def test_equidistant_project_matches_opencv_fisheye():
    # cv2.fisheye: theta_d = theta(1 + k1 th^2 + k2 th^4 + k3 th^6 + k4 th^8)
    ks = dict(k2=-0.01, k3=0.004, k4=-0.002, k5=0.0005)
    cam = EquidistantCamera.create(mu=460.0, mv=461.0, u0=360.0, v0=240.0, **ks, dtype=jnp.float64)
    P = np.asarray(rand_points(jax.random.PRNGKey(3), spread=1.2))
    uv = np.asarray(cam.project(jnp.asarray(P)))
    K = np.array([[460.0, 0, 360.0], [0, 461.0, 240.0], [0, 0, 1]])
    D = np.array([ks["k2"], ks["k3"], ks["k4"], ks["k5"]])
    uv_cv, _ = cv2.fisheye.projectPoints(P[:, None, :], np.zeros(3), np.zeros(3), K, D)
    np.testing.assert_allclose(uv, uv_cv[:, 0, :], atol=1e-7)


def test_equidistant_lift_roundtrip():
    cam = EquidistantCamera.create(k2=-0.01, k3=0.004, k4=-0.002, k5=0.0005,
                                   mu=460.0, mv=461.0, u0=360.0, v0=240.0, dtype=jnp.float64)
    P = rand_points(jax.random.PRNGKey(4), spread=1.5)
    ray = cam.lift(cam.project(P))
    np.testing.assert_allclose(
        np.asarray(ray[..., :2]), np.asarray(P[..., :2] / P[..., 2:]), atol=1e-7
    )


def test_scaramuzza_roundtrip():
    # A plausible OCAM calibration: poly maps pixel radius rho → -z of the ray,
    # here a parabolic-mirror-like z(rho) = -(f - rho²/(2f)).  The matching
    # inv_poly (theta → rho) is fitted numerically, exactly how OCAM
    # calibrations are produced in practice.
    f = 250.0
    poly = np.array([-f, 0.0, 1.0 / (2 * f), 0.0, 0.0])
    rho = np.linspace(1.0, 1.8 * f, 400)
    z_poly = np.polyval(poly[::-1], rho)  # lift gives ray (rho, 0, -z_poly)
    theta = np.arctan2(z_poly, rho)  # project uses theta = atan2(-Pz, |Pxy|)
    coeff = np.polyfit(theta, rho, 11)
    inv_poly = np.zeros(20)
    inv_poly[:12] = coeff[::-1]
    cam = ScaramuzzaCamera.create(poly, inv_poly, 1.0, 0.0, 0.0, 376.0, 240.0, dtype=jnp.float64)

    P = rand_points(jax.random.PRNGKey(5), spread=0.8)
    ray = cam.lift(cam.project(P))
    np.testing.assert_allclose(
        np.asarray(ray[..., :2] ), np.asarray(P[..., :2] / P[..., 2:]), atol=2e-3
    )


def test_factory_pinhole():
    cfg = {
        "model_type": "PINHOLE",
        "distortion_parameters": {"k1": EUROC["k1"], "k2": EUROC["k2"], "p1": EUROC["p1"], "p2": EUROC["p2"]},
        "projection_parameters": {"fx": EUROC["fx"], "fy": EUROC["fy"], "cx": EUROC["cx"], "cy": EUROC["cy"]},
    }
    cam = camera_from_yaml(cfg, dtype=jnp.float64)
    assert isinstance(cam, PinholeCamera)
    assert np.isclose(float(cam.fx), EUROC["fx"])


def test_batched_camera_params():
    # two cameras with different intrinsics, vmapped
    cams = PinholeCamera.create(
        fx=jnp.asarray([460.0, 500.0]), fy=jnp.asarray([460.0, 500.0]),
        cx=jnp.asarray([320.0, 360.0]), cy=jnp.asarray([240.0, 250.0]),
        k1=jnp.asarray([-0.3, 0.0]), k2=jnp.asarray([0.08, 0.0]),
        p1=jnp.asarray([0.0, 0.0]), p2=jnp.asarray([0.0, 0.0]), dtype=jnp.float64,
    )
    P = rand_points(jax.random.PRNGKey(6), n=8)
    uv = jax.vmap(lambda c: c.project(P))(cams)
    assert uv.shape == (2, 8, 2)
    ray = jax.vmap(lambda c, u: c.lift(u, iters=20))(cams, uv)
    np.testing.assert_allclose(
        np.asarray(ray[..., :2]),
        np.broadcast_to(np.asarray(P[..., :2] / P[..., 2:]), (2, 8, 2)),
        atol=1e-6,
    )
