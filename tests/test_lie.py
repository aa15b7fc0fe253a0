import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as Rsp

from vins_tpu.core import lie


def rand_q(key, n=()):
    q = jax.random.normal(key, n + (4,), dtype=jnp.float64)
    return lie.qnormalize(q)


def test_qmul_matches_scipy():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    q1, q2 = rand_q(k1, (32,)), rand_q(k2, (32,))
    out = lie.qmul(q1, q2)
    # scipy uses [x,y,z,w]
    s1 = Rsp.from_quat(np.roll(np.asarray(q1), -1, axis=-1))
    s2 = Rsp.from_quat(np.roll(np.asarray(q2), -1, axis=-1))
    expect = (s1 * s2).as_quat()  # x,y,z,w
    got = np.roll(np.asarray(out), -1, axis=-1)
    # sign ambiguity
    sign = np.sign(np.sum(expect * got, axis=-1, keepdims=True))
    np.testing.assert_allclose(got * sign, expect, atol=1e-12)


def test_qrotate_matches_matrix():
    key = jax.random.PRNGKey(1)
    q = rand_q(key, (16,))
    v = jax.random.normal(jax.random.PRNGKey(2), (16, 3), dtype=jnp.float64)
    R = lie.q2R(q)
    np.testing.assert_allclose(
        np.asarray(lie.qrotate(q, v)), np.einsum("nij,nj->ni", np.asarray(R), np.asarray(v)),
        atol=1e-12,
    )


def test_q2R_R2q_roundtrip():
    key = jax.random.PRNGKey(3)
    q = rand_q(key, (64,))
    q = jnp.where(q[..., :1] < 0, -q, q)
    q2 = lie.R2q(lie.q2R(q))
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q), atol=1e-9)


def test_R2q_degenerate_angles():
    # 180-degree rotations exercise all four Shepperd branches
    for axis in [(1, 0, 0), (0, 1, 0), (0, 0, 1), (0.577, 0.577, 0.577)]:
        R = Rsp.from_rotvec(np.pi * np.asarray(axis) / np.linalg.norm(axis)).as_matrix()
        q = np.asarray(lie.R2q(jnp.asarray(R)))
        R2 = np.asarray(lie.q2R(jnp.asarray(q)))
        np.testing.assert_allclose(R2, R, atol=1e-9)


def test_exp_log_roundtrip():
    key = jax.random.PRNGKey(4)
    w = jax.random.normal(key, (32, 3), dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(lie.qlog(lie.qexp(w))), np.asarray(w), atol=1e-9)
    # tiny angles
    w = w * 1e-9
    np.testing.assert_allclose(np.asarray(lie.qlog(lie.qexp(w))), np.asarray(w), atol=1e-15)


def test_deltaQ_small_angle():
    d = jnp.asarray([1e-4, -2e-4, 3e-4], dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(lie.deltaQ(d)), np.asarray(lie.qexp(d)), atol=1e-9)


def test_Qleft_Qright():
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    q, p = rand_q(k1), rand_q(k2)
    prod = lie.qmul(q, p)
    np.testing.assert_allclose(np.asarray(lie.Qleft(q) @ p), np.asarray(prod), atol=1e-12)
    np.testing.assert_allclose(np.asarray(lie.Qright(p) @ q), np.asarray(prod), atol=1e-12)


def test_ypr_roundtrip():
    ypr = jnp.asarray([[30.0, 20.0, -40.0], [-120.0, 5.0, 80.0]], dtype=jnp.float64)
    R = lie.ypr2R(ypr)
    np.testing.assert_allclose(np.asarray(lie.R2ypr(R)), np.asarray(ypr), atol=1e-9)
    # matches scipy ZYX euler
    Rs = Rsp.from_euler("ZYX", np.asarray(ypr), degrees=True).as_matrix()
    np.testing.assert_allclose(np.asarray(R), Rs, atol=1e-12)


def test_g2R():
    g = jnp.asarray([0.3, -0.2, 9.7], dtype=jnp.float64)
    R0 = lie.g2R(g)
    out = R0 @ (g / jnp.linalg.norm(g))
    np.testing.assert_allclose(np.asarray(out), [0, 0, 1.0], atol=1e-9)
    assert abs(float(lie.R2ypr(R0)[0])) < 1e-6


def test_skew():
    a = jnp.asarray([1.0, 2.0, 3.0])
    b = jnp.asarray([-2.0, 0.5, 4.0])
    np.testing.assert_allclose(
        np.asarray(lie.skew(a) @ b), np.cross(np.asarray(a), np.asarray(b)), atol=1e-6
    )


def test_normalize_angle():
    a = jnp.asarray([0.0, 190.0, -190.0, 360.0, 725.0])
    out = np.asarray(lie.normalize_angle(a))
    np.testing.assert_allclose(out, [0.0, -170.0, 170.0, 0.0, 5.0], atol=1e-9)
