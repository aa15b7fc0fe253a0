"""Online camera-IMU extrinsic rotation calibration.

TPU-native re-expression of vins_estimator/src/initial/initial_ex_rotation.cpp
(CalibrationExRotation :11-67): per frame pair, the camera rotation (from the
essential solve) and the IMU rotation (from preintegration) constrain ric via
the quaternion sandwich  q_bk_bk1 ⊗ q_ic = q_ic ⊗ q_ck_ck1.  Stacking
Huber-weighted 4×4 blocks  [Qleft(q_imu) − Qright(q_cam)]  and taking the SVD
null vector recovers q_ic; accepted when the second-smallest singular value
exceeds 0.25 with ≥ window pairs (:52-66).

The pair history is a fixed-size ring buffer so the solve is one static-shape
SVD regardless of how many pairs have arrived.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie


class ExRotBuffer(NamedTuple):
    q_cam: jax.Array  # [N,4] per-pair camera rotation (frame k ← k+1)
    q_imu: jax.Array  # [N,4] per-pair body rotation from preintegration
    used: jax.Array  # [N] bool
    head: jax.Array  # [] int32 next write slot
    ric: jax.Array  # [4] current estimate (identity until calibrated)

    @staticmethod
    def empty(n: int = 64, dtype=jnp.float64) -> "ExRotBuffer":
        qid = jnp.asarray([1.0, 0, 0, 0], dtype)
        return ExRotBuffer(
            q_cam=jnp.tile(qid[None], (n, 1)),
            q_imu=jnp.tile(qid[None], (n, 1)),
            used=jnp.zeros((n,), bool),
            head=jnp.zeros((), jnp.int32),
            ric=qid,
        )


def push_pair(buf: ExRotBuffer, q_cam: jax.Array, q_imu: jax.Array) -> ExRotBuffer:
    i = buf.head % buf.used.shape[0]
    return buf._replace(
        q_cam=buf.q_cam.at[i].set(q_cam),
        q_imu=buf.q_imu.at[i].set(q_imu),
        used=buf.used.at[i].set(True),
        head=buf.head + 1,
    )


def calibrate_ex_rotation(
    buf: ExRotBuffer, min_pairs: int = 10, sv_thresh: float = 0.25
):
    """One calibration solve over the buffered pairs (:37-66).

    Returns (q_ic, ok, buffer-with-updated-ric)."""
    dtype = buf.q_cam.dtype
    n = buf.used.shape[0]

    # Huber weight on the angular disagreement under the current estimate
    # (:37-46): w = 1 if angle < 5°, else 5/angle(deg).
    def pair_weight(qc, qi):
        q_pred = lie.qmul(lie.qconj(buf.ric), lie.qmul(qi, buf.ric))
        e = lie.qmul(lie.qconj(qc), q_pred)
        ang = 2.0 * jnp.arccos(jnp.clip(jnp.abs(e[0]), 0.0, 1.0)) * 180.0 / jnp.pi
        return jnp.where(ang > 5.0, 5.0 / jnp.maximum(ang, 1e-6), 1.0)

    w = jax.vmap(pair_weight)(buf.q_cam, buf.q_imu) * buf.used.astype(dtype)

    # stacked 4N×4 system: w·(Qleft(q_imu) − Qright(q_cam)) · q_ic = 0
    blocks = jax.vmap(
        lambda qc, qi, wi: wi * (lie.Qleft(qi) - lie.Qright(qc))
    )(buf.q_cam, buf.q_imu, w)
    A = blocks.reshape(4 * n, 4)
    U, S, Vt = jnp.linalg.svd(A, full_matrices=False)
    # null vector in [w,x,y,z] (lie.Qleft/Qright use wxyz ordering)
    q = Vt[3]
    q = jnp.where(q[0] >= 0, q, -q)
    q = lie.qnormalize(q)
    ok = (S[2] > sv_thresh) & (jnp.sum(buf.used) >= min_pairs)
    # ric is updated UNCONDITIONALLY (initial_ex_rotation.cpp:55) so the
    # Huber weights sharpen as pairs accumulate; `ok` only gates acceptance.
    return q, ok, buf._replace(ric=q)
