"""Write a synthetic dataset in EuRoC directory format.

The environment ships no EuRoC bags, so the rosbag-replay chain
(README.md:66-89 → tools/run_euroc.py: native PNG decode → native
measurement queue → pipeline) could never be exercised end-to-end.  This
renders the textured-room proxy into the exact on-disk layout of a EuRoC
sequence:

    <root>/mav0/cam0/data.csv + data/<t_ns>.png      (20 Hz gray PNGs)
    <root>/mav0/imu0/data.csv                        (t_ns, gyro, acc)
    <root>/mav0/state_groundtruth_estimate0/data.csv (t_ns, p, q)

so `run_euroc.replay()` consumes it byte-for-byte like the real dataset.
Sensor generation matches sim/proxy.py's run_proxy (same trajectory, same
noise model, same camera/extrinsics).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..core.precision import highest_matmul_precision
from ..io.png import write_png_gray
from .proxy import BA, BG, EUROC_H, EUROC_W, TIC, euroc_camera
from .render import Room, RoomRenderer
from .synthetic import Trajectory
from .window import R_IC_FORWARD


def write_euroc_dataset(
    root: str,
    duration: float = 3.0,
    period: float = 16.0,
    frame_hz: float = 10.0,
    imu_hz: float = 200.0,
    seed: int = 0,
    imu_noise: bool = True,
    pix_noise: float = 2.0,
    tex_k: int = 96,
) -> dict:
    """Render + write the sequence; returns {n_frames, n_imu, paths...}."""
    rng = np.random.default_rng(seed)
    traj = Trajectory.circuit(radius=4.0, period=period, height=1.0)
    gravity = jnp.asarray([0.0, 0.0, 9.81], jnp.float64)
    cam = euroc_camera()
    renderer = RoomRenderer(
        cam, EUROC_H, EUROC_W,
        room=Room.make(jax.random.PRNGKey(seed + 7), k=tex_k),
        tic=TIC, Ric=np.asarray(R_IC_FORWARD),
    )
    imu_at = highest_matmul_precision(
        jax.jit(lambda t: traj.imu_at(t, gravity)))
    frame_at = highest_matmul_precision(
        jax.jit(lambda t: (traj.pos_fn(t), traj.q(t))))
    noisy = jax.jit(lambda img, key: jnp.clip(
        img + pix_noise * jax.random.normal(key, img.shape, img.dtype),
        0.0, 255.0))
    nkey = jax.random.PRNGKey(seed + 13)

    cam_dir = os.path.join(root, "mav0", "cam0")
    img_dir = os.path.join(cam_dir, "data")
    imu_dir = os.path.join(root, "mav0", "imu0")
    gt_dir = os.path.join(root, "mav0", "state_groundtruth_estimate0")
    for d in (img_dir, imu_dir, gt_dir):
        os.makedirs(d, exist_ok=True)

    t0 = 1.0
    # ---- IMU @ imu_hz with white noise + bias random walk ----------------
    dt_i = 1.0 / imu_hz
    sig_a = 0.02 * np.sqrt(imu_hz) if imu_noise else 0.0
    sig_g = 0.0017 * np.sqrt(imu_hz) if imu_noise else 0.0
    wba = 0.0004 * np.sqrt(dt_i) if imu_noise else 0.0
    wbg = 2e-5 * np.sqrt(dt_i) if imu_noise else 0.0
    ba = BA.copy()
    bg = BG.copy()
    n_imu = int(round(duration * imu_hz)) + 1
    imu_rows = []
    for k in range(n_imu):
        t = t0 + k * dt_i
        a, w = jax.device_get(imu_at(jnp.asarray(t)))
        ba = ba + wba * rng.standard_normal(3)
        bg = bg + wbg * rng.standard_normal(3)
        acc = np.asarray(a) + ba + sig_a * rng.standard_normal(3)
        gyr = np.asarray(w) + bg + sig_g * rng.standard_normal(3)
        imu_rows.append((int(round(t * 1e9)), gyr, acc))
    with open(os.path.join(imu_dir, "data.csv"), "w") as f:
        f.write("#timestamp [ns],w_x,w_y,w_z,a_x,a_y,a_z\n")
        for tn, gyr, acc in imu_rows:
            f.write(f"{tn},{gyr[0]:.9f},{gyr[1]:.9f},{gyr[2]:.9f},"
                    f"{acc[0]:.9f},{acc[1]:.9f},{acc[2]:.9f}\n")

    # ---- frames @ frame_hz ----------------------------------------------
    n_frames = int(round(duration * frame_hz))
    cam_rows, gt_rows = [], []
    for fi in range(n_frames):
        t = t0 + fi / frame_hz
        p, q = jax.device_get(frame_at(jnp.asarray(t)))
        img = renderer.render_device(jnp.asarray(p), jnp.asarray(q))
        if pix_noise > 0:
            img = noisy(img, jax.random.fold_in(nkey, fi))
        tn = int(round(t * 1e9))
        name = f"{tn}.png"
        write_png_gray(os.path.join(img_dir, name),
                       np.clip(jax.device_get(img), 0, 255))
        cam_rows.append((tn, name))
        gt_rows.append((tn, np.asarray(p), np.asarray(q)))
    with open(os.path.join(cam_dir, "data.csv"), "w") as f:
        f.write("#timestamp [ns],filename\n")
        for tn, name in cam_rows:
            f.write(f"{tn},{name}\n")
    with open(os.path.join(gt_dir, "data.csv"), "w") as f:
        f.write("#timestamp,p_x,p_y,p_z,q_w,q_x,q_y,q_z\n")
        for tn, p, q in gt_rows:
            f.write(f"{tn},{p[0]:.9f},{p[1]:.9f},{p[2]:.9f},"
                    f"{q[0]:.9f},{q[1]:.9f},{q[2]:.9f},{q[3]:.9f}\n")

    return {"root": root, "n_frames": n_frames, "n_imu": n_imu}
