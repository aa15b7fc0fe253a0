#!/usr/bin/env python
"""End-to-end synthetic VIO run — the TPU-native analog of replaying the
reference's data_generator against vins_estimator (data_generator_node.cpp,
SURVEY.md §4.3).  Drives the full estimator (window fill → initialization →
steady-state sliding-window VIO) on the closed-form figure-8 trajectory and
reports yaw-aligned ATE RMSE.

Usage: python tools/run_synthetic.py [--frames N] [--pix-noise SIGMA]
                                     [--imu-hz HZ] [--cpu]
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--pix-noise", type=float, default=0.0,
                    help="feature noise sigma on the normalized plane ×460")
    ap.add_argument("--imu-hz", type=float, default=200.0)
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from vins_tpu.config import VinsConfig
    from vins_tpu.estimator.estimator import NON_LINEAR, Estimator
    from vins_tpu.sim.driver import SyntheticDriver, ate_rmse
    from vins_tpu.sim.window import R_IC_FORWARD

    cfg = VinsConfig(max_landmarks=160, g_norm=9.81,
                     extrinsic_R=R_IC_FORWARD, extrinsic_t=(0.06, -0.01, 0.02))
    est = Estimator(cfg, imu_buf_len=64)
    driver = SyntheticDriver(imu_hz=args.imu_hz, frame_hz=10.0, g_norm=9.81)

    t0 = time.perf_counter()
    run = driver.run(est, n_frames=args.frames,
                     pix_noise=args.pix_noise / 460.0)
    wall = time.perf_counter() - t0

    kinds = [e["kind"] for e in run.events]
    err = ate_rmse(run)
    out = {
        "frames": args.frames,
        "initialized": "initialized" in kinds,
        "steady_state": est.solver_flag == NON_LINEAR,
        "ate_rmse_m": round(float(err), 4),
        "wall_s": round(wall, 2),
        "frames_per_s": round(args.frames / wall, 2),
    }
    print(json.dumps(out))
    if not out["initialized"] or err > 0.10:
        sys.exit(1)


if __name__ == "__main__":
    main()
