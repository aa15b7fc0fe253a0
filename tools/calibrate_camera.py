#!/usr/bin/env python
"""Offline intrinsic calibration CLI — the TPU-native counterpart of the
reference's `Calibration` executable (camera_model/src/intrinsic_calib.cc:
glob chessboard images, detect corners, calibrate a chosen model, write a
camera yaml usable by the tracker).

Usage:
  python tools/calibrate_camera.py -i DIR -w 8 -h 5 -s 0.03 \
      [--model PINHOLE|KANNALA_BRANDT] [--camera-name camera] [-o out.yaml]
"""
import argparse
import glob
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-i", "--input", required=True, help="directory of PNG images")
    ap.add_argument("-p", "--prefix", default="", help="image filename prefix filter")
    ap.add_argument("-w", "--cols", type=int, default=8, help="inner corners per row")
    ap.add_argument("--rows", type=int, default=5, help="inner corners per column")
    ap.add_argument("-s", "--square", type=float, default=0.03, help="square size [m]")
    ap.add_argument("--model", default="PINHOLE",
                    choices=["PINHOLE", "KANNALA_BRANDT"])
    ap.add_argument("--camera-name", default="camera")
    ap.add_argument("-o", "--output", default="camera_calib.yaml")
    ap.add_argument("--iters", type=int, default=25)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

    import jax.numpy as jnp
    import numpy as np

    from vins_tpu.calib.chessboard import board_object_points, find_chessboard
    from vins_tpu.calib.intrinsics import calibrate
    from vins_tpu.io.png import read_png_gray

    paths = sorted(glob.glob(os.path.join(args.input, args.prefix + "*.png")))
    if not paths:
        sys.exit(f"no {args.prefix}*.png under {args.input}")

    obj = board_object_points(args.rows, args.cols, args.square)
    objs, imgs, used = [], [], []
    hw = None
    for p in paths:
        img = read_png_gray(p)
        hw = img.shape
        corners, ok = find_chessboard(img.astype(np.float32), args.rows, args.cols)
        if ok:
            objs.append(obj)
            imgs.append(corners)
            used.append(p)
        print(f"  {os.path.basename(p)}: {'ok' if ok else 'no board'}",
              file=sys.stderr)
    if len(used) < 3:
        sys.exit(f"only {len(used)} usable views; need >= 3")

    res = calibrate(jnp.asarray(np.stack(objs)), jnp.asarray(np.stack(imgs)),
                    jnp.ones((len(used), len(obj)), bool),
                    model=args.model, iters=args.iters)
    intr = np.asarray(res.intrinsics, float)

    # camera yaml in the reference's format (readable by config loaders)
    if args.model == "PINHOLE":
        body = (
            f"model_type: PINHOLE\ncamera_name: {args.camera_name}\n"
            f"image_width: {hw[1]}\nimage_height: {hw[0]}\n"
            "distortion_parameters:\n"
            f"   k1: {intr[4]:.10e}\n   k2: {intr[5]:.10e}\n"
            f"   p1: {intr[6]:.10e}\n   p2: {intr[7]:.10e}\n"
            "projection_parameters:\n"
            f"   fx: {intr[0]:.10e}\n   fy: {intr[1]:.10e}\n"
            f"   cx: {intr[2]:.10e}\n   cy: {intr[3]:.10e}\n"
        )
    else:
        body = (
            f"model_type: KANNALA_BRANDT\ncamera_name: {args.camera_name}\n"
            f"image_width: {hw[1]}\nimage_height: {hw[0]}\n"
            "projection_parameters:\n"
            f"   k2: {intr[4]:.10e}\n   k3: {intr[5]:.10e}\n"
            f"   k4: {intr[6]:.10e}\n   k5: {intr[7]:.10e}\n"
            f"   mu: {intr[0]:.10e}\n   mv: {intr[1]:.10e}\n"
            f"   u0: {intr[2]:.10e}\n   v0: {intr[3]:.10e}\n"
        )
    with open(args.output, "w") as f:
        f.write("%YAML:1.0\n---\n" + body)
    print(json.dumps({"views_used": len(used), "rms_px": round(float(res.rms), 4),
                      "output": args.output}))


if __name__ == "__main__":
    main()
