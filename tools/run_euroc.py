#!/usr/bin/env python
"""Replay a EuRoC sequence through the full pipeline — the TPU-native
equivalent of `roslaunch vins_estimator euroc.launch` + rosbag play
(README.md:66-89).

Usage:
  python tools/run_euroc.py <dataset_root> --config config/euroc.yaml \
      [--out out_dir] [--no-loop] [--max-frames N]

Writes vins_result_no_loop.tum and vins_result_loop.tum (the reference's
vins_result_no_loop.csv / vins_result_loop.csv outputs,
vins_estimator/src/parameters.cpp:61, pose_graph_node.cpp:506).
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

# TPU dot/conv ops default to bf16-input passes.  The measured precision
# ladder (RESULTS.md) shows the front-end image path (pyramid/gradient
# convolutions feeding KLT) is precision-sensitive in a texture-correlated
# way: solver-scoped f32 alone still diverges (3-23 m ATE on the 30 s
# proxy) while global true-f32 dots give 0.24 m.  Real-data runs must
# therefore force it globally, exactly like run_proxy.py and bench.py.
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def load_image(path):
    """Minimal grayscale PNG/PGM loader (no cv2 in this environment)."""
    if path.endswith((".pgm", ".PGM")):
        with open(path, "rb") as f:
            assert f.readline().strip() == b"P5"
            line = f.readline()
            while line.startswith(b"#"):
                line = f.readline()
            w, h = map(int, line.split())
            maxv = int(f.readline())
            img = np.frombuffer(f.read(w * h), np.uint8).reshape(h, w)
        return img.astype(np.float32)
    try:
        from PIL import Image  # pragma: no cover

        return np.asarray(Image.open(path).convert("L"), np.float32)
    except ImportError:
        pass
    from vins_tpu.io.png import read_png_gray  # native/py fallback decoder

    return read_png_gray(path).astype(np.float32)


def replay(root, cfg, cam, loop: bool = True, max_frames: int = 0,
           progress_every: int = 100, pipe=None):
    """Replay a EuRoC-format directory through the full pipeline: native
    PNG decode (prefetch thread) → native measurement queue → frontend →
    estimator → pose graph.  Returns the Pipeline (trajectories populated).
    Importable — tests/test_euroc_replay.py drives this exact chain on a
    synthetic EuRoC-format dataset (sim/euroc_writer.py)."""
    from vins_tpu.io.euroc import load_cam_index, load_imu
    from vins_tpu.pipeline import Pipeline

    if pipe is None:
        pipe = Pipeline(cfg, cam, loop_closure=loop)

    imu = load_imu(root)
    cidx = load_cam_index(root)

    # Measurement alignment runs through the native C++ queue
    # (native/measurement_queue.cc — the reference's estimator_node buffer
    # runtime) fed by a producer thread, while a second thread prefetches
    # and decodes images ahead of the estimator.
    import queue as pyqueue
    import threading

    from vins_tpu.io.mq import MeasurementQueue

    mq = MeasurementQueue()
    imgq = pyqueue.Queue(maxsize=8)

    def produce():
        ki = 0
        for k in range(len(imu.t)):
            mq.push_imu(imu.t[k], imu.acc[k], imu.gyr[k])
            while ki < len(cidx.t) and cidx.t[ki] + cfg.td <= imu.t[k]:
                mq.push_feature(cidx.t[ki], payload=ki)
                ki += 1
        mq.close()

    def prefetch():
        for path in cidx.paths:
            imgq.put(load_image(path))
        imgq.put(None)

    threading.Thread(target=produce, daemon=True).start()
    threading.Thread(target=prefetch, daemon=True).start()

    n = 0
    img_i = 0
    t0 = time.perf_counter()
    while True:
        m = mq.next(td=cfg.td)
        if m is None:
            break
        for k in range(len(m.imu_t)):
            pipe.process_imu(m.imu_t[k], m.imu_acc[k], m.imu_gyr[k])
        # the prefetch stream is index-aligned with cam frames; skip decoded
        # images for frames the aligner dropped
        while img_i < m.payload:
            imgq.get()
            img_i += 1
        img = imgq.get()
        img_i += 1
        out = pipe.process_image(img, m.t_img)
        n += 1
        if progress_every and n % progress_every == 0:
            fps = n / (time.perf_counter() - t0)
            print(f"frame {n}  {fps:.1f} fps  {out.get('kind','')}", flush=True)
        if max_frames and n >= max_frames:
            break
    pipe.pg_join()
    pipe.shutdown()
    return pipe


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("--config", default="config/euroc.yaml")
    ap.add_argument("--out", default=".")
    ap.add_argument("--no-loop", action="store_true")
    ap.add_argument("--max-frames", type=int, default=0)
    args = ap.parse_args()

    import jax.numpy as jnp

    from vins_tpu.config import load_config
    from vins_tpu.core.cameras import camera_from_yaml

    cfg = load_config(args.config)
    # real-data runs keep the loop stage off the frame critical path (the
    # reference's separate pose_graph process); sync mode remains available
    # for deterministic tests via the Pipeline constructor
    import dataclasses

    cfg = dataclasses.replace(cfg, pg_async=True, overlap=True)
    cam = camera_from_yaml(cfg.camera, dtype=jnp.float32)
    pipe = replay(args.root, cfg, cam, loop=not args.no_loop,
                  max_frames=args.max_frames)

    os.makedirs(args.out, exist_ok=True)
    pipe.write_trajectories(
        os.path.join(args.out, "vins_result_no_loop.tum"),
        os.path.join(args.out, "vins_result_loop.tum"),
    )
    print(f"done: {len(pipe.trajectory)} poses")


if __name__ == "__main__":
    main()
