"""Per-substage wall-clock profile on the real device (axon TPU or CPU).

Breaks the bench pipeline's three stage means (frontend / estimator /
pose_graph) into their device programs so optimization targets the right op:
front-end kernels are timed standalone, and PoseGraph.add_keyframe is
wrapped so query / verify / optimize / db-add report separately.

Usage: python tools/profile_stages.py [--frames 80]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from vins_tpu.core.precision import highest_matmul_precision


def timeit(fn, *args, n=20, warm=2, **kw):
    for _ in range(warm):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        # block per call: measure true device latency, not enqueue rate
        jax.block_until_ready(fn(*args, **kw))
    return (time.perf_counter() - t0) / n * 1e3


def profile_frontend_kernels():
    from vins_tpu.frontend.image import clahe
    from vins_tpu.frontend.klt import lk_pyramidal
    from vins_tpu.frontend.detect import detect_grid, shi_tomasi_response
    from vins_tpu.loop.brief import brief_describe, fast_detect, smooth_for_brief

    H, W, M = 480, 752, 150
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (H, W), jnp.float32) * 255.0
    img2 = jnp.roll(img, (1, 2), (0, 1))
    pts = jnp.stack([
        jax.random.uniform(key, (M,), jnp.float32) * (W - 60) + 30,
        jax.random.uniform(jax.random.PRNGKey(1), (M,), jnp.float32) * (H - 60) + 30,
    ], axis=1)
    valid = jnp.ones((M,), bool)

    out = {}
    out["clahe_ms"] = timeit(clahe, img)
    ic = clahe(img)
    out["lk_ms"] = timeit(lk_pyramidal, ic, clahe(img2), pts, valid)
    out["shi_tomasi_ms"] = timeit(shi_tomasi_response, ic)
    resp = shi_tomasi_response(ic)
    out["detect_grid_ms"] = timeit(detect_grid, resp, pts, valid, M)
    out["fast_detect_ms"] = timeit(fast_detect, img, max_pts=256, threshold=20.0)
    sm = smooth_for_brief(img)
    fpts, _ = fast_detect(img, max_pts=256, threshold=20.0)
    out["brief_ms"] = timeit(brief_describe, sm, fpts)
    out["smooth_ms"] = timeit(smooth_for_brief, img)

    # essential-RANSAC (runs inside the fused front step on publish frames)
    from vins_tpu.init.relative_pose import solve_relative_pose
    key = jax.random.PRNGKey(3)
    ptsn = jax.random.normal(key, (M, 2), jnp.float32) * 0.3
    out["relpose_ransac_ms"] = timeit(
        solve_relative_pose, ptsn, ptsn + 0.01, valid, key)

    # the fused per-frame front-end program (the real per-frame cost)
    from vins_tpu.frontend.tracker import FeatureTracker
    from vins_tpu.sim.proxy import euroc_camera
    tr = FeatureTracker(euroc_camera(jnp.float32))
    imgs = [jax.random.uniform(jax.random.PRNGKey(i), (H, W), jnp.float32) * 255
            for i in range(4)]
    tr.read_image(imgs[0], 0.0, publish=True)
    tr.read_image(imgs[1], 0.05, publish=True)
    t0 = time.perf_counter()
    niter = 20
    for i in range(niter):
        tr.read_image(imgs[2 + i % 2], 0.1 + 0.05 * i, publish=True)
    out["tracker_read_image_ms"] = (time.perf_counter() - t0) / niter * 1e3

    # raw fetch-latency probe: tuple-of-arrays vs a single packed blob
    arrs = tuple(jnp.zeros((150, 2), jnp.float32) for _ in range(8))
    jax.block_until_ready(arrs)
    t0 = time.perf_counter()
    for _ in range(10):
        jax.device_get(arrs)
    out["fetch_8_small_arrays_ms"] = (time.perf_counter() - t0) / 10 * 1e3
    blob = jnp.zeros((8 * 300,), jnp.float32)
    jax.block_until_ready(blob)
    t0 = time.perf_counter()
    for _ in range(10):
        jax.device_get(blob)
    out["fetch_1_blob_ms"] = (time.perf_counter() - t0) / 10 * 1e3
    return out


def profile_pipeline(n_frames):
    from vins_tpu.sim.proxy import TIC, make_pipeline
    from vins_tpu.sim.render import Room, RoomRenderer
    from vins_tpu.sim.synthetic import Trajectory
    from vins_tpu.sim.window import R_IC_FORWARD
    from vins_tpu.loop import pose_graph as pg_mod

    pipe = make_pipeline(loop_closure=True, pg_skip_first_cnt=5,
                         dtype=jnp.float32)
    tracer = pipe.tracer
    pg = pipe.pose_graph

    # wrap pose-graph internals with spans
    orig_query = pg.db.query
    orig_add = pg.db.add
    orig_find = pg._find_connection
    orig_opt = pg._optimize
    pg.db.query = lambda *a, **k: _sp(tracer, "pg_query", orig_query, *a, **k)
    pg.db.add = lambda *a, **k: _sp(tracer, "pg_db_add", orig_add, *a, **k)
    pg._find_connection = lambda *a, **k: _sp(tracer, "pg_verify", orig_find, *a, **k)
    pg._optimize = lambda *a, **k: _sp(tracer, "pg_optimize", orig_opt, *a, **k)

    traj = Trajectory.circuit(radius=4.0, period=12.0, height=1.0)
    gravity = jnp.asarray([0.0, 0.0, 9.81], jnp.float64)
    renderer = RoomRenderer(pipe.camera, 480, 752,
                            room=Room.make(jax.random.PRNGKey(7)),
                            tic=TIC, Ric=np.asarray(R_IC_FORWARD))
    imu_at = highest_matmul_precision(
        jax.jit(lambda t: traj.imu_at(t, gravity)))
    frame_at = highest_matmul_precision(
        jax.jit(lambda t: (traj.pos_fn(t), traj.q(t))))

    frame_hz, imu_hz = 20.0, 200.0
    n_sub = int(imu_hz / frame_hz)
    dt_i = 1.0 / imu_hz
    ba = np.array([0.02, -0.01, 0.015])
    bg = np.array([0.002, 0.003, -0.001])
    frames = []
    for fi in range(n_frames):
        t = 1.0 + fi / frame_hz
        imu = []
        if fi > 0:
            for s in range(1, n_sub + 1):
                ti = t - 1.0 / frame_hz + s * dt_i
                a, w = imu_at(jnp.asarray(ti))
                imu.append((ti, np.asarray(a) + ba, np.asarray(w) + bg))
        p, q = frame_at(jnp.asarray(t))
        frames.append((t, imu, renderer.render_device(p, q)))
    jax.block_until_ready(frames[-1][2])

    warm = min(40, n_frames // 3)
    for t, imu, img in frames[:warm]:
        for ti, a, w in imu:
            pipe.process_imu(ti, a, w)
        pipe.process_image(img, t)
    tracer.stats.reset()
    t0 = time.perf_counter()
    for t, imu, img in frames[warm:]:
        for ti, a, w in imu:
            pipe.process_imu(ti, a, w)
        pipe.process_image(img, t)
    dt = time.perf_counter() - t0
    return (n_frames - warm) / dt, tracer.stats.snapshot()


def _sp(tracer, name, fn, *a, **k):
    with tracer.span(name):
        return fn(*a, **k)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=80)
    ap.add_argument("--skip-kernels", action="store_true")
    ap.add_argument("--skip-pipeline", action="store_true")
    args = ap.parse_args()

    out = {"platform": jax.devices()[0].platform}
    if not args.skip_kernels:
        out["frontend_kernels"] = profile_frontend_kernels()
        print(json.dumps(out["frontend_kernels"], indent=1), flush=True)
    if not args.skip_pipeline:
        fps, stats = profile_pipeline(args.frames)
        out["pipeline_fps"] = round(fps, 2)
        out["stages"] = stats
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
