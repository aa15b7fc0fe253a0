#!/usr/bin/env python
"""Batched multi-stream proxy replay: S independent textured-room streams
through the batched pipeline (parallel/multistream.MultiPipeline) on one
chip — BASELINE configs[4] (concurrent sequence replay) single-chip form,
and the aggregate-throughput benchmark path.

Each stream has its OWN room texture, circuit geometry, IMU noise draws and
RNG keys; per-stream ATE is scored against its closed-form ground truth.

Usage: python tools/run_multistream.py [--streams 8] [--duration 20]
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
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import numpy as np

from vins_tpu.core.precision import highest_matmul_precision
from vins_tpu.parallel.multistream import MultiPipeline
from vins_tpu.sim.proxy import (BA, BG, EUROC_H, EUROC_W, TIC, ate_rmse_tum,
                                make_pipeline)
from vins_tpu.sim.render import Room, RoomRenderer
from vins_tpu.sim.synthetic import Trajectory
from vins_tpu.sim.window import R_IC_FORWARD


def generate_streams(S, duration, frame_hz=20.0, imu_hz=200.0,
                     loop_closure=True, pg_async=True, imu_noise=True,
                     pix_noise=2.0):
    """Build the MultiPipeline + pre-generated per-frame sensor data.

    Returns (mp, frames, gt) where frames is a list of
    (t, imu_per_stream, imgs [S,H,W] device) and gt[s] = (ts, p, q)."""
    mp = MultiPipeline(
        lambda s: make_pipeline(loop_closure=loop_closure, dtype=jnp.float32,
                                pg_async=pg_async, pg_skip_first_cnt=5,
                                # sparse keyframe cadence (the reference's
                                # SKIP_CNT/SKIP_DIS ingestion gates) — at 8
                                # concurrent streams the loop stage must not
                                # eat the chip
                                pg_skip_cnt=2, pg_skip_dis=0.2),
        S, loop_closure=loop_closure)

    trajs = [Trajectory.circuit(radius=3.8 + 0.1 * s, period=14.0 + 0.5 * s,
                                height=1.0 + 0.05 * s) for s in range(S)]
    gravity = jnp.asarray([0.0, 0.0, 9.81], jnp.float64)
    cam = mp.pipes[0].camera
    renderers = [RoomRenderer(cam, EUROC_H, EUROC_W,
                              room=Room.make(jax.random.PRNGKey(100 + s)),
                              tic=TIC, Ric=np.asarray(R_IC_FORWARD))
                 for s in range(S)]
    imu_ats = [highest_matmul_precision(
        jax.jit(lambda t, tr=tr: tr.imu_at(t, gravity))) for tr in trajs]
    frame_ats = [highest_matmul_precision(
        jax.jit(lambda t, tr=tr: (tr.pos_fn(t), tr.q(t)))) for tr in trajs]

    @jax.jit
    def noisy(img, key):
        return jnp.clip(img + pix_noise * jax.random.normal(
            key, img.shape, img.dtype), 0.0, 255.0)

    rngs = [np.random.default_rng(s) for s in range(S)]
    dt_i = 1.0 / imu_hz
    sig_a = 0.02 * np.sqrt(imu_hz) if imu_noise else 0.0
    sig_g = 0.0017 * np.sqrt(imu_hz) if imu_noise else 0.0
    wba = 0.0004 * np.sqrt(dt_i) if imu_noise else 0.0
    wbg = 2e-5 * np.sqrt(dt_i) if imu_noise else 0.0
    n_frames = int(round(duration * frame_hz))
    n_sub = int(round(imu_hz / frame_hz))
    t0 = 1.0
    frame_ts = t0 + np.arange(n_frames) / frame_hz

    # Per-stream CLEAN IMU + poses evaluated in ONE batched device call and
    # ONE fetch each — per-sample eager fetches each pay a ~26 ms RTT
    # (25k samples would be minutes of pure round trips).
    imu_ts = np.concatenate(
        [frame_ts[fi - 1] + np.arange(1, n_sub + 1) * dt_i
         for fi in range(1, n_frames)]) if n_frames > 1 else np.zeros(0)
    clean_imu, poses = [], []
    for s in range(S):
        A, W = jax.device_get(jax.vmap(imu_ats[s])(
            jnp.asarray(imu_ts, jnp.float64)))
        P, Q = jax.device_get(jax.vmap(frame_ats[s])(
            jnp.asarray(frame_ts, jnp.float64)))
        clean_imu.append((np.asarray(A), np.asarray(W)))
        poses.append((np.asarray(P), np.asarray(Q)))

    # noise + bias random walks, vectorized per stream
    noisy_imu = []
    for s in range(S):
        A, W = clean_imu[s]
        n = len(imu_ts)
        ba = BA[None] + np.cumsum(wba * rngs[s].standard_normal((n, 3)), 0)
        bg = BG[None] + np.cumsum(wbg * rngs[s].standard_normal((n, 3)), 0)
        acc = A + ba + sig_a * rngs[s].standard_normal((n, 3))
        gyr = W + bg + sig_g * rngs[s].standard_normal((n, 3))
        noisy_imu.append((acc, gyr))

    frames = []
    gt = [([], [], []) for _ in range(S)]
    for fi in range(n_frames):
        t = frame_ts[fi]
        imu_per_stream = []
        for s in range(S):
            samples = []
            if fi > 0:
                o = (fi - 1) * n_sub
                for k in range(n_sub):
                    samples.append((imu_ts[o + k], noisy_imu[s][0][o + k],
                                    noisy_imu[s][1][o + k]))
            imu_per_stream.append(samples)
        imgs = []
        for s in range(S):
            P, Q = poses[s]
            img = renderers[s].render_device(jnp.asarray(P[fi]),
                                             jnp.asarray(Q[fi]))
            if pix_noise > 0:
                img = noisy(img, jax.random.fold_in(
                    jax.random.PRNGKey(200 + s), fi))
            imgs.append(img)
            gt[s][0].append(t)
            gt[s][1].append(P[fi])
            gt[s][2].append(Q[fi])
        frames.append((t, imu_per_stream, jnp.stack(imgs)))
    return mp, frames, gt


def drive(mp: MultiPipeline, frames, frame_hz=20.0, publish_hz=10.0,
          start=0, end=None, time_it=False):
    """Feed pre-generated frames; publish at publish_hz (the FREQ
    controller's downsampling).  Returns elapsed seconds."""
    every = max(1, int(round(frame_hz / publish_hz)))
    end = len(frames) if end is None else end
    t0 = time.perf_counter()
    for fi in range(start, end):
        t, imu_per_stream, imgs = frames[fi]
        for s, samples in enumerate(imu_per_stream):
            for ti, a, w in samples:
                mp.process_imu(s, ti, a, w)
        publish = (fi % every) == 0
        if publish:
            for s in range(mp.S):
                mp.push_image_ring(s, t, imgs[s])
        mp.process_images(imgs, t, publish=publish)
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=8)
    ap.add_argument("--duration", type=float, default=20.0)
    ap.add_argument("--no-loop", action="store_true")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    S = args.streams
    print(f"generating {S} streams x {args.duration}s ...", flush=True)
    mp, frames, gt = generate_streams(S, args.duration,
                                      loop_closure=not args.no_loop)
    n = len(frames)
    # warm-up must cover compiles AND every stream's initialization — the
    # init programs are one-off host-driven solves that would otherwise
    # contaminate the steady-state timing
    warm = min(60, n // 3)
    print(f"warm-up {warm} frames (compiles) ...", flush=True)
    drive(mp, frames, start=0, end=warm)
    while warm < 2 * n // 3 and not all(
            p.estimator.solver_flag == 1 for p in mp.pipes):
        drive(mp, frames, start=warm, end=warm + 10)
        warm += 10
    n_init = sum(p.estimator.solver_flag == 1 for p in mp.pipes)
    print(f"timed segment (from frame {warm}; {n_init}/{S} initialized) ...",
          flush=True)
    mp.pipes[0].tracer.stats.reset()
    dt = drive(mp, frames, start=warm, end=n)
    agg_fps = S * (n - warm) / dt
    print(mp.pipes[0].tracer.stats.report(), flush=True)
    mp.finish()

    ates = []
    for s in range(S):
        ts, ps, qs = gt[s]
        ate = ate_rmse_tum(mp.pipes[s].trajectory, np.asarray(ts),
                           np.stack(ps))
        ates.append(ate)
    loops = [sum(1 for e in p.pg_events if e.get("loop") is not None)
             for p in mp.pipes]
    reboots = [p.estimator.failures for p in mp.pipes]
    out = {
        "streams": S,
        "aggregate_fps": round(agg_fps, 2),
        "per_stream_fps": round(agg_fps / S, 2),
        "ate_per_stream_m": [round(a, 3) for a in ates],
        "loops_per_stream": loops,
        "reboots": reboots,
        "frames_timed": n - warm,
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
