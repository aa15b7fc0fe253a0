#!/usr/bin/env python
"""Real-data-proxy end-to-end run with recorded ATE (the stand-in for the
EuRoC replay of README.md:66-89 while no dataset is on disk).

Drives the FULL pipeline — rendered textured-room images through CLAHE →
KLT → Shi-Tomasi → F-RANSAC → estimator → (optionally) BRIEF retrieval +
PnP loop closure + 4-DoF pose graph — on a closed circuit with noisy,
biased 200 Hz IMU, writes TUM trajectories, and scores ATE RMSE against the
closed-form ground truth.

Usage:
  python tools/run_proxy.py [--duration 20] [--period 16] [--loop/--no-loop]
                            [--seed 0] [--cpu] [--out-dir results]
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=20.0)
    ap.add_argument("--period", type=float, default=16.0)
    ap.add_argument("--frame-hz", type=float, default=10.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--loop", dest="loop", action="store_true", default=True)
    ap.add_argument("--no-loop", dest="loop", action="store_false")
    ap.add_argument("--no-noise", dest="noise", action="store_false", default=True)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out-dir", default="results")
    args = ap.parse_args()

    import jax
    if args.cpu:
        # x64 belongs to the CPU reference path only: on TPU f64 is
        # software-emulated (bench.py:22-24) — the device path runs f32
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parent.parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    # whole-pipeline true-f32 dots (see bench.py:29 — the front-end image
    # path is precision-sensitive beyond the internally-scoped solvers)
    jax.config.update("jax_default_matmul_precision", "highest")

    import jax.numpy as jnp
    import numpy as np

    from vins_tpu.io.euroc import write_tum
    from vins_tpu.sim.proxy import ate_rmse_tum, make_pipeline, run_proxy

    out = Path(args.out_dir)
    out.mkdir(exist_ok=True)

    t0 = time.time()
    dtype = jnp.float64 if args.cpu else jnp.float32
    pipe = make_pipeline(loop_closure=args.loop, dtype=dtype,
                         pg_async=args.loop)
    run = run_proxy(
        duration=args.duration, period=args.period, frame_hz=args.frame_hz,
        seed=args.seed, imu_noise=args.noise, pipe=pipe,
        progress=lambda i, n, ev: print(
            f"frame {i}/{n} {ev.get('kind')} t={time.time()-t0:.0f}s",
            flush=True),
    )
    wall = time.time() - t0

    tag = "loop" if args.loop else "no_loop"
    pipe.write_trajectories(str(out / f"proxy_vio_{tag}.tum"),
                            str(out / f"proxy_corrected_{tag}.tum"))
    write_tum(str(out / "proxy_gt.tum"), run.t, run.p_gt, run.q_gt)

    kinds = [e.get("kind") for e in run.events]
    # per-keyframe gate diagnostics (scores → candidate → verify), the
    # instrumentation VERDICT r2 asked for: where does the chain die?
    # (pose-graph results live in pipe.pg_events — the worker's output
    # stream in async mode, the same records inline in sync mode)
    kf_evs = [e for e in pipe.pg_events if "candidate" in e]
    gates = {
        "keyframes_queried": len(kf_evs),
        "dropped_backpressure": pipe.pg_dropped,
        "no_candidate": sum(1 for e in kf_evs if e["candidate"] is None),
        "desc_matches": sum(1 for e in kf_evs
                            if str(e.get("verify", "")).startswith("desc")),
        "pnp": sum(1 for e in kf_evs
                   if str(e.get("verify", "")).startswith("pnp")),
        "relative": sum(1 for e in kf_evs
                        if str(e.get("verify", "")).startswith("relative")),
        "ok": sum(1 for e in kf_evs if e.get("verify") == "ok"),
    }
    loops = [{"t": round(float(e["stamp"]), 2), "old": int(e["loop"])}
             for e in kf_evs if e.get("loop") is not None]
    gt_path_m = float(np.linalg.norm(np.diff(run.p_gt, axis=0), axis=1).sum())
    ate_vio = ate_rmse_tum(pipe.trajectory, run.t, run.p_gt)
    res = {
        "duration_s": args.duration,
        "period_s": args.period,
        "seed": args.seed,
        "imu_noise": args.noise,
        "min_loop_num": pipe.cfg.min_loop_num,
        "frames_published": len(run.events),
        "kinds": {k: kinds.count(k) for k in set(kinds)},
        "reboots": int(pipe.estimator.failures),
        "loops_detected": run.n_loops,
        "loops": loops[:50],
        "gates": gates,
        "gt_path_m": round(gt_path_m, 2),
        "ate_vio_m": ate_vio,
        "ate_vio_pct_path": round(100.0 * ate_vio / gt_path_m, 3),
        "ate_vio_4dof_m": ate_rmse_tum(pipe.trajectory, run.t, run.p_gt,
                                       align="yaw"),
        "wall_s": round(wall, 1),
        "stage_ms": pipe.tracer.stats.snapshot(),
    }
    if args.loop and pipe.trajectory_loop:
        ate_c = ate_rmse_tum(pipe.trajectory_loop, run.t, run.p_gt)
        res["ate_corrected_m"] = ate_c
        res["ate_corrected_pct_path"] = round(100.0 * ate_c / gt_path_m, 3)
        res["pose_graph_keyframes"] = len(pipe.pose_graph.keyframes)
        res["pose_graph_optimizes"] = pipe.pose_graph.n_optimizes
        # the reference's vins_result_loop.csv is the OPTIMIZED keyframe
        # path (pose_graph.cpp:628-644), not the live corrected stream —
        # score that too
        kf_path = [(k.stamp, k.p, k.q) for k in pipe.pose_graph.keyframes]
        ate_kf = ate_rmse_tum(kf_path, run.t, run.p_gt)
        res["ate_pose_graph_path_m"] = ate_kf
        if kf_path:
            write_tum(str(out / f"proxy_pgpath_{tag}.tum"),
                      np.asarray([e[0] for e in kf_path]),
                      np.stack([e[1] for e in kf_path]),
                      np.stack([e[2] for e in kf_path]))
    print(json.dumps(res, indent=1))
    with open(out / f"proxy_{tag}_seed{args.seed}.json", "w") as f:
        json.dump(res, f, indent=1)
    print(pipe.print_statistics())


if __name__ == "__main__":
    main()
