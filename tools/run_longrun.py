#!/usr/bin/env python
"""Long-run drift-elimination artifact (the reference's signature behavior,
pose_graph.cpp:403-579, tro p.11): a multi-lap proxy run long enough for
raw VIO to accumulate visible drift, with loop detection THROTTLED to
sparse keyframes (pg_skip_cnt + pg_skip_dis — the reference's ingestion
gates) so the 4-DoF pose graph demonstrably pulls the LIVE corrected path
back onto ground truth.

Writes results/proxy_longrun.json + TUM trajectories for plotting.

Usage: python tools/run_longrun.py [--duration 200] [--radius 6]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=200.0)
    ap.add_argument("--period", type=float, default=25.0)
    ap.add_argument("--radius", type=float, default=6.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out-dir", default="results")
    args = ap.parse_args()

    from vins_tpu.io.euroc import write_tum
    from vins_tpu.sim.proxy import ate_rmse_tum, make_pipeline, run_proxy

    # sparse loop cadence: count-downsample keyframes 3x + 0.25 m distance
    # gate (pose_graph_node.cpp:344-359 SKIP_CNT/SKIP_DIS), 3 s between
    # 4-DoF solves
    pipe = make_pipeline(loop_closure=True, dtype=jnp.float32,
                         pg_async=True, overlap=True,
                         pg_skip_first_cnt=10, pg_skip_cnt=2,
                         pg_skip_dis=0.25, pg_opt_interval=3.0,
                         # BA-refined loop edges via in-window relo factors
                         # (the full FAST_RELOCALIZATION round trip)
                         fast_relocalization=True)
    run = run_proxy(duration=args.duration, period=args.period,
                    radius=args.radius, seed=args.seed, pipe=pipe,
                    progress=lambda fi, n, ev: print(
                        f"frame {fi}/{n} {ev.get('kind','')}", flush=True)
                    if fi % 200 == 0 else None)

    gt_path_m = float(np.linalg.norm(np.diff(run.p_gt, axis=0),
                                     axis=1).sum())
    ate_vio = ate_rmse_tum(pipe.trajectory, run.t, run.p_gt)
    ate_corr = ate_rmse_tum(pipe.trajectory_loop, run.t, run.p_gt)
    # keyframe (optimized pose-graph) path
    kfs = pipe.pose_graph.keyframes
    pg_path = [(k.stamp, k.p, k.q) for k in kfs]
    ate_pg = ate_rmse_tum(pg_path, run.t, run.p_gt)
    n_loops = sum(1 for e in pipe.pg_events if e.get("loop") is not None)
    n_relo = sum(1 for e in run.events if e.get("relo", {}).get("ok"))

    out = {
        "duration_s": args.duration,
        "radius_m": args.radius,
        "gt_path_m": round(gt_path_m, 2),
        "frames": len(run.t),
        "keyframes": len(kfs),
        "loops": n_loops,
        "relo_refined_edges": n_relo,
        "pg_optimizes": pipe.pose_graph.n_optimizes,
        "pg_dropped": pipe.pg_dropped,
        "reboots": pipe.estimator.failures,
        "ate_vio_m": round(ate_vio, 4),
        "ate_vio_pct_path": round(100 * ate_vio / gt_path_m, 3),
        "ate_corrected_live_m": round(ate_corr, 4),
        "ate_corrected_pct_path": round(100 * ate_corr / gt_path_m, 3),
        "ate_pose_graph_path_m": round(ate_pg, 4),
        "improvement_live_x": round(ate_vio / max(ate_corr, 1e-9), 2),
    }
    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.out_dir, "proxy_longrun.json"), "w") as f:
        json.dump(out, f, indent=1)
    t, p, q = zip(*pipe.trajectory)
    write_tum(os.path.join(args.out_dir, "longrun_vio.tum"),
              np.asarray(t), np.stack(p), np.stack(q))
    t, p, q = zip(*pipe.trajectory_loop)
    write_tum(os.path.join(args.out_dir, "longrun_corrected.tum"),
              np.asarray(t), np.stack(p), np.stack(q))
    write_tum(os.path.join(args.out_dir, "longrun_gt.tum"),
              run.t, run.p_gt, run.q_gt)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
