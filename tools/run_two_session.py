#!/usr/bin/env python
"""Two-session map reuse demo (BASELINE configs[3]; pose_graph.cpp:697-870):

  session A: run the proxy circuit, save the pose graph (map);
  session B: a NEW pipeline in the SAME room, different circuit, loads the
  map as the pinned base sequence 0, relocalizes against it, merges, and is
  scored; the base-map poses must be BITWISE unchanged afterwards.

Writes results/two_session.json.
"""
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

from vins_tpu.sim.proxy import ate_rmse_tum, make_pipeline, run_proxy


def main():
    os.makedirs("results", exist_ok=True)
    map_path = "results/two_session_map.npz"

    # --- session A --------------------------------------------------------
    print("session A ...", flush=True)
    pipe_a = make_pipeline(loop_closure=True, dtype=jnp.float32,
                           pg_async=True, pg_skip_first_cnt=5)
    run_a = run_proxy(duration=24.0, period=16.0, seed=0, pipe=pipe_a)
    ate_a = ate_rmse_tum(pipe_a.trajectory, run_a.t, run_a.p_gt)
    pipe_a.pose_graph.save(map_path)
    n_base = len(pipe_a.pose_graph.keyframes)
    print(f"A: ate={ate_a:.3f} kf={n_base} loops={run_a.n_loops}", flush=True)

    # --- session B: same room (same render seed), different circuit -------
    print("session B ...", flush=True)
    pipe_b = make_pipeline(loop_closure=True, dtype=jnp.float32,
                           pg_async=False, pg_skip_first_cnt=5)
    pipe_b.pose_graph.load(map_path)
    base_p = np.stack([k.p for k in pipe_b.pose_graph.keyframes]).copy()
    base_q = np.stack([k.q for k in pipe_b.pose_graph.keyframes]).copy()

    run_b = run_proxy(duration=24.0, period=16.0, seed=0, radius=3.7,
                      pipe=pipe_b)
    pg = pipe_b.pose_graph
    new_kfs = pg.keyframes[n_base:]
    loops_to_base = [k for k in new_kfs
                     if 0 <= k.loop_index < n_base]
    merged = 1 in getattr(pg, "_merged", set())
    base_unchanged = (
        np.array_equal(np.stack([k.p for k in pg.keyframes[:n_base]]), base_p)
        and np.array_equal(np.stack([k.q for k in pg.keyframes[:n_base]]),
                           base_q))

    ate_b_vio = ate_rmse_tum(pipe_b.trajectory, run_b.t, run_b.p_gt)
    ate_b_corr = ate_rmse_tum(pipe_b.trajectory_loop, run_b.t, run_b.p_gt)
    out = {
        "session_a": {"ate_vio_m": round(ate_a, 4), "keyframes": n_base,
                      "loops": run_a.n_loops},
        "session_b": {
            "ate_vio_m": round(ate_b_vio, 4),
            "ate_corrected_m": round(ate_b_corr, 4),
            "keyframes_new": len(new_kfs),
            "loops_to_base_map": len(loops_to_base),
            "first_reloc_stamp": (round(loops_to_base[0].stamp, 2)
                                  if loops_to_base else None),
            "merged_onto_base": bool(merged),
            "pg_optimizes": pg.n_optimizes,
        },
        "base_map_bitwise_unchanged": bool(base_unchanged),
    }
    with open("results/two_session.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
