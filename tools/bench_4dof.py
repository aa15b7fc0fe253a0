#!/usr/bin/env python
"""Time the 4-DoF pose-graph solve at the reference's keyframe-DB cap.

The reference caps its database at ~2000 keyframes for hours-long runs
(tro_technical_report.pdf p.11) and budgets 130 ms per pose-graph
optimization (Table I, i7-4790).  This times our analytic-assembly GN at
K=2048 (and smaller buckets) on the attached device.

Usage: python tools/bench_4dof.py [--iters 5] [--sizes 256,1024,2048]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from vins_tpu.loop.optimize4dof import GraphArrays, optimize_4dof


def make_graph(K: int, seed: int = 0, n_loops: int = 64,
               dtype=jnp.float32) -> GraphArrays:
    rng = np.random.default_rng(seed)
    t_vio = np.cumsum(rng.normal(0, 0.3, (K, 3)), axis=0)
    ypr = rng.normal(0, 10, (K, 3))
    loop_to = np.full(K, -1, np.int32)
    loop_t = np.zeros((K, 3))
    loop_yaw = np.zeros(K)
    js = rng.choice(np.arange(K // 2, K), size=n_loops, replace=False)
    for j in js:
        loop_to[j] = rng.integers(0, j - K // 4)
        loop_t[j] = rng.normal(0, 1.0, 3)
        loop_yaw[j] = rng.normal(0, 5)
    fixed = np.zeros(K, bool)
    fixed[0] = True
    return GraphArrays(
        t_vio=jnp.asarray(t_vio, dtype), ypr_vio=jnp.asarray(ypr, dtype),
        yaw=jnp.asarray(ypr[:, 0], dtype), t=jnp.asarray(t_vio, dtype),
        loop_to=jnp.asarray(loop_to), loop_t=jnp.asarray(loop_t, dtype),
        loop_yaw=jnp.asarray(loop_yaw, dtype),
        used=jnp.ones(K, bool), fixed=jnp.asarray(fixed),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--sizes", default="256,1024,2048")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    out = {"device": str(jax.devices()[0]), "iters": args.iters,
           "ref_budget_ms": 130.0, "solves": {}}
    for K in map(int, args.sizes.split(",")):
        g = make_graph(K)
        solved = optimize_4dof(g, iters=args.iters)
        float(solved.t.sum())  # compile + execute
        # NOTE: a scalar fetch, not block_until_ready — on the remote-
        # attached (axon) platform block_until_ready returns at dispatch,
        # before remote execution completes
        t0 = time.perf_counter()
        for _ in range(args.reps):
            solved = optimize_4dof(g, iters=args.iters)
            float(solved.t.sum())
        ms = (time.perf_counter() - t0) / args.reps * 1e3
        out["solves"][str(K)] = round(ms, 2)
        print(f"K={K}: {ms:.1f} ms ({args.iters} GN iters)", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
