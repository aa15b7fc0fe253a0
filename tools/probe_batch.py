#!/usr/bin/env python
"""How do the front-end/estimator device kernels scale with a leading
stream-batch axis?  Fetch-based timing (block_until_ready lies on axon).
Informs the multi-stream aggregate-fps design: aggregate ceiling =
S / (device time per batched frame).
"""
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


def timed(name, fn, *a, n=10):
    out = fn(*a)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]).astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]).astype(jnp.float32))
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:40s} {ms:8.2f} ms", flush=True)
    return ms


def main(S=8):
    from vins_tpu.frontend.image import clahe, build_pyramid
    from vins_tpu.frontend.klt import lk_pyramidal
    from vins_tpu.frontend.detect import detect_grid, shi_tomasi_response

    H, W, M = 480, 752, 150
    key = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(key, (S, H, W), jnp.float32) * 255.0
    img2 = imgs + 1.0
    pts = jax.random.uniform(key, (S, M, 2), jnp.float32) * jnp.asarray([W - 40, H - 40]) + 20
    valid = jnp.ones((S, M), bool)

    timed("clahe x1", jax.jit(clahe), imgs[0])
    timed(f"clahe vmap x{S}", jax.jit(jax.vmap(clahe)), imgs)
    timed("pyr x1", jax.jit(lambda i: build_pyramid(i, 3)[-1]), imgs[0])
    timed(f"pyr vmap x{S}", jax.jit(jax.vmap(lambda i: build_pyramid(i, 3)[-1])), imgs)
    timed("shi_tomasi x1", jax.jit(shi_tomasi_response), imgs[0])
    timed(f"shi_tomasi vmap x{S}", jax.jit(jax.vmap(shi_tomasi_response)), imgs)
    lk = lambda a, b, p, v: lk_pyramidal(a, b, p, v, win=21, levels=3)
    timed("lk x1", jax.jit(lk), imgs[0], img2[0], pts[0], valid[0])
    timed(f"lk vmap x{S}", jax.jit(jax.vmap(lk)), imgs, img2, pts, valid)
    dg = lambda r, p, v: detect_grid(r, p, v, max_new=M, cell=30)
    resp = jax.vmap(shi_tomasi_response)(imgs)
    timed("detect_grid x1", jax.jit(dg), resp[0], pts[0], valid[0])
    timed(f"detect_grid vmap x{S}", jax.jit(jax.vmap(dg)), resp, pts, valid)

    # estimator fused step, single and batched
    from __graft_entry__ import _window_inputs
    from vins_tpu.estimator.step import make_vio_step
    from vins_tpu.imu.preintegration import ImuNoise
    from vins_tpu.solver.gn import SolverOptions

    layout, args = _window_inputs(frames=11, max_landmarks=160, imu_n=22,
                                  dtype=jnp.float32)
    step = make_vio_step(layout, ImuNoise(), SolverOptions(iters=8), jit=False)
    timed("vio_step x1", jax.jit(step), *args)
    batch = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (S,) + x.shape)
                         if hasattr(x, "shape") else x, args)
    batch = tuple(batch[:8]) + (args[8],) + tuple(batch[9:])
    vstep = jax.jit(jax.vmap(step, in_axes=(0,) * 8 + (None,) + (0,) * 2))
    timed(f"vio_step vmap x{S}", vstep, *batch)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
