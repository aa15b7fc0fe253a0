#!/usr/bin/env python
"""Fetch-based (honest) timing of the front-end device kernels on the
attached chip: which sub-kernel makes the publish-variant front program
slow?  block_until_ready returns at dispatch on the remote-attached
platform, so each measurement chains N calls and times one scalar fetch.
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

RTT_EST_N = 3


def timed(name, fn, *args, n=10):
    """Chain n dispatches, fetch once; subtract nothing (RTT ~26ms/n)."""
    out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    # force real completion via fetch
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]).astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]).astype(jnp.float32))
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:34s} {ms:8.2f} ms/call (chained x{n}, incl ~{26/n:.1f} RTT)")
    return ms


def main():
    from vins_tpu.frontend.image import clahe
    from vins_tpu.frontend.klt import lk_pyramidal
    from vins_tpu.frontend.detect import detect_grid, shi_tomasi_response
    from vins_tpu.init.relative_pose import solve_relative_pose
    from vins_tpu.sim.proxy import euroc_camera

    H, W, M = 480, 752, 150
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (H, W), jnp.float32) * 255.0
    img2 = jax.random.uniform(jax.random.PRNGKey(1), (H, W), jnp.float32) * 255.0
    pts = jax.random.uniform(key, (M, 2), jnp.float32) * jnp.asarray([W - 40, H - 40]) + 20
    valid = jnp.ones((M,), bool)
    cam = euroc_camera(dtype=jnp.float32)

    jclahe = jax.jit(clahe)
    timed("clahe", jclahe, img)
    jlk = jax.jit(lambda a, b, p, v: lk_pyramidal(a, b, p, v, win=21, levels=3))
    timed("lk_pyramidal 21x21x3", jlk, img, img2, pts, valid)
    jst = jax.jit(shi_tomasi_response)
    timed("shi_tomasi_response", jst, img)
    jdg = jax.jit(lambda r, p, v: detect_grid(r, p, v, max_new=M, cell=30))
    resp = jst(img)
    timed("detect_grid", jdg, resp, pts, valid)
    jlift = jax.jit(lambda p: cam.lift(p))
    timed("camera.lift x150", jlift, pts)
    un = jax.random.normal(key, (M, 2), jnp.float32) * 0.3
    un2 = un + jax.random.normal(jax.random.PRNGKey(2), (M, 2), jnp.float32) * 0.01
    jrp = jax.jit(lambda a, b, m, k: solve_relative_pose(a, b, m, k, thresh=1.0 / 460))
    timed("essential_ransac", jrp, un, un2, valid, key)

    # full fused step, publish and track-only variants
    from vins_tpu.frontend.fused import make_front_state, make_front_step
    step = make_front_step(cam, M, 30, 1.0, True, 460.0, dtype=jnp.float32)
    st = make_front_state(M, H, W, jnp.float32)
    st, blob = step(st, img, np.float32(0.05), key, np.int32(0),
                    publish=True, has_prev=False)
    for pub in (False, True):
        def run(s, i1, i2):
            s, b1 = step(s, i1, np.float32(0.05), key, np.int32(0),
                         publish=pub, has_prev=True)
            s, b2 = step(s, i2, np.float32(0.05), key, np.int32(0),
                         publish=pub, has_prev=True)
            return b2
        timed(f"fused_step publish={pub} (x2)", jax.jit(run), st, img, img2, n=5)


if __name__ == "__main__":
    main()
