"""Bisect the fused front-end step cost on the attached device: track-only
(publish=False: CLAHE+LK) vs full publish (adds essential-RANSAC + Shi-Tomasi
top-up + velocity).  Scratch diagnostic."""
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

from vins_tpu.frontend.tracker import FeatureTracker
from vins_tpu.sim.proxy import euroc_camera

H, W = 480, 752
tr = FeatureTracker(euroc_camera(jnp.float32))
imgs = [jax.random.uniform(jax.random.PRNGKey(i), (H, W), jnp.float32) * 255
        for i in range(4)]
jax.block_until_ready(imgs)

# warm both program variants
tr.read_image(imgs[0], 0.0, publish=True)
tr.read_image(imgs[1], 0.05, publish=True)
tr.read_image(imgs[2], 0.10, publish=False)

def run(publish, n=20):
    t0 = time.perf_counter()
    tt = 0.15
    for i in range(n):
        out = tr.read_image(imgs[i % 2], tt, publish=publish)
        if not publish:
            jax.block_until_ready(tr._state.pts)
        tt += 0.05
    return (time.perf_counter() - t0) / n * 1e3

print("track-only (CLAHE+LK)  :", round(run(False), 2), "ms")
print("publish (full)         :", round(run(True), 2), "ms")

# and the same without the state block, to see pure dispatch cost
def run_nosync(n=20):
    t0 = time.perf_counter()
    tt = 10.0
    for i in range(n):
        tr.read_image(imgs[i % 2], tt, publish=False)
        tt += 0.05
    jax.block_until_ready(tr._state.pts)
    return (time.perf_counter() - t0) / n * 1e3

print("track-only, one sync/20:", round(run_nosync(), 2), "ms")
