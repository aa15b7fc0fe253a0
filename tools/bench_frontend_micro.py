import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp
from vins_tpu.frontend.klt import lk_pyramidal
from vins_tpu.frontend.detect import shi_tomasi_response, detect_grid
from vins_tpu.frontend.image import clahe, build_pyramid

H, W, N = 480, 752, 160
key = jax.random.PRNGKey(0)
img0 = jax.random.uniform(key, (H, W), jnp.float32)
img1 = jnp.roll(img0, (1, 2), (0, 1))
pts = jnp.stack([jax.random.uniform(key, (N,), jnp.float32, 30, W-30),
                 jax.random.uniform(jax.random.PRNGKey(1), (N,), jnp.float32, 30, H-30)], -1)
valid = jnp.ones((N,), bool)

def timeit(name, f, *a, iters=50):
    o = f(*a); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*a)
    jax.block_until_ready(o)
    dt = (time.perf_counter()-t0)/iters*1e3
    print(f"{name}: {dt:.3f} ms")

timeit("lk_pyramidal", lambda: lk_pyramidal(img0, img1, pts, valid))
timeit("shi_tomasi", lambda: shi_tomasi_response(img0))
resp = shi_tomasi_response(img0)
timeit("detect_grid", lambda: detect_grid(resp, pts, valid, 160))
timeit("clahe", lambda: clahe(img0))
