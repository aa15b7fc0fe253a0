"""Measure device dispatch/transfer latency on the attached device.
Scratch diagnostic for pipeline-stage budgeting."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

dev = jax.devices()[0]
print("platform:", dev.platform)

f = jax.jit(lambda x: x + 1.0)
x = jnp.zeros(8)
jax.block_until_ready(f(x))

def bench(fn, n=30):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0) * 1e3)
    ts = np.array(ts)
    return f"median {np.median(ts):8.3f} ms  p90 {np.percentile(ts,90):8.3f} ms"

print("noop dispatch+block :", bench(lambda: jax.block_until_ready(f(x))))
print("device_get 8 floats :", bench(lambda: jax.device_get(f(x))))

big = jnp.zeros((480, 752), jnp.float32)
g = jax.jit(lambda x: x * 2.0)
jax.block_until_ready(g(big))
print("device_get 1.4 MB   :", bench(lambda: jax.device_get(g(big))))

up = np.zeros((480, 752), np.float32)
print("upload 1.4 MB+block :", bench(lambda: jax.block_until_ready(jnp.asarray(up))))

h = jax.jit(lambda a, b: a @ b)
m = jnp.zeros((1024, 1024), jnp.bfloat16)
jax.block_until_ready(h(m, m))
print("1k matmul dispatch  :", bench(lambda: jax.block_until_ready(h(m, m))))

# chained dispatches without sync: cost of 10 sequential programs + 1 sync
def chain():
    y = f(x)
    for _ in range(9):
        y = f(y)
    jax.block_until_ready(y)
print("10 chained + block  :", bench(chain))
