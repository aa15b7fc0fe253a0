import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
from vins_tpu.imu.preintegration import _sqrt_info, preintegrate, ImuNoise
rng = np.random.default_rng(0)
A = jnp.asarray(rng.normal(0,1,(10,15,15)), jnp.float32)
P = jnp.einsum("nij,nkj->nik", A, A) + 1e-3*jnp.eye(15)
f = jax.jit(jax.vmap(_sqrt_info))
def timeit(name, fn, iters=100):
    o = fn(); jax.block_until_ready(o)
    t0=time.perf_counter()
    for _ in range(iters): o=fn()
    jax.block_until_ready(o)
    print(f"{name}: {(time.perf_counter()-t0)/iters*1e3:.3f} ms")
timeit("sqrt_info_x10", lambda: f(P))
chol = jax.jit(lambda P: jnp.linalg.cholesky(P))
timeit("cholesky_x10", lambda: chol(P))
tri = jax.jit(lambda L: jax.scipy.linalg.solve_triangular(L, jnp.broadcast_to(jnp.eye(15, dtype=jnp.float32),(10,15,15)), lower=True))
L = chol(P)
timeit("trisolve_x10", lambda: tri(L))
inv = jax.jit(lambda P: jnp.linalg.inv(P))
timeit("inv_x10", lambda: inv(P))
# preintegrate without sqrt_info: monkeypatch
import vins_tpu.imu.preintegration as pre
orig = pre._sqrt_info
pre._sqrt_info = lambda P: P
noise = ImuNoise()
N=22
dt = jnp.asarray(rng.uniform(0.004,0.006,(10,N)), jnp.float32)
acc = jnp.asarray(rng.normal(0,2,(10,N+1,3)), jnp.float32)
gyr = jnp.asarray(rng.normal(0,0.5,(10,N+1,3)), jnp.float32)
ba = jnp.zeros((10,3), jnp.float32); bg = jnp.zeros((10,3), jnp.float32)
m = jnp.ones((10,N), jnp.float32)
g = jax.jit(lambda d,a,gy,b1,b2,mm: jax.vmap(lambda d_,a_,g_,x,y,m_: pre.preintegrate(d_,a_,g_,x,y,noise,m_))(d,a,gy,b1,b2,mm))
timeit("preintegrate_x10_no_sqrtinfo", lambda: g(dt,acc,gyr,ba,bg,m))
pre._sqrt_info = orig
