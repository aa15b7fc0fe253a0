import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"]="cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from vins_tpu.imu.preintegration import preintegrate, preintegrate_sequential, ImuNoise

rng = np.random.default_rng(0)
N = 22
dt = jnp.asarray(rng.uniform(0.004, 0.006, N))
acc = jnp.asarray(rng.normal(0, 2, (N+1, 3)) + np.array([0,0,9.81]))
gyr = jnp.asarray(rng.normal(0, 0.5, (N+1, 3)))
ba = jnp.asarray([0.02, -0.01, 0.03]); bg = jnp.asarray([0.001, -0.002, 0.0005])
mask = jnp.asarray((np.arange(N) < 17).astype(float))
a = preintegrate_sequential(dt, acc, gyr, ba, bg, ImuNoise(), mask)
b = preintegrate(dt, acc, gyr, ba, bg, ImuNoise(), mask)
for f in a._fields:
    x, y = getattr(a, f), getattr(b, f)
    err = float(jnp.max(jnp.abs(jnp.asarray(x) - jnp.asarray(y))))
    print(f"{f}: max abs diff {err:.3e}")
    assert err < 1e-9, f
print("OK")
