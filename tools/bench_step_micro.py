import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp
from __graft_entry__ import _window_inputs
from vins_tpu.imu.preintegration import ImuNoise, preintegrate
from vins_tpu.solver.gn import SolverOptions, solve_window
from vins_tpu.estimator.step import triangulate_depths, make_vio_step
from vins_tpu.solver.marginalize import marginalize_old
from vins_tpu.solver.problem import Layout

dtype = jnp.float32
layout, args = _window_inputs(frames=11, max_landmarks=160, imu_n=22, dtype=dtype)
(state, dt_, acc, gyr, mask, obs, needs_tri, prior, gravity, marg_old, last_p) = args
noise = ImuNoise(); opts = SolverOptions(iters=8)

def timeit(name, f, iters=100):
    o = f(); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(iters): o = f()
    jax.block_until_ready(o)
    print(f"{name}: {(time.perf_counter()-t0)/iters*1e3:.3f} ms")

pre_f = jax.jit(lambda d,a,g,ba,bg,m: jax.vmap(lambda d_,a_,g_,ba_,bg_,m_: preintegrate(d_,a_,g_,ba_,bg_,noise,m_))(d,a,g,ba,bg,m))
timeit("preintegrate_x10", lambda: pre_f(dt_, acc, gyr, state.ba[:-1], state.bg[:-1], mask))
pres = pre_f(dt_, acc, gyr, state.ba[:-1], state.bg[:-1], mask)
tri_f = jax.jit(triangulate_depths)
timeit("triangulate_160", lambda: tri_f(state, obs))
solve_f = jax.jit(lambda s, o, p: solve_window(s, o, pres, p, gravity, layout, opts))
timeit("solve_window_8it", lambda: solve_f(state, obs, prior))
solved, lam, info = solve_f(state, obs, prior)
marg_f = jax.jit(lambda s, o, p: marginalize_old(s, o, pres, p, gravity, layout))
timeit("marginalize_old", lambda: marg_f(solved, obs, prior))
for it in (1, 2, 4):
    f = jax.jit(lambda s, o, p, it=it: solve_window(s, o, pres, p, gravity, layout, SolverOptions(iters=it)))
    timeit(f"solve_window_{it}it", lambda: f(state, obs, prior))
