"""Benchmark: steady-state fused VIO step throughput on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's sliding-window optimization takes 50 ms per solve
on an i7-4790 (tro_technical_report.pdf p.12 Table I; BASELINE.md), i.e.
20 solves/s — and that covers only the Ceres solve + marginalization, which
is exactly what the fused step measures here (plus triangulation and
preintegration, which the reference's budget counts separately).
vs_baseline = our steps/s ÷ 20.
"""
import json
import time

import jax
import jax.numpy as jnp

from vins_tpu.estimator.step import make_vio_step
from vins_tpu.imu.preintegration import ImuNoise
from vins_tpu.solver.gn import SolverOptions
from __graft_entry__ import _window_inputs

REFERENCE_STEPS_PER_S = 20.0  # 50 ms/solve on i7-4790 (Table I)


def main():
    dtype = jnp.float32
    layout, args = _window_inputs(frames=11, max_landmarks=160, imu_n=22, dtype=dtype)
    step = make_vio_step(layout, ImuNoise(), SolverOptions(iters=8))

    # warm-up/compile
    out = step(*args)
    jax.block_until_ready(out)

    # steady-state: feed the solved state back in (keeps the work honest and
    # the arrays on-device)
    iters = 200
    t0 = time.perf_counter()
    state = args[0]
    for _ in range(iters):
        out = step(state, *args[1:])
        state = out.state
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    steps_per_s = iters / dt
    print(json.dumps({
        "metric": "fused_vio_step_throughput",
        "value": round(steps_per_s, 2),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_s / REFERENCE_STEPS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
