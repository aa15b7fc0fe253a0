"""Benchmark: end-to-end pipeline frames/s + fused VIO step throughput.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...extras}.

Headline metric: full-pipeline frames/s on one chip — images → CLAHE → KLT →
Shi-Tomasi top-up → F-RANSAC → estimator (fused LM/Schur step incl.
marginalization) with loop closure on, driven by the textured-room proxy
(sim/proxy.py).  Baseline: the reference runs real time at a 20 Hz camera
(README.md:120; tro Table I times on an i7-4790), so vs_baseline = fps / 20.

Extra fields:
  * fused_step_steps_per_s — the estimator device program alone; reference
    budget = 50 ms/solve (Table I) → vs 20 solves/s.
  * frontend_ms / estimator_ms / pose_graph_ms — per-stage host wall means.
"""
import json
import os
import time

import jax

# NO x64 here: TPU f64 is software-emulated (u32-pair arithmetic) and one of
# the cumulative-op lowerings exceeds the v5e scoped-vmem limit; the whole
# device path runs f32 (validated against the f64 CPU suite).
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
# TPU dot/conv ops default to bf16-input passes.  Solver programs force f32
# dots internally (core/precision.py), but the measured accuracy ladder on
# the 30 s proxy (31 % of path → 3.1 m → 0.24 m as default / solver+sim
# scoped / global-highest) shows the front-end image path is ALSO
# precision-sensitive — run the whole device pipeline at true f32 dots.
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import numpy as np

from vins_tpu.core.precision import highest_matmul_precision

REF_CAMERA_HZ = 20.0     # real-time operating point (README.md:120)
REF_SOLVES_PER_S = 20.0  # 50 ms/solve on i7-4790 (tro Table I)


def bench_fused_step():
    from __graft_entry__ import _window_inputs
    from vins_tpu.estimator.step import make_vio_step
    from vins_tpu.imu.preintegration import ImuNoise
    from vins_tpu.solver.gn import SolverOptions

    dtype = jnp.float32
    layout, args = _window_inputs(frames=11, max_landmarks=160, imu_n=22,
                                  dtype=dtype)
    step = make_vio_step(layout, ImuNoise(), SolverOptions(iters=8))
    out = step(*args)
    float(out.state.p.sum())  # compile + execute (fetch: see note below)
    iters = 200
    t0 = time.perf_counter()
    state = args[0]
    for _ in range(iters):
        out = step(state, *args[1:])
        state = out.state
    # honest completion barrier: a scalar FETCH, not block_until_ready — on
    # the remote-attached (axon) platform block_until_ready returns at
    # dispatch, before remote execution completes.  The state chain forces
    # serial execution, so one final fetch times all `iters` steps.
    float(out.state.p.sum())
    return iters / (time.perf_counter() - t0)


def bench_pipeline(n_frames: int = 160, frame_hz: float = 20.0):
    """Steady-state pipeline throughput: all sensor data pre-generated
    (device-resident images), timing covers tracker + estimator + loop.
    Runs the production single-stream configuration: overlapped front-end/
    estimator (one published frame apart) + async pose-graph worker."""
    from vins_tpu.sim.proxy import TIC, make_pipeline
    from vins_tpu.sim.render import Room, RoomRenderer
    from vins_tpu.sim.synthetic import Trajectory
    from vins_tpu.sim.window import R_IC_FORWARD

    # keyframe ingestion gates at reference-parity cadence (SKIP_CNT /
    # SKIP_DIS, pose_graph_node.cpp:344-359): with the front-end now ~7 ms
    # a frame, an ungated loop stage would monopolize the (single) chip
    pipe = make_pipeline(loop_closure=True, pg_skip_first_cnt=5,
                         pg_skip_cnt=2, pg_skip_dis=0.2,
                         dtype=jnp.float32, pg_async=True, overlap=True)
    traj = Trajectory.circuit(radius=4.0, period=12.0, height=1.0)
    gravity = jnp.asarray([0.0, 0.0, 9.81], jnp.float64)
    renderer = RoomRenderer(pipe.camera, 480, 752,
                            room=Room.make(jax.random.PRNGKey(7)),
                            tic=TIC, Ric=np.asarray(R_IC_FORWARD))
    imu_at = highest_matmul_precision(
        jax.jit(lambda t: traj.imu_at(t, gravity)))
    frame_at = highest_matmul_precision(
        jax.jit(lambda t: (traj.pos_fn(t), traj.q(t))))

    imu_hz = 200.0
    n_sub = int(imu_hz / frame_hz)
    dt_i = 1.0 / imu_hz
    t0s = 1.0
    ba = np.array([0.02, -0.01, 0.015])
    bg = np.array([0.002, 0.003, -0.001])

    frames = []
    for fi in range(n_frames):
        t = t0s + fi / frame_hz
        imu = []
        if fi > 0:
            for s in range(1, n_sub + 1):
                ti = t - 1.0 / frame_hz + s * dt_i
                a, w = imu_at(jnp.asarray(ti))
                imu.append((ti, np.asarray(a) + ba, np.asarray(w) + bg))
        p, q = frame_at(jnp.asarray(t))
        img = renderer.render_device(p, q)
        frames.append((t, imu, img))
    jax.block_until_ready(frames[-1][2])

    # warm-up segment (compiles every program variant incl. init + loop;
    # must extend past the first KEYFRAMES so the pose-graph worker's
    # programs compile outside the timed window)
    warm = min(80, n_frames // 2)
    for t, imu, img in frames[:warm]:
        for ti, a, w in imu:
            pipe.process_imu(ti, a, w)
        pipe.process_image(img, t)

    # honest post-warm stage means: drop the warm-up (compile-inflated) spans
    pipe.tracer.stats.reset()
    t0 = time.perf_counter()
    for t, imu, img in frames[warm:]:
        for ti, a, w in imu:
            pipe.process_imu(ti, a, w)
        pipe.process_image(img, t)
    dt = time.perf_counter() - t0
    fps = (n_frames - warm) / dt
    stats = pipe.tracer.stats.snapshot()
    dropped = pipe.pg_dropped
    n_kf = (len(pipe.pose_graph.keyframes)
            if pipe.pose_graph is not None else 0)
    # clean worker shutdown: a daemon thread killed mid-device-call at
    # interpreter exit aborts the process
    pipe.pg_join()
    pipe.shutdown()
    return fps, stats, dropped, n_kf


def bench_multistream(S: int = 8, duration: float = 16.0):
    """Aggregate throughput: S independent proxy streams through the
    batched pipeline (parallel/multistream.py) — one vmapped front-end
    dispatch + one vmapped VIO dispatch per frame tick for all streams."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tools"))
    from run_multistream import drive, generate_streams

    from vins_tpu.sim.proxy import ate_rmse_tum

    mp, frames, gt = generate_streams(S, duration)
    n = len(frames)
    warm = min(60, n // 3)
    drive(mp, frames, start=0, end=warm)
    # warm-up must also cover every stream's one-off initialization
    while warm < 2 * n // 3 and not all(
            p.estimator.solver_flag == 1 for p in mp.pipes):
        drive(mp, frames, start=warm, end=warm + 10)
        warm += 10
    dt = drive(mp, frames, start=warm, end=n)
    agg = S * (n - warm) / dt
    mp.finish()
    ates = []
    for s in range(S):
        ts, ps, qs = gt[s]
        ates.append(ate_rmse_tum(mp.pipes[s].trajectory, np.asarray(ts),
                                 np.stack(ps)))
    return agg, ates


def main():
    steps_per_s = bench_fused_step()
    fps, stats, pg_dropped, n_kf = bench_pipeline()
    agg_fps, stream_ates = bench_multistream()
    out = {
        "metric": "pipeline_fps",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / REF_CAMERA_HZ, 2),
        "aggregate_fps_8stream": round(agg_fps, 2),
        "aggregate_vs_baseline": round(agg_fps / REF_CAMERA_HZ, 2),
        "stream_ate_m": [round(a, 3) for a in stream_ates],
        "fused_step_steps_per_s": round(steps_per_s, 2),
        "fused_step_vs_baseline": round(steps_per_s / REF_SOLVES_PER_S, 2),
        # async-worker honesty: drops under backpressure + steady-state
        # worker latency (post-warm-up mean, compile-skew excluded)
        "pg_dropped": pg_dropped,
        "pg_keyframes": n_kf,
    }
    for stage in ("frontend", "front_fetch", "estimator", "pose_graph"):
        if stage in stats:
            out[f"{stage}_ms"] = stats[stage]["mean_ms"]
    if pg_dropped > 0.1 * max(n_kf + pg_dropped, 1):
        out["pg_drop_warning"] = "dropped >10% of keyframes"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
