#!/usr/bin/env python
"""Per-host-blocking-call breakdown of the live pipeline loop on the
attached device: where exactly do the ~RTT-sized stalls go?

Times, per frame class (publish / track-only): front dispatch, front blob
fetch, db bookkeeping, estimator pack, estimator dispatch, estimator fetch.
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

from vins_tpu.core.precision import highest_matmul_precision


def main(n_frames=60, frame_hz=20.0):
    from vins_tpu.sim.proxy import TIC, make_pipeline
    from vins_tpu.sim.render import Room, RoomRenderer
    from vins_tpu.sim.synthetic import Trajectory
    from vins_tpu.sim.window import R_IC_FORWARD
    from vins_tpu.frontend.fused import unpack_front_blob

    pipe = make_pipeline(loop_closure=False, dtype=jnp.float32)
    traj = Trajectory.circuit(radius=4.0, period=12.0, height=1.0)
    gravity = jnp.asarray([0.0, 0.0, 9.81], jnp.float64)
    renderer = RoomRenderer(pipe.camera, 480, 752,
                            room=Room.make(jax.random.PRNGKey(7)),
                            tic=TIC, Ric=np.asarray(R_IC_FORWARD))
    imu_at = highest_matmul_precision(jax.jit(lambda t: traj.imu_at(t, gravity)))
    frame_at = highest_matmul_precision(jax.jit(lambda t: (traj.pos_fn(t), traj.q(t))))

    imu_hz, n_sub = 200.0, int(200.0 / frame_hz)
    frames = []
    for fi in range(n_frames):
        t = 1.0 + fi / frame_hz
        imu = []
        if fi > 0:
            for s in range(1, n_sub + 1):
                ti = t - 1.0 / frame_hz + s / imu_hz
                a, w = imu_at(jnp.asarray(ti))
                imu.append((ti, np.asarray(a), np.asarray(w)))
        p, q = frame_at(jnp.asarray(t))
        frames.append((t, imu, renderer.render_device(p, q)))

    est = pipe.estimator
    tr = pipe.tracker
    stats = {}

    def rec(name, dt):
        stats.setdefault(name, []).append(dt * 1e3)

    warm = 25
    for fi, (t, imu, img) in enumerate(frames):
        t_f0 = time.perf_counter()
        for ti, a, w in imu:
            pipe.process_imu(ti, a, w)
        t_imu = time.perf_counter()

        # --- inline what pipeline.process_image does, instrumented
        if pipe._last_image_time is None:
            pipe._first_image_time = t
        pipe._last_image_time = t
        elapsed = max(t - pipe._first_image_time, 1e-9)
        publish = pipe._pub_count / elapsed <= pipe.freq
        live = fi >= warm
        if tr._state is None:
            from vins_tpu.frontend.fused import make_front_state
            tr._state = make_front_state(tr.M, *img.shape, tr.dtype)
        dtf = (t - tr.prev_time) if tr.prev_time is not None else 0.0
        tr._key, sub = jax.random.split(tr._key)
        t0 = time.perf_counter()
        tr._state, blob = tr._step(tr._state, img, np.float32(dtf), sub,
                                   np.int32(tr.n_id), publish=bool(publish),
                                   has_prev=tr._has_prev)
        t1 = time.perf_counter()
        tr.prev_time = t
        tr._has_prev = True
        if live:
            rec("imu_host", t_imu - t_f0)
            rec("keysplit+front_dispatch", t1 - t0)
        if not publish:
            if live:
                rec("frame_total_trackonly", time.perf_counter() - t_f0)
            continue
        pipe._pub_count += 1
        t0 = time.perf_counter()
        un, vel, pts, pub_mask, valid, cnt, ids, n_new = unpack_front_blob(
            jax.device_get(blob), tr.M)
        t1 = time.perf_counter()
        if live:
            rec("front_fetch", t1 - t0)
        tr.pts = np.asarray(pts, float); tr.valid = valid
        tr.track_cnt = cnt.astype(np.int64); tr.ids = ids.astype(np.int64)
        tr.n_id += int(n_new)
        fid = tr.ids[pub_mask].copy()
        fpts = np.asarray(un, float)[pub_mask]
        fvel = np.asarray(vel, float)[pub_mask]
        fuv = tr.pts[pub_mask].copy()

        # --- estimator
        if est.solver_flag != 1:
            # warm-up / init: run the untimed full estimator path
            est.process_image(fid, fpts, fvel, fuv, t)
        else:
            t0 = time.perf_counter()
            est._propagate_newest()
            col = min(est.frame_count, est.W)
            marg_old = est.db.add_frame(fid, fpts, fvel, fuv, 0.0, col)
            marg_old = marg_old or est._overflow_guard()
            est.timestamps[col] = t
            t1 = time.perf_counter()
            if live:
                rec("est_db_host", t1 - t0)
            t0 = time.perf_counter()
            blob_e = est._pack_blob(marg_old)
            t1 = time.perf_counter()
            res = est._packed_step(blob_e, est.prior)
            t2 = time.perf_counter()
            prior_dev = res.prior
            res = jax.device_get(res._replace(prior=None))
            t3 = time.perf_counter()
            if live:
                rec("est_pack", t1 - t0)
                rec("est_dispatch", t2 - t1)
                rec("est_fetch", t3 - t2)
            est._adopt_state(res.state)
            est.prior = prior_dev
            est.db.remove_failures(np.asarray(res.inv_depth))
            est.last_cost = float(res.cost)
            t4 = time.perf_counter()
            est._slide(marg_old)
            t5 = time.perf_counter()
            if live:
                rec("est_adopt_host", t4 - t3)
                rec("est_slide_host", t5 - t4)
        if live:
            rec("frame_total_publish", time.perf_counter() - t_f0)

    print(f"solver_flag={est.solver_flag}")
    for k in sorted(stats):
        v = np.array(stats[k])
        print(f"{k:28s} n={len(v):3d} mean={v.mean():8.2f} ms  "
              f"p50={np.median(v):8.2f}  max={v.max():8.2f}")


if __name__ == "__main__":
    main()
