"""Batched multi-stream pipeline: S independent VIO streams on one chip.

The single-stream pipeline is dominated by per-dispatch/fetch round trips
(~26 ms RTT on a remote-attached chip) and per-frame device programs that
leave most of the chip idle.  This driver amortizes both by running S
streams in lock-step through TWO batched device programs per frame tick:

  * one `vmap`ped fused front-end step (frontend/fused.py) over the stacked
    tracker states + images — one dispatch, one packed blob fetch for all
    S streams;
  * one `vmap`ped fused VIO step (the estimator's packed step) over the
    stacked window blobs + priors — one dispatch, one fetch.

Host bookkeeping (feature DB, sliding, keyframe decisions, pose graphs)
stays per-stream numpy, exactly the single-stream code paths
(Estimator.pre_step/post_step).  Streams still in INITIAL fall back to the
ordinary per-stream `Estimator.process_image`; once NON_LINEAR they join
the batched step.  A stream that reboots falls back transparently.

This realizes BASELINE configs[4] (batched replay of many sequences) on a
single chip — the same `vmap` axes become `shard_map` axes over a mesh for
the pod-scale path (parallel/sharded.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import VinsConfig
from ..estimator.estimator import INITIAL, NON_LINEAR
from ..pipeline import Pipeline
from ..solver.problem import Prior


class MultiPipeline:
    """S lock-step pipelines sharing batched device programs.

    Each stream keeps its own full `Pipeline` (estimator, tracker host
    mirrors, pose graph, trajectories); the device work is batched."""

    def __init__(self, make_pipe, S: int, loop_closure: bool = True):
        self.S = S
        self.pipes: list[Pipeline] = [make_pipe(s) for s in range(S)]
        p0 = self.pipes[0]
        self.cfg = p0.cfg
        est0 = p0.estimator

        # batched estimator step over (blob [S,D], prior pytree [S,...])
        self._est_step = jax.jit(jax.vmap(est0._packed_step_raw))
        self._prior_b = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[p.estimator.prior for p in self.pipes])

        # batched front-end steps: vmap over (state, img, dt, key, n_id),
        # one program per static (publish, has_prev) combination
        self._front_cache: dict = {}
        self._front_state_b = None
        self._has_prev = False
        # deferred batched estimator result (same pattern as the single-
        # stream overlap pipeline: fetch one publish tick late, so the
        # async host copy lands during the intervening work)
        self._est_pending = None  # {res, batch_idx, batch_marg, t, events}
        # IMU samples that arrive while a deferred solve is outstanding:
        # they belong to the NEXT interval and must not enter the window
        # buffers until the deferred post_step has slid them
        self._imu_backlog = [[] for _ in range(S)]

    def _front_batched(self, publish: bool, has_prev: bool):
        key = (publish, has_prev)
        if key not in self._front_cache:
            raw = self.pipes[0].tracker._step.__wrapped__

            def fn(st, im, dt, k, n):
                return raw(st, im, dt, k, n, publish=publish,
                           has_prev=has_prev)

            self._front_cache[key] = jax.jit(jax.vmap(fn))
        return self._front_cache[key]

    # ------------------------------------------------------------------ IMU

    def process_imu(self, s: int, t: float, acc, gyr):
        """Per-stream IMU sample (cheap numpy stores; the IMU-rate
        propagator output is skipped in batched mode — it is a per-stream
        low-latency output, not part of the estimation path)."""
        pipe = self.pipes[s]
        est = pipe.estimator
        dt = t - pipe.propagator.t if pipe.propagator.t is not None else 0.0
        pipe.propagator.t = t
        if self._est_pending is not None:
            # a deferred solve is outstanding: hold until its post_step
            # has slid the interval buffers (_complete_est)
            self._imu_backlog[s].append((dt, acc, gyr))
        else:
            est.process_imu(dt, acc, gyr)

    # ---------------------------------------------------------------- frame

    def process_images(self, imgs, t: float, publish: bool = True) -> list:
        """One synchronized frame tick for all S streams.  `imgs`: [S,H,W]
        device array (or stackable host arrays).  Returns per-stream event
        dicts."""
        S = self.S
        trs = [p.tracker for p in self.pipes]
        if self._front_state_b is None:
            from ..frontend.fused import make_front_state

            h, w = imgs.shape[-2:]
            states = [make_front_state(tr.M, h, w, tr.dtype) for tr in trs]
            self._front_state_b = jax.tree.map(
                lambda *xs: jnp.stack(xs), *states)

        dts = np.asarray([
            (t - tr.prev_time) if tr.prev_time is not None else 0.0
            for tr in trs], np.float32)
        keys = []
        for tr in trs:
            tr._key, sub = jax.random.split(tr._key)
            keys.append(sub)
        n_ids = np.asarray([tr.n_id for tr in trs], np.int32)

        tracer = self.pipes[0].tracer
        step = self._front_batched(bool(publish), self._has_prev)
        with tracer.span("ms_front_dispatch"):
            self._front_state_b, blobs = step(
                self._front_state_b, imgs, dts, jnp.stack(keys), n_ids)
        self._has_prev = True
        for tr in trs:
            tr.prev_time = t
        if not publish:
            return [{"published": False}] * S

        from ..frontend.fused import unpack_front_blob

        # complete LAST tick's deferred estimator result first — its
        # post_step/slide must land before this tick's pre_steps
        events_prev = self._complete_est()
        with tracer.span("ms_front_fetch"):
            blobs_h = np.asarray(jax.device_get(blobs))
        events: list = [None] * S
        batch_idx: list[int] = []
        batch_blobs: list[np.ndarray] = []
        batch_marg: list[bool] = []
        feats_all = []
        _t0 = __import__("time").perf_counter()
        for s in range(S):
            tr = trs[s]
            un, vel, pts, pub_mask, valid, cnt, ids, n_new = \
                unpack_front_blob(blobs_h[s], tr.M)
            tr.pts = np.asarray(pts, float)
            tr.valid = valid
            tr.track_cnt = cnt.astype(np.int64)
            tr.ids = ids.astype(np.int64)
            tr.n_id += int(n_new)
            fid = tr.ids[pub_mask].copy()
            feats = (fid, np.asarray(un, float)[pub_mask],
                     np.asarray(vel, float)[pub_mask],
                     tr.pts[pub_mask].copy())
            feats_all.append(feats)
            est = self.pipes[s].estimator
            if est.solver_flag == NON_LINEAR:
                blob, marg = est.pre_step(*feats, t)
                batch_idx.append(s)
                batch_blobs.append(blob)
                batch_marg.append(marg)
            else:
                # INITIAL / rebooting streams use the per-stream path
                events[s] = est.process_image(*feats, t)
                if est.solver_flag == NON_LINEAR:
                    # joined the batch from the next frame; sync its prior
                    self._set_prior(s, est.prior)

        tracer.stats.add("ms_host_pre",
                         (__import__("time").perf_counter() - _t0) * 1e3)
        if batch_idx:
            # streams not in the batch still occupy their slot (the vmapped
            # program has a fixed batch size S) — fill with zeros; their
            # result and prior slot are discarded below
            full = np.zeros((S,) + batch_blobs[0].shape,
                            batch_blobs[0].dtype)
            for k, s in enumerate(batch_idx):
                full[s] = batch_blobs[k]
            with tracer.span("ms_est_dispatch"):
                res_b = self._est_step(full, self._prior_b)
            prior_b = res_b.prior
            # keep the prior ONLY for batched slots (a zero-blob run's
            # prior is garbage); stays on device — no fetch
            sel = np.zeros(S, bool)
            sel[batch_idx] = True
            sel_d = jnp.asarray(sel)
            self._prior_b = jax.tree.map(
                lambda old, new: jnp.where(
                    sel_d.reshape((S,) + (1,) * (old.ndim - 1)), new, old),
                self._prior_b, prior_b)
            res_body = res_b._replace(prior=None)
            try:
                jax.tree.map(lambda x: x.copy_to_host_async(), res_body)
            except (AttributeError, NotImplementedError):
                pass
            self._est_pending = {"res": res_body, "batch_idx": batch_idx,
                                 "batch_marg": batch_marg, "t": t,
                                 "events": events}

        return events_prev

    def _complete_est(self):
        """Fetch + apply the deferred batched estimator result; run the
        per-stream downstream (trajectories, pose-graph handoff)."""
        if self._est_pending is None:
            return []
        p = self._est_pending
        self._est_pending = None
        S = self.S
        tracer = self.pipes[0].tracer
        with tracer.span("ms_est_fetch"):
            res_h = jax.device_get(p["res"])
        events = p["events"]
        t = p["t"]
        for k, s in enumerate(p["batch_idx"]):
            res_s = jax.tree.map(lambda x: x[s], res_h)
            est = self.pipes[s].estimator
            ev = est.post_step(res_s, None, p["batch_marg"][k],
                               failure_check=True)
            ev["kind"] = "vio" if ev.get("ok", True) else "reboot"
            if not ev.get("ok", True):
                # rebooted: reset this stream's prior slot
                self._set_prior(s, est.prior)
            events[s] = ev
        # release the held IMU samples into the freshly-slid buffers
        for s in range(S):
            for dt, acc, gyr in self._imu_backlog[s]:
                self.pipes[s].estimator.process_imu(dt, acc, gyr)
            self._imu_backlog[s].clear()

        # downstream per stream: trajectories, pose-graph handoff
        _t1 = __import__("time").perf_counter()
        for s in range(S):
            pipe = self.pipes[s]
            est = pipe.estimator
            ev = events[s] or {}
            if pipe.pose_graph is not None:
                pipe._maybe_relo_feedback(ev)
            if est.solver_flag == NON_LINEAR and ev.get("ok", True):
                W = est.W
                p, q = est.p[W].copy(), est.q[W].copy()
                pipe.trajectory.append((t, p, q))
                if pipe.pose_graph is not None:
                    pc, qc = pipe.pose_graph.correct_pose(p, q, pipe.sequence)
                    pipe.trajectory_loop.append((t, pc, qc))
                    while pipe._relo_queue:
                        pipe._apply_relo(pipe._relo_queue.pop(0))
                    if ev.get("marg_old"):
                        payload = pipe._build_keyframe_payload()
                        if payload is not None:
                            if pipe.pg_async:
                                import queue as _q

                                try:
                                    pipe._pg_queue.put_nowait(payload)
                                except _q.Full:
                                    pipe.pg_dropped += 1
                            else:
                                res = pipe._pg_process(payload)
                                pipe.pg_events.append(res)
        tracer.stats.add("ms_downstream",
                         (__import__("time").perf_counter() - _t1) * 1e3)
        return events

    def _set_prior(self, s: int, prior: Prior):
        self._prior_b = jax.tree.map(
            lambda b, x: b.at[s].set(jnp.asarray(x)), self._prior_b, prior)

    def push_image_ring(self, s: int, t: float, img):
        """Keep the keyframe image ring fed (pose-graph handoff)."""
        pipe = self.pipes[s]
        pipe._img_ring.append((t, img))
        if len(pipe._img_ring) > 6:
            pipe._img_ring.pop(0)

    def finish(self):
        self._complete_est()
        for p in self.pipes:
            p.pg_join()
            p.shutdown()
