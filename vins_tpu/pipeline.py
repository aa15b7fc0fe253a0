"""Full-system pipeline: front-end → estimator → pose graph.

The TPU-native equivalent of the reference's three-node roslaunch graph
(vins_estimator/launch/euroc.launch wiring feature_tracker, vins_estimator,
pose_graph over topics).  Topics become direct calls; the node-level
behaviors live here:

  * frequency controller: track every frame, publish features at FREQ Hz
    (feature_tracker_node.cpp:51-62),
  * stream-health watchdog: >1 s gap or backwards time ⇒ restart both the
    tracker and the estimator (feature_tracker_node.cpp:38-48,
    estimator_node.cpp:179-198), and a new pose-graph sequence
    (pose_graph_node.cpp:69-91),
  * keyframe hand-off: when the estimator marginalizes a keyframe, its pose
    + landmarks + the raw image build a pose-graph KeyFrame
    (visualization.cpp:348-404 pubKeyframe → pose_graph_node process()),
  * IMU-rate propagation output (estimator_node.cpp:42-96).
"""
from __future__ import annotations

import queue
import threading
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import VinsConfig
from .core import nplie
from .estimator.estimator import NON_LINEAR, Estimator
from .estimator.propagator import ImuPropagator
from .frontend.tracker import FeatureTracker
from .loop.pose_graph import KeyFrame, PoseGraph
from .utils.trace import Tracer


def circular_fov_mask(h: int, w: int, margin: int = 4) -> np.ndarray:
    """Circular field-of-view mask for fisheye lenses — the built-in analog
    of the reference's fisheye_mask.jpg (feature_tracker/src/
    feature_tracker_node.cpp:216-229): True inside the image circle."""
    yy, xx = np.mgrid[:h, :w]
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    r = min(h, w) / 2.0 - margin
    return (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r


class Pipeline:
    def __init__(self, cfg: VinsConfig, camera, imu_buf_len: int = 256,
                 loop_closure: bool | None = None, dtype=jnp.float64,
                 overlap: bool | None = None):
        self.cfg = cfg
        self.camera = camera
        mask = circular_fov_mask(cfg.image_height, cfg.image_width) if cfg.fisheye else None
        self.tracker = FeatureTracker(
            camera, max_cnt=cfg.max_cnt, min_dist=cfg.min_dist,
            f_threshold=cfg.f_threshold, equalize=cfg.equalize, focal=cfg.focal,
            mask=mask,
        )
        self.estimator = Estimator(cfg, imu_buf_len=imu_buf_len, dtype=dtype)
        self.loop_closure = cfg.loop_closure if loop_closure is None else loop_closure
        self.pose_graph = (
            PoseGraph(self.estimator.qic, self.estimator.tic,
                      min_loop_inliers=cfg.min_loop_num,
                      opt_interval_s=cfg.pg_opt_interval)
            if self.loop_closure else None
        )
        self.propagator = ImuPropagator(cfg.g_norm)

        # asynchronous pose-graph worker (the reference's separate pose_graph
        # PROCESS, pose_graph_node.cpp:294-428: the frame loop never waits on
        # loop detection / 4-DoF optimization).  Sync mode (pg_async=False)
        # keeps the reference-free deterministic ordering for tests.
        self.pg_async = bool(cfg.pg_async) and self.pose_graph is not None
        self.pg_events: list = []    # results from the worker, in order
        self.pg_dropped = 0          # keyframes dropped under backpressure
        self._relo_queue: list = []  # worker → estimator fast-reloc payloads
        if self.pg_async:
            self._pg_queue: queue.Queue = queue.Queue(maxsize=4)
            self._pg_thread = threading.Thread(
                target=self._pg_worker, name="pose_graph", daemon=True)
            self._pg_thread.start()

        if self.pose_graph is not None:
            cam = self.camera

            @jax.jit
            def pg_feat_prog(img, uv, prev_pts, prev_desc, prev_valid,
                             prev_p, prev_R, p_cam, R_wc):
                from .loop.brief import (brief_describe, fast_detect,
                                         match_descriptors, smooth_for_brief)
                from .loop.verify import triangulate_two_view

                sm = smooth_for_brief(img)
                wdesc = brief_describe(sm, uv)
                fpix, fok = fast_detect(img, max_pts=256, threshold=20.0)
                fdesc = brief_describe(sm, fpix)
                rays = cam.lift(fpix)
                fpts = rays[..., :2] / rays[..., 2:3]
                pmidx, pmok = match_descriptors(fdesc, fok, prev_desc,
                                                prev_valid)
                x_prev = jnp.take(prev_pts, pmidx, axis=0)
                X3, okt = triangulate_two_view(
                    p_cam, R_wc, fpts, prev_p, prev_R, x_prev, pmok)
                return wdesc, fpts, fdesc, fok, X3, okt

            self._pg_feat_prog = pg_feat_prog

        # Overlapped (software-pipelined) mode: the estimator consumes the
        # PREVIOUS published frame's features while the current frame's
        # front-end program runs on device.  The reference runs the tracker
        # and the estimator as separate ROS processes (SURVEY §2.6) — this
        # is the same one-frame pipeline parallelism, single-threaded:
        #   1. fetch front blob(t_prev) (async host copy started last call
        #      — usually already arrived → ~0 ms),
        #   2. estimator(t_prev): dispatched BEFORE front(t) so its fetch
        #      never waits behind the front program on the device queue,
        #   3. dispatch front(t), start its async host copy.
        # Per published frame the host blocks ~one fetch RTT instead of two
        # serialized (front-execute + fetch, then estimator fetch).
        self.overlap = bool(cfg.overlap) if overlap is None else bool(overlap)
        self._pending = None   # (t, device blob) of the unconsumed front frame
        self._imu_backlog = []  # (t, dt, acc, gyr) since the pending frame
        # deferred estimator result: the solve of frame t-1 is DISPATCHED
        # when frame t arrives but its result is fetched only when frame
        # t+1 arrives — by then the async host copy has landed, so the
        # host blocks ~one tunnel RTT per published frame instead of two
        self._est_pending = None  # {res_dev, marg_old, t}

        self.freq = cfg.freq
        self._pub_count = 0
        self._first_image_time = None
        self._last_image_time = None
        self._img_ring: list = []  # (t, image) of recent published frames
        # pose-graph ingestion gates (pose_graph_node.cpp:24,344-359,385)
        self._pg_skip_first = 0
        self._pg_skip_count = 0
        self._pg_last_t = np.array([-100.0, -100.0, -100.0])
        self._prev_kf_fast = None  # previous keyframe's FAST set + cam pose
        self.trajectory = []  # (t, p, q) VIO outputs
        self.trajectory_loop = []  # pose-graph-corrected outputs
        self.sequence = 1
        # per-stage wall-clock stats (the reference's TicToc/printStatistics)
        self.tracer = Tracer()

    # ------------------------------------------------------------------ IMU

    def process_imu(self, t: float, acc, gyr):
        dt = t - self.propagator.t if self.propagator.t is not None else 0.0
        if self.overlap:
            # estimator input is delayed one published frame; the IMU-rate
            # output path (propagator) stays real-time
            self._imu_backlog.append((t, dt, acc, gyr))
        else:
            self.estimator.process_imu(dt, acc, gyr)
        return self.propagator.predict(t, acc, gyr)

    # ---------------------------------------------------------------- image

    def process_image(self, img: np.ndarray, t: float) -> dict:
        # stream-health watchdog (feature_tracker_node.cpp:38-48)
        if self._last_image_time is not None and (
            t - self._last_image_time > 1.0 or t < self._last_image_time
        ):
            self._restart()
        self._last_image_time = t
        if self._first_image_time is None:
            self._first_image_time = t

        # frequency controller (feature_tracker_node.cpp:51-62)
        elapsed = max(t - self._first_image_time, 1e-9)
        publish = self._pub_count / elapsed <= self.freq or self.freq <= 0
        if publish and abs(self._pub_count / elapsed - self.freq) < 0.01 * self.freq:
            self._first_image_time = t
            self._pub_count = 0

        if self.overlap:
            return self._process_image_overlapped(img, t, publish)

        with self.tracer.span("frontend"):
            feats = self.tracker.read_image(img, t, publish=publish)
        out = {"published": publish}
        if not publish or feats is None:
            return out
        self._pub_count += 1
        # keyframe handoff describes frame F-3 (post-slide W-2), whose image
        # arrived two published frames ago — keep a small ring keyed by time
        self._img_ring.append((t, img))
        if len(self._img_ring) > 8:
            self._img_ring.pop(0)
        out.update(self._estimator_and_downstream(feats, t))
        return out

    def _process_image_overlapped(self, img, t: float, publish: bool) -> dict:
        """Software-pipelined frame path (see __init__ docs): consume the
        pending front frame through the estimator first (its blob fetch was
        started asynchronously last call and its device program must precede
        the new front program in the device queue), then dispatch the
        current frame's front-end."""
        out = {"published": publish}
        out.update(self._consume_pending())
        with self.tracer.span("frontend"):
            blob = self.tracker.read_image_device(img, t, publish=publish)
        if publish:
            self._pub_count += 1
            self._img_ring.append((t, img))
            if len(self._img_ring) > 8:
                self._img_ring.pop(0)
            self._pending = (t, blob)
        return out

    def _consume_pending(self) -> dict:
        # phase 1: complete the DEFERRED estimator result of two frames ago
        # (its async host copy was started when it was dispatched; post_step
        # + sliding must land before this frame's pre_step)
        out = self._complete_est()

        if self._pending is None:
            # keep the estimator's open IMU interval aligned with published
            # frames: no pending frame means the backlog belongs to the NEXT
            # published frame's interval — hold it
            return out
        t_prev, blob = self._pending
        self._pending = None
        # samples at or before the pending frame's timestamp close ITS
        # interval; later samples stay in the backlog until the deferred
        # solve's post_step has slid the window (next _complete_est)
        before = [s for s in self._imu_backlog if s[0] <= t_prev + 1e-12]
        self._imu_backlog = [s for s in self._imu_backlog
                             if s[0] > t_prev + 1e-12]
        for _, dt, acc, gyr in before:
            self.estimator.process_imu(dt, acc, gyr)
        with self.tracer.span("front_fetch"):
            feats = self.tracker.adopt_blob(blob)
        if feats is None:
            return out

        est = self.estimator
        if est.solver_flag == NON_LINEAR:
            # phase 2: dispatch this frame's solve, defer its fetch
            toffs = self._toffs(feats)
            with self.tracer.span("estimator"):
                blob_e, marg_old = est.pre_step(
                    feats.ids, feats.pts, feats.vel, feats.uv, t_prev,
                    toffs=toffs)
                res_dev = est._packed_step(blob_e, est.prior)
                # the marginalization prior chains ON DEVICE — no fetch
                est.prior = res_dev.prior
                res_body = res_dev._replace(prior=None)
                try:
                    jax.tree.map(lambda x: x.copy_to_host_async(), res_body)
                except (AttributeError, NotImplementedError):
                    pass
                self._est_pending = {"res": res_body, "marg_old": marg_old,
                                     "t": t_prev}
        else:
            # INITIAL / rebooting: synchronous per-frame path
            ev = self._estimator_and_downstream(feats, t_prev)
            out = {**out, **ev}
        return out

    def _complete_est(self) -> dict:
        if self._est_pending is None:
            return {}
        p = self._est_pending
        self._est_pending = None
        est = self.estimator
        with self.tracer.span("est_fetch"):
            res = jax.device_get(p["res"])
        ev = est.post_step(res, None, p["marg_old"], failure_check=True)
        ev["kind"] = "vio" if ev.get("ok", True) else "reboot"
        self._downstream(ev, p["t"])
        return ev

    def flush_frames(self):
        """Drain the overlap-mode pending frame + deferred solve (end of
        stream — call before scoring trajectories)."""
        if self.overlap:
            self._consume_pending()
            self._complete_est()

    def _estimator_and_downstream(self, feats, t: float) -> dict:
        # rolling-shutter per-observation time offset: a feature on pixel row
        # r was captured TR·(r/ROW − ½) after the nominal (middle-row) frame
        # time (projection_td_factor.cpp:18,50-52: TR/ROW·(row − ROW/2)); the
        # solver's correction is pt − (td − toff)·vel, so toff = −offset.
        with self.tracer.span("estimator"):
            ev = self.estimator.process_image(
                feats.ids, feats.pts, feats.vel, feats.uv, t,
                toffs=self._toffs(feats),
            )
        out = dict(ev)
        self._downstream(out, t)
        return out

    def _toffs(self, feats):
        if self.cfg.rolling_shutter and self.cfg.rolling_shutter_tr > 0:
            return -self.cfg.rolling_shutter_tr * (
                np.asarray(feats.uv)[:, 1] / self.cfg.image_height - 0.5
            )
        return 0.0

    def _downstream(self, out: dict, t: float):
        """Post-solve host work of one published frame: trajectories,
        IMU-rate predictor rebase, fast-reloc feedback, keyframe handoff.
        Mutates `out` (sync-mode loop diagnostics ride along)."""
        est = self.estimator
        if self.pose_graph is not None:
            self._maybe_relo_feedback(out)
        if est.solver_flag == NON_LINEAR:
            W = est.W
            p, q = est.p[W].copy(), est.q[W].copy()
            self.trajectory.append((t, p, q))
            self.propagator.rebase(t, p, q, est.v[W], est.ba[W], est.bg[W])
            if self.pose_graph is not None:
                pc, qc = self.pose_graph.correct_pose(p, q, self.sequence)
                self.trajectory_loop.append((t, pc, qc))
            # drain fast-relocalization feedback from the async worker (the
            # reference's relo_buf, estimator_node.cpp:266-291)
            while self._relo_queue:
                self._apply_relo(self._relo_queue.pop(0))
            if out.get("marg_old") and self.pose_graph is not None:
                payload = self._build_keyframe_payload()
                if payload is not None:
                    if self.pg_async:
                        try:
                            self._pg_queue.put_nowait(payload)
                        except queue.Full:
                            # backpressure: drop rather than stall the frame
                            # loop (the reference's buffers simply grow; a
                            # dropped keyframe only coarsens loop recall)
                            self.pg_dropped += 1
                    else:
                        with self.tracer.span("pose_graph"):
                            res = self._pg_process(payload)
                        self.pg_events.append(res)
                        for key in ("scores", "candidate", "verify"):
                            if key in res:
                                out[key] = res[key]
                        if res.get("loop") is not None:
                            out["loop"] = res["loop"]

    def pg_join(self):
        """Drain the pose-graph worker queue and force the pending 4-DoF
        solve (end of stream / before scoring)."""
        self.flush_frames()
        if self.pg_async:
            self._pg_queue.join()
        while self._relo_queue:
            self._apply_relo(self._relo_queue.pop(0))
        if self.pose_graph is not None:
            self.pose_graph.flush()

    def shutdown(self):
        """Stop the pose-graph worker cleanly.  A daemon thread killed at
        interpreter exit mid-device-call aborts the process (pthread
        cancellation inside the runtime) — call this before exiting any
        process that used pg_async."""
        if self.pg_async and self._pg_thread.is_alive():
            self._pg_queue.put(None)
            self._pg_thread.join(timeout=120)
            self.pg_async = False

    def _pg_worker(self):
        while True:
            payload = self._pg_queue.get()
            try:
                if payload is None:
                    return
                with self.tracer.span("pose_graph"):
                    res = self._pg_process(payload)
                self.pg_events.append(res)
            except Exception as e:  # noqa: BLE001 — worker must not die
                self.pg_events.append({"error": repr(e)})
            finally:
                self._pg_queue.task_done()

    # ------------------------------------------------------------- keyframe

    def _build_keyframe_payload(self):
        """Synchronous half of the keyframe hand-off (pubKeyframe,
        visualization.cpp:348-404): the pose-graph ingestion gates
        (pose_graph_node.cpp:24,344-359,385 — skip the first SKIP_FIRST_CNT,
        count-downsample by SKIP_CNT, distance-downsample by SKIP_DIS) and
        the landmark payload, all host numpy over estimator state that the
        next frame will mutate.  The device-side feature work happens in
        `_pg_process` (on the worker thread in async mode)."""
        est = self.estimator

        if self._pg_skip_first < self.cfg.pg_skip_first_cnt:
            self._pg_skip_first += 1
            return None
        if self._pg_skip_count < self.cfg.pg_skip_cnt:
            self._pg_skip_count += 1
            return None
        self._pg_skip_count = 0

        db = est.db
        kf_frame = est.F - 3  # post-slide WINDOW-2: the second-newest frame
        t = est.timestamps[kf_frame]
        p_b = est.p[kf_frame].copy()
        q_b = est.q[kf_frame].copy()
        if np.linalg.norm(p_b - self._pg_last_t) <= self.cfg.pg_skip_dis:
            return None

        # the raw image of exactly that frame's timestamp
        img_kf = next((im for ti, im in self._img_ring
                       if abs(ti - t) < 1e-6), None)
        if img_kf is None:
            return None

        # landmarks observed in that frame with solved depth, anchored
        # earlier (start_frame < WINDOW-2, visualization.cpp:378)
        anchors = db.anchor
        m = (db.used & db.valid[:, kf_frame] & (db.inv_depth > 0)
             & (anchors < kf_frame))
        ks = np.nonzero(m)[0]
        if len(ks) < 10:
            return None
        # world landmarks from their anchor frames, one batched op: only F
        # distinct anchor rotations exist — precompute and index
        Rw = nplie.q2R(est.q)  # [F,3,3] batched numpy, host-side
        Ric = nplie.q2R(est.qic)
        a = anchors[ks]
        d = 1.0 / db.inv_depth[ks]
        rays = np.concatenate(
            [db.pt[ks, a], np.ones((len(ks), 1))], axis=1) * d[:, None]
        Xc = rays @ Ric.T + est.tic
        pts3d = np.einsum("kij,kj->ki", Rw[a], Xc) + est.p[a]

        # pad the landmark payload to a FIXED slot count: every device
        # program in the pose-graph stage then compiles once — a varying
        # landmark count used to recompile brief_describe per keyframe
        # (~2 s each on the remote-attached chip)
        L = self.cfg.max_landmarks
        n = min(len(ks), L)
        pad = lambda a, fill: np.concatenate(
            [a[:n], np.full((L - n,) + a.shape[1:], fill, a.dtype)])
        self._pg_last_t = np.asarray(p_b, float).copy()
        return {
            "t": float(t), "p_b": p_b, "q_b": q_b,
            "pts3d": pad(pts3d, 0.0),
            # padded 2D slots parked far outside the image so nearest-
            # landmark id transfer can never select them
            "pts2d": pad(db.pt[ks, kf_frame], 1e9),
            "uv": pad(db.uv[ks, kf_frame], 0.0),
            "fids": pad(db.ids[ks], -1),
            "n_landmarks": n,
            "tic": est.tic.copy(), "sequence": self.sequence,
            "img": img_kf,
        }

    def _pg_process(self, payload: dict):
        """Device half of the keyframe hand-off + pose-graph ingestion
        (the reference's pose_graph process() thread): FAST/BRIEF features,
        two-view corner depth against the previous keyframe, then
        PoseGraph.add_keyframe (detect → verify → throttled 4-DoF)."""
        t = payload["t"]
        p_b, q_b = payload["p_b"], payload["q_b"]
        img_kf = payload["img"]
        uv = payload["uv"]
        pts3d = payload["pts3d"]

        with self.tracer.span("pg_features"):
            # the whole keyframe feature stage is ONE device program + one
            # small fetch — the previous per-call dispatch/fetch chain paid
            # ~4 tunnel round trips per keyframe and dominated the worker
            Ric = nplie.q2R(self.estimator.qic)
            R_b = nplie.q2R(q_b)
            p_cam = p_b + R_b @ payload["tic"]
            R_wc = R_b @ Ric
            prev = self._prev_kf_fast
            if prev is None:
                zpts = jnp.zeros((256, 2), jnp.float32)
                prev = {"pts": zpts, "desc": jnp.zeros((256, 256), jnp.float32),
                        "valid": jnp.zeros((256,), bool),
                        "p": np.zeros(3, np.float32),
                        "R": np.eye(3, dtype=np.float32)}
            wdesc, fpts, fdesc, fok, X3d, ok3d = self._pg_feat_prog(
                jnp.asarray(img_kf, jnp.float32), jnp.asarray(uv, jnp.float32),
                prev["pts"], prev["desc"], prev["valid"],
                np.asarray(prev["p"], np.float32),
                np.asarray(prev["R"], np.float32),
                np.asarray(p_cam, np.float32), np.asarray(R_wc, np.float32),
            )
            fast_3d, fast_3d_valid = jax.device_get((X3d, ok3d))
            self._prev_kf_fast = {
                "pts": fpts, "desc": fdesc, "valid": fok,
                "p": np.asarray(p_cam, np.float32),
                "R": np.asarray(R_wc, np.float32),
            }

        wvalid = np.arange(len(pts3d)) < payload["n_landmarks"]
        kf = KeyFrame(
            index=-1, stamp=float(t), p_vio=p_b, q_vio=q_b,
            points_3d=pts3d, points_2d_norm=payload["pts2d"],
            window_desc=wdesc, window_valid=jnp.asarray(wvalid),
            fast_pts_norm=fpts, fast_desc=fdesc, fast_valid=fok,
            sequence=payload["sequence"], point_ids=np.asarray(payload["fids"]),
            window_uv=uv,
            image=np.asarray(img_kf) if self.cfg.debug_image else None,
            fast_3d=fast_3d, fast_3d_valid=fast_3d_valid,
        )
        with self.tracer.span("pg_add"):
            res = self.pose_graph.add_keyframe(kf)
        res["stamp"] = float(t)
        loop = res.get("loop")
        if loop is not None and self.cfg.fast_relocalization:
            match = getattr(self.pose_graph, "last_match", None)
            if match is not None:
                if self.pg_async:
                    # hand to the frame loop (the reference's match_points
                    # topic → estimator relo_buf)
                    self._relo_queue.append(match)
                else:
                    self._apply_relo(match)
        if loop is not None and self.cfg.debug_image:
            self.last_loop_image = self._render_loop_match(kf)
        return res

    def _render_loop_match(self, kf):
        """Side-by-side loop-match overlay (keyframe.cpp:416-468's
        DEBUG_IMAGE loop_match), built from the stored keyframe images."""
        from .utils.viz import draw_loop_match

        match = getattr(self.pose_graph, "last_match", None)
        if match is None or kf.image is None:
            return None
        old = self.pose_graph.keyframes[match["old_index"]]
        if old.image is None:
            return None
        # old points arrive as normalized coords: project back to pixels
        pts = np.asarray(match["pts_old"], float)
        rays = np.concatenate([pts, np.ones((len(pts), 1))], axis=1)
        uv_old = np.asarray(self.camera.project(jnp.asarray(
            rays, jnp.float64)))
        # current pixel coords of the matched ids
        id2uv = {int(i): kf.window_uv[k] for k, i in enumerate(kf.point_ids)}
        uv_cur = np.stack([id2uv.get(int(i), np.zeros(2))
                           for i in match["ids"]])
        return draw_loop_match(kf.image, old.image, uv_cur, uv_old)

    # ---------------------------------------------------------- diagnostics

    def debug_track_overlay(self):
        """Tracking overlay of the latest processed frame
        (feature_tracker_node.cpp:167-201); None before the first frame."""
        from .utils.viz import draw_track_overlay

        tr = self.tracker
        if tr.prev_img is None:
            return None
        m = tr.valid
        return draw_track_overlay(np.asarray(tr.prev_img), tr.pts[m],
                                  tr.track_cnt[m], window=self.cfg.window * 2)

    def landmarks_world(self) -> np.ndarray:
        """Current solved landmarks in world coordinates — pubPointCloud's
        payload (visualization.cpp)."""
        est = self.estimator
        db = est.db
        m = db.used & (db.inv_depth > 0)
        ks = np.nonzero(m)[0]
        if len(ks) == 0:
            return np.zeros((0, 3))
        Rw = nplie.q2R(est.q)
        Ric = nplie.q2R(est.qic)
        a = db.anchor[ks]
        d = 1.0 / db.inv_depth[ks]
        rays = np.concatenate(
            [db.pt[ks, a], np.ones((len(ks), 1))], axis=1) * d[:, None]
        Xc = rays @ Ric.T + est.tic
        return np.einsum("kij,kj->ki", Rw[a], Xc) + est.p[a]

    def print_statistics(self) -> str:
        """Periodic textual report (printStatistics, visualization.cpp:
        92-137): pose, extrinsics, td, path length, stage timings."""
        est = self.estimator
        lines = []
        p = est.p[est.W]
        lines.append(f"position: [{p[0]:.3f} {p[1]:.3f} {p[2]:.3f}]  "
                     f"cost: {est.last_cost:.3e}  failures: {est.failures}")
        lines.append(f"extrinsic tic: {np.round(est.tic, 4).tolist()}  "
                     f"qic: {np.round(est.qic, 5).tolist()}  td: {est.td*1e3:.2f} ms")
        if len(self.trajectory) >= 2:
            pp = np.stack([e[1] for e in self.trajectory])
            lines.append(f"path length: {np.linalg.norm(np.diff(pp, axis=0), axis=1).sum():.2f} m "
                         f"over {len(self.trajectory)} frames")
        if self.pose_graph is not None:
            nl = sum(1 for k in self.pose_graph.keyframes if k.loop_index >= 0)
            lines.append(f"pose graph: {len(self.pose_graph.keyframes)} keyframes, "
                         f"{nl} loop edges")
        lines.append(self.tracer.stats.report())
        return "\n".join(lines)

    def _apply_relo(self, match: dict):
        """Route a loop match back through the estimator (the reference's
        match_points → setReloFrame round trip).  The match arms relo
        factors inside the NEXT window solve (estimator.cpp:769-801); the
        refined relative pose comes back in that solve's event and
        `_maybe_relo_feedback` forwards it to the pose graph
        (relo_relative_pose → updateKeyFrameLoop).  Runs on the frame loop
        thread — the estimator is single-threaded state."""
        armed = self.estimator.set_relo_frame(
            match["stamp"], match["ids"], match["pts_old"]
        )
        if armed is not None:
            self._relo_kf_index = match["kf_index"]

    def _maybe_relo_feedback(self, ev: dict):
        relo = ev.get("relo")
        kf_index = getattr(self, "_relo_kf_index", None)
        if relo is not None and relo.get("ok") and kf_index is not None:
            self.pose_graph.update_keyframe_loop(
                kf_index, relo["rel_t"], relo["rel_q"], relo["rel_yaw"]
            )
            self._relo_kf_index = None

    # ---------------------------------------------------------------- admin

    def _restart(self):
        """Stream fault: reboot front-end + estimator, open a new map
        sequence (the reference's restart topic + new_sequence)."""
        self.tracker.reset()
        self.estimator.clear_state()
        self.propagator.reset()
        self._first_image_time = None
        self._pub_count = 0
        self._img_ring.clear()
        self._prev_kf_fast = None
        self._pending = None
        self._est_pending = None
        self._imu_backlog.clear()
        self.sequence += 1

    def write_trajectories(self, path_vio: str, path_loop: str | None = None):
        from .io.euroc import write_tum

        if self.trajectory:
            t, p, q = zip(*self.trajectory)
            write_tum(path_vio, np.asarray(t), np.stack(p), np.stack(q))
        if path_loop and self.trajectory_loop:
            t, p, q = zip(*self.trajectory_loop)
            write_tum(path_loop, np.asarray(t), np.stack(p), np.stack(q))
