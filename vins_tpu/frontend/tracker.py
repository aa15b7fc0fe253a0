"""Feature tracker — the image front-end pipeline.

TPU-native re-expression of the reference's `FeatureTracker::readImage`
(feature_tracker/src/feature_tracker.cpp:81-167):

  CLAHE → pyramidal LK on all slots → border/status rejection →
  [publish frames only:] essential-RANSAC outlier rejection on undistorted
  points (rejectWithF, :169-202) → grid-NMS top-up detection (setMask +
  goodFeaturesToTrack, :36-69, :149) → undistortion + per-id normalized-plane
  velocity (undistortedPoints, :258-306).

Fixed MAX_CNT feature slots with validity masks; heavy stages run jitted on
device, slot bookkeeping on host.  Global monotonically increasing feature
ids (updateID, feature_tracker_node.cpp:103-111).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..init.relative_pose import solve_relative_pose
from .detect import detect_grid, shi_tomasi_response
from .image import clahe
from .klt import lk_pyramidal


class FrameFeatures(NamedTuple):
    """Wire format toward the estimator (feature_tracker_node.cpp:116-157:
    only features with track_cnt > 1 carry velocity and are published)."""

    ids: np.ndarray  # [K]
    pts: np.ndarray  # [K,2] normalized plane
    vel: np.ndarray  # [K,2] normalized-plane velocity
    uv: np.ndarray  # [K,2] raw pixels


class FeatureTracker:
    def __init__(
        self,
        camera,
        max_cnt: int = 150,
        min_dist: int = 30,
        f_threshold: float = 1.0,
        equalize: bool = True,
        focal: float = 460.0,
        win: int = 21,
        levels: int = 3,
        mask: np.ndarray | None = None,
        dtype=jnp.float32,
    ):
        self.cam = camera
        self.M = max_cnt
        self.min_dist = min_dist
        self.f_threshold = f_threshold
        self.equalize = equalize
        self.focal = focal
        self.win = win
        self.levels = levels
        self.dtype = dtype
        # optional field-of-view mask (the reference's fisheye mask image,
        # feature_tracker.cpp:95-100 + parameters.cpp fisheye path): features
        # tracked into (or detected in) masked-out pixels are rejected
        self.mask = None if mask is None else np.asarray(mask, bool)

        self.pts = np.zeros((max_cnt, 2))
        self.ids = np.full(max_cnt, -1, np.int64)
        self.track_cnt = np.zeros(max_cnt, np.int64)
        self.valid = np.zeros(max_cnt, bool)
        self.prev_img = None
        # previous published frame's normalized points, slot-aligned: a slot
        # carries the same feature until it is freed/reassigned, so velocity
        # is a masked array op — no per-feature dict (the reference's
        # cur_un_pts_map, feature_tracker.cpp:212-257)
        self.prev_un_pts = np.zeros((max_cnt, 2))
        self.prev_ids = np.full(max_cnt, -1, np.int64)
        self.prev_time = None
        self.n_id = 0
        self._key = jax.random.PRNGKey(42)
        self._lift = jax.jit(lambda uv: camera.lift(uv))

    def read_image(self, img: np.ndarray, t: float, publish: bool = True) -> FrameFeatures | None:
        """Process one frame; returns published features (or None when not a
        publish frame — the caller implements the FREQ controller,
        feature_tracker_node.cpp:51-62)."""
        im = jnp.asarray(img, self.dtype)
        if self.equalize:
            im = clahe(im)

        # --- track ---------------------------------------------------------
        if self.prev_img is not None and self.valid.any():
            npdt = np.float32 if self.dtype == jnp.float32 else np.float64
            new_pts, status = jax.device_get(lk_pyramidal(
                self.prev_img, im,
                np.asarray(self.pts, npdt), self.valid,
                win=self.win, levels=self.levels,
            ))
            self.pts = np.array(new_pts, float)
            self.valid &= status
            if self.mask is not None:
                xi = np.clip(self.pts[:, 0].astype(int), 0, self.mask.shape[1] - 1)
                yi = np.clip(self.pts[:, 1].astype(int), 0, self.mask.shape[0] - 1)
                self.valid &= self.mask[yi, xi]
            self.track_cnt[self.valid] += 1

        if publish:
            self._reject_with_f()
            self._detect_new(im)

        # --- undistort + velocity ------------------------------------------
        un = np.full((self.M, 2), np.nan)
        if self.valid.any():
            npdt = np.float32 if self.dtype == jnp.float32 else np.float64
            rays = jax.device_get(self._lift(np.asarray(self.pts, npdt)))
            un = rays[:, :2] / rays[:, 2:3]
        vel = np.zeros((self.M, 2))
        dt = (t - self.prev_time) if self.prev_time is not None else None
        if dt:
            same = self.valid & (self.prev_ids == self.ids) & (self.prev_ids >= 0)
            vel[same] = (un[same] - self.prev_un_pts[same]) / dt

        self.prev_img = im
        self.prev_time = t
        out = None
        if publish:
            pub = self.valid & (self.track_cnt > 1)
            out = FrameFeatures(
                ids=self.ids[pub].copy(),
                pts=un[pub].copy(),
                vel=vel[pub].copy(),
                uv=self.pts[pub].copy(),
            )
        # velocity is frame-to-frame (undistortedPoints runs every processed
        # frame, feature_tracker.cpp:212-257), not publish-to-publish
        self.prev_un_pts = un.copy()
        self.prev_ids = np.where(self.valid, self.ids, -1)
        return out

    # ---------------------------------------------------------------- stages

    def _reject_with_f(self):
        """Essential-matrix RANSAC on undistorted points (rejectWithF,
        feature_tracker.cpp:169-202; the reference runs 8-point FM_RANSAC on
        a 460-focal virtual pinhole — threshold F_THRESHOLD px / 460)."""
        m = self.valid & (self.track_cnt > 1)
        if m.sum() < 15 or self.prev_img is None:
            return
        idx = np.nonzero(m)[0]
        npdt = np.float32 if self.dtype == jnp.float32 else np.float64
        cur = jax.device_get(self._lift(np.asarray(self.pts[idx], npdt)))
        cur = cur[:, :2] / cur[:, 2:3]
        same = (self.prev_ids[idx] == self.ids[idx]) & (self.prev_ids[idx] >= 0)
        prev = np.where(same[:, None], self.prev_un_pts[idx], np.nan)
        ok = ~np.isnan(prev[:, 0])
        if ok.sum() < 15:
            return
        # pad to the slot shape for the fixed-shape RANSAC
        M = self.M
        x1 = np.zeros((M, 2))
        x2 = np.zeros((M, 2))
        v = np.zeros(M, bool)
        x1[: ok.sum()] = prev[ok]
        x2[: ok.sum()] = cur[ok]
        v[: ok.sum()] = True
        self._key, sub = jax.random.split(self._key)
        rel = solve_relative_pose(
            x1, x2, v, sub, thresh=self.f_threshold / self.focal,
        )
        rel = jax.device_get(rel)
        if not bool(rel.ok):
            return
        inl = np.asarray(rel.inliers)[: ok.sum()]
        bad = idx[ok][~inl]
        self.valid[bad] = False

    def _detect_new(self, im):
        """Top-up to MAX_CNT via Shi-Tomasi + grid NMS."""
        n_free = self.M - int(self.valid.sum())
        if n_free <= 0:
            return
        resp = shi_tomasi_response(im)
        if self.mask is not None:
            resp = jnp.where(jnp.asarray(self.mask), resp, -jnp.inf)
        npdt = np.float32 if self.dtype == jnp.float32 else np.float64
        pts_new, ok = jax.device_get(detect_grid(
            resp, np.asarray(self.pts, npdt), self.valid,
            max_new=self.M, cell=self.min_dist,
        ))
        free = np.nonzero(~self.valid)[0]
        take = min(n_free, int(ok.sum()))
        slots = free[:take]
        js = np.nonzero(ok)[0][:take]
        self.pts[slots] = pts_new[js]
        self.ids[slots] = self.n_id + np.arange(take)
        self.n_id += take
        self.track_cnt[slots] = 1
        self.valid[slots] = True

    def reset(self):
        self.valid[:] = False
        self.ids[:] = -1
        self.track_cnt[:] = 0
        self.prev_img = None
        self.prev_un_pts[:] = 0
        self.prev_ids[:] = -1
        self.prev_time = None
