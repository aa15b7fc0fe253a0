"""Feature tracker — the image front-end pipeline.

TPU-native re-expression of the reference's `FeatureTracker::readImage`
(feature_tracker/src/feature_tracker.cpp:81-167):

  CLAHE → pyramidal LK on all slots → border/status rejection →
  [publish frames only:] essential-RANSAC outlier rejection on undistorted
  points (rejectWithF, :169-202) → grid-NMS top-up detection (setMask +
  goodFeaturesToTrack, :36-69, :149) → undistortion + per-id normalized-plane
  velocity (undistortedPoints, :258-306).

All stages run as ONE fused device program per frame with the tracker state
device-resident (frontend/fused.py); the host keeps numpy mirrors for the
estimator wire format and slot inspection.  Fixed MAX_CNT feature slots with
validity masks; global monotonically increasing feature ids (updateID,
feature_tracker_node.cpp:103-111).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .fused import make_front_state, make_front_step, unpack_front_blob


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
        image_shape: tuple[int, int] | None = None,
    ):
        self.cam = camera
        self.M = max_cnt
        self.dtype = dtype
        self.mask = None if mask is None else np.asarray(mask, bool)
        self._step = make_front_step(
            camera, max_cnt, min_dist, f_threshold, equalize, focal,
            win=win, levels=levels, fov_mask=self.mask, dtype=dtype,
        )
        self._shape = image_shape  # lazily set from the first image
        self._state = None

        # host mirrors (refreshed every frame from the batched fetch)
        self.pts = np.zeros((max_cnt, 2))
        self.ids = np.full(max_cnt, -1, np.int64)
        self.track_cnt = np.zeros(max_cnt, np.int64)
        self.valid = np.zeros(max_cnt, bool)
        self.prev_time = None
        self.n_id = 0
        self._has_prev = False
        self._key = jax.random.PRNGKey(42)

    @property
    def prev_img(self):
        return None if not self._has_prev else self._state.prev_img

    def read_image(self, img: np.ndarray, t: float, publish: bool = True) -> FrameFeatures | None:
        """Process one frame; returns published features (or None when not a
        publish frame — the caller implements the FREQ controller,
        feature_tracker_node.cpp:51-62)."""
        if self._state is None:
            h, w = (img.shape if self._shape is None else self._shape)
            self._state = make_front_state(self.M, h, w, self.dtype)

        dt = (t - self.prev_time) if self.prev_time is not None else 0.0
        self._key, sub = jax.random.split(self._key)
        self._state, blob = self._step(
            self._state, img, np.float32(dt), sub, np.int32(self.n_id),
            publish=bool(publish), has_prev=self._has_prev,
        )
        self.prev_time = t
        self._has_prev = True
        if not publish:
            # track-only frames never touch the host: ids are only allocated
            # on publish frames (top-up detection runs there, matching the
            # reference's PUB_THIS_FRAME gating), so the host mirrors can
            # lag until the next publish — zero round trips here
            return None
        # ONE packed fetch per published frame (a tuple of small arrays
        # costs one tunnel round trip EACH; the blob costs one total)
        un, vel, pts, pub_mask, valid, cnt, ids, n_new = unpack_front_blob(
            jax.device_get(blob), self.M)
        self.pts = np.asarray(pts, float)
        self.valid = valid
        self.track_cnt = cnt.astype(np.int64)
        self.ids = ids.astype(np.int64)
        self.n_id += int(n_new)
        return FrameFeatures(
            ids=self.ids[pub_mask].copy(),
            pts=np.asarray(un, float)[pub_mask],
            vel=np.asarray(vel, float)[pub_mask],
            uv=self.pts[pub_mask].copy(),
        )

    def read_image_device(self, img, t: float, publish: bool = True):
        """Overlap-mode half of read_image: dispatch the fused front step
        and return the DEVICE blob without fetching (an async host copy is
        started so a later `adopt_blob` is ~free).  Track-only frames return
        None.  The caller owns the pipeline ordering (pipeline.py
        `_process_image_overlapped`)."""
        if self._state is None:
            h, w = (img.shape if self._shape is None else self._shape)
            self._state = make_front_state(self.M, h, w, self.dtype)
        dt = (t - self.prev_time) if self.prev_time is not None else 0.0
        self._key, sub = jax.random.split(self._key)
        self._state, blob = self._step(
            self._state, img, np.float32(dt), sub, np.int32(self.n_id),
            publish=bool(publish), has_prev=self._has_prev,
        )
        self.prev_time = t
        self._has_prev = True
        if not publish:
            return None
        try:
            blob.copy_to_host_async()
        except (AttributeError, NotImplementedError):  # platform-dependent
            pass
        return blob

    def adopt_blob(self, blob) -> FrameFeatures:
        """Fetch + unpack a deferred front blob into host mirrors and the
        estimator wire format (the fetch half of read_image)."""
        un, vel, pts, pub_mask, valid, cnt, ids, n_new = unpack_front_blob(
            jax.device_get(blob), self.M)
        self.pts = np.asarray(pts, float)
        self.valid = valid
        self.track_cnt = cnt.astype(np.int64)
        self.ids = ids.astype(np.int64)
        self.n_id += int(n_new)
        return FrameFeatures(
            ids=self.ids[pub_mask].copy(),
            pts=np.asarray(un, float)[pub_mask],
            vel=np.asarray(vel, float)[pub_mask],
            uv=self.pts[pub_mask].copy(),
        )

    def reset(self):
        self._state = None
        self._has_prev = False
        self.valid[:] = False
        self.ids[:] = -1
        self.track_cnt[:] = 0
        self.prev_time = None
