"""The whole per-frame front-end as ONE device program.

`FeatureTracker.read_image` used to run CLAHE, pyramidal LK, essential-RANSAC
rejection, Shi-Tomasi top-up, undistortion and velocity as separate jitted
calls with host bookkeeping in between — ~8 dispatches and ~10 transfers per
frame.  Each dispatch/transfer is a round trip to the device (tens of ms on
a remote-attached chip), so the stages are fused here into a single jit with
the tracker state living ON the device between frames: per frame one call +
one batched fetch.

Slot bookkeeping that was host-side Python (free-slot assignment, id
allocation) becomes rank arithmetic: candidates are ranked by detector
response, free slots by index, and candidate k fills the k-th free slot with
id = n_id + k.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..init.relative_pose import solve_relative_pose
from .detect import detect_grid, shi_tomasi_response
from .image import clahe
from .klt import lk_pyramidal


class FrontState(NamedTuple):
    pts: jax.Array       # [M,2] pixel positions
    valid: jax.Array     # [M] bool
    track_cnt: jax.Array  # [M] int32
    ids: jax.Array       # [M] int32 (−1 = free)
    prev_un: jax.Array   # [M,2] previous frame's normalized points
    prev_ids: jax.Array  # [M] ids at the previous frame (−1 = invalid)
    prev_img: jax.Array  # [H,W] previous CLAHE'd image


def make_front_state(max_cnt: int, h: int, w: int, dtype=jnp.float32):
    M = max_cnt
    return FrontState(
        pts=jnp.zeros((M, 2), dtype),
        valid=jnp.zeros((M,), bool),
        track_cnt=jnp.zeros((M,), jnp.int32),
        ids=jnp.full((M,), -1, jnp.int32),
        prev_un=jnp.zeros((M, 2), dtype),
        prev_ids=jnp.full((M,), -1, jnp.int32),
        prev_img=jnp.zeros((h, w), dtype),
    )


def make_front_step(camera, max_cnt: int, min_dist: int, f_threshold: float,
                    equalize: bool, focal: float, win: int = 21,
                    levels: int = 3, fov_mask=None, dtype=jnp.float32):
    """Returns jitted `step(state, img, dt, key, n_id, publish, has_prev)`
    → (new_state, (un, vel, pub_mask, n_new)).  `publish`/`has_prev` are
    static (≤4 program variants)."""
    M = max_cnt
    mask_const = None if fov_mask is None else jnp.asarray(fov_mask, bool)

    def lift_norm(pts):
        rays = camera.lift(pts)
        return rays[:, :2] / rays[:, 2:3]

    @functools.partial(jax.jit, static_argnames=("publish", "has_prev"))
    def step(state: FrontState, img, dt, key, n_id,
             publish: bool = True, has_prev: bool = True):
        im = jnp.asarray(img, dtype)
        if equalize:
            im = clahe(im)

        pts, valid, track_cnt, ids = (state.pts, state.valid,
                                      state.track_cnt, state.ids)

        if has_prev:
            new_pts, status = lk_pyramidal(state.prev_img, im, pts, valid,
                                           win=win, levels=levels)
            pts = new_pts
            valid = valid & status
            if mask_const is not None:
                xi = jnp.clip(pts[:, 0].astype(jnp.int32), 0,
                              mask_const.shape[1] - 1)
                yi = jnp.clip(pts[:, 1].astype(jnp.int32), 0,
                              mask_const.shape[0] - 1)
                valid = valid & mask_const[yi, xi]
            track_cnt = jnp.where(valid, track_cnt + 1, track_cnt)

        n_new = jnp.asarray(0, jnp.int32)
        if publish:
            if has_prev:
                # essential-RANSAC rejection on undistorted points
                # (rejectWithF, feature_tracker.cpp:169-202), slot-aligned
                un_cur = lift_norm(pts)
                m = (valid & (track_cnt > 1) & (state.prev_ids == ids)
                     & (state.prev_ids >= 0))
                rel = solve_relative_pose(
                    state.prev_un.astype(dtype), un_cur.astype(dtype), m,
                    key, thresh=f_threshold / focal)
                enough = jnp.sum(m) >= 15
                drop = enough & rel.ok & m & ~rel.inliers
                valid = valid & ~drop

            # Shi-Tomasi grid top-up (setMask + goodFeaturesToTrack)
            resp = shi_tomasi_response(im)
            if mask_const is not None:
                resp = jnp.where(mask_const, resp, -jnp.inf)
            cand, okc = detect_grid(resp, pts, valid, max_new=M,
                                    cell=min_dist)
            free = ~valid
            order = jnp.argsort(~okc)          # ok candidates first, ranked
            cand_sorted = cand[order]
            slot_rank = jnp.cumsum(free) - 1   # rank of each free slot
            n_take = jnp.minimum(jnp.sum(free), jnp.sum(okc)).astype(jnp.int32)
            newly = free & (slot_rank < n_take)
            src = jnp.clip(slot_rank, 0, M - 1)
            pts = jnp.where(newly[:, None], cand_sorted[src], pts)
            ids = jnp.where(newly, n_id + slot_rank.astype(jnp.int32), ids)
            track_cnt = jnp.where(newly, 1, track_cnt)
            valid = valid | newly
            n_new = n_take

        un = lift_norm(pts)
        same = valid & (state.prev_ids == ids) & (state.prev_ids >= 0)
        vel = jnp.where((same & (dt > 0))[:, None],
                        (un - state.prev_un) / jnp.maximum(dt, 1e-9), 0.0)

        pub_mask = valid & (track_cnt > 1)
        new_state = FrontState(
            pts=pts, valid=valid, track_cnt=track_cnt, ids=ids,
            prev_un=un.astype(dtype),
            prev_ids=jnp.where(valid, ids, -1),
            prev_img=im,
        )
        # ONE packed f32 output blob: on a remote-attached chip every
        # fetched array pays a full round trip (~30 ms measured through the
        # tunnel) — eight small arrays cost 8 RTTs, one blob costs one.
        # Integers ride along bitcast to f32 (host views them back).
        as_f = lambda a: jax.lax.bitcast_convert_type(
            a.astype(jnp.int32), jnp.float32)
        blob = jnp.concatenate([
            un.astype(jnp.float32).ravel(),          # [2M]
            vel.astype(jnp.float32).ravel(),         # [2M]
            pts.astype(jnp.float32).ravel(),         # [2M]
            pub_mask.astype(jnp.float32),            # [M]
            valid.astype(jnp.float32),               # [M]
            as_f(track_cnt),                         # [M]
            as_f(ids),                               # [M]
            as_f(n_new[None]),                       # [1]
        ])
        return new_state, blob

    return step


def unpack_front_blob(blob: "np.ndarray", M: int):
    """Host-side decode of the packed step output (same layout as above)."""
    import numpy as np

    b = np.asarray(blob)
    o = 0

    def take(n):
        nonlocal o
        out = b[o:o + n]
        o += n
        return out

    un = take(2 * M).reshape(M, 2)
    vel = take(2 * M).reshape(M, 2)
    pts = take(2 * M).reshape(M, 2)
    pub_mask = take(M) > 0.5
    valid = take(M) > 0.5
    track_cnt = take(M).view(np.int32)[:M]
    ids = take(M).view(np.int32)[:M]
    n_new = int(take(1).view(np.int32)[0])
    return un, vel, pts, pub_mask, valid, track_cnt, ids, n_new
