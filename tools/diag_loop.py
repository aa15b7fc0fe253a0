"""Standalone pixel-level loop-closure diagnostic.

Renders the textured-room circuit along GROUND-TRUTH poses and feeds the
loop stack directly (FAST + BRIEF -> two-view depth -> retrieval -> PnP
verification), bypassing the VIO estimator entirely.  This isolates the
question "can the loop chain fire on these pixels at all?" from VIO drift:
with perfect geometry, every gate failure is a descriptor/retrieval/verify
problem, and each keyframe's per-gate diagnostics say exactly which.

Usage: python tools/diag_loop.py [--laps 3] [--kf-hz 4] [--seed 0]
Writes results/diag_loop_seed{N}.json with one record per keyframe.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vins_tpu.core import nplie
from vins_tpu.loop.brief import match_descriptors
from vins_tpu.loop.pose_graph import KeyFrame, PoseGraph, extract_keyframe_features
from vins_tpu.loop.verify import triangulate_two_view
from vins_tpu.sim.proxy import TIC, euroc_camera, EUROC_H, EUROC_W
from vins_tpu.sim.render import Room, RoomRenderer
from vins_tpu.sim.synthetic import Trajectory
from vins_tpu.sim.window import R_IC_FORWARD


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--laps", type=float, default=3.0)
    ap.add_argument("--kf-hz", type=float, default=4.0)
    ap.add_argument("--period", type=float, default=16.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--pix-noise", type=float, default=2.0)
    ap.add_argument("--min-loop-num", type=int, default=25)
    ap.add_argument("--tex-k", type=int, default=96)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    cam = euroc_camera()
    traj = Trajectory.circuit(radius=4.0, period=args.period, height=1.0)
    renderer = RoomRenderer(cam, EUROC_H, EUROC_W,
                            room=Room.make(jax.random.PRNGKey(args.seed + 7),
                                           k=args.tex_k),
                            tic=TIC, Ric=np.asarray(R_IC_FORWARD))
    qic = nplie.R2q(np.asarray(R_IC_FORWARD, float))
    pg = PoseGraph(qic, TIC, min_loop_inliers=args.min_loop_num)

    nkey = jax.random.PRNGKey(args.seed + 13)

    @jax.jit
    def noisy(img, key):
        return jnp.clip(img + args.pix_noise
                        * jax.random.normal(key, img.shape, img.dtype),
                        0.0, 255.0)

    n_kf = int(args.laps * args.period * args.kf_hz)
    Ric = np.asarray(R_IC_FORWARD, float)
    prev = None
    records = []
    t_start = time.perf_counter()
    for i in range(n_kf):
        t = 1.0 + i / args.kf_hz
        p_b = np.asarray(traj.pos_fn(jnp.float64(t)), float)
        q_b = np.asarray(traj.q(jnp.float64(t)), float)
        img = renderer.render_device(p_b, q_b)
        if args.pix_noise > 0:
            img = noisy(img, jax.random.fold_in(nkey, i))

        fpts, fdesc, fok = extract_keyframe_features(img, cam)
        # two-view depth vs the previous keyframe at GT camera poses
        R_b = nplie.q2R(q_b)
        p_cam = p_b + R_b @ TIC
        R_wc = R_b @ Ric
        fast_3d = fast_3d_valid = None
        if prev is not None:
            pmidx, pmok = match_descriptors(fdesc, fok,
                                            prev["desc"], prev["valid"])
            x_prev = jnp.take(prev["pts"], pmidx, axis=0)
            X3, okt = jax.device_get(triangulate_two_view(
                np.asarray(p_cam, np.float32), np.asarray(R_wc, np.float32),
                fpts, prev["p"], prev["R"], x_prev, pmok))
            fast_3d, fast_3d_valid = X3, okt
        prev = {"pts": fpts, "desc": fdesc, "valid": fok,
                "p": np.asarray(p_cam, np.float32),
                "R": np.asarray(R_wc, np.float32)}

        kf = KeyFrame(
            index=-1, stamp=t, p_vio=p_b, q_vio=q_b,
            points_3d=np.zeros((0, 3)), points_2d_norm=np.zeros((0, 2)),
            window_desc=jnp.zeros((0, 256), jnp.float32),
            window_valid=jnp.zeros((0,), bool),
            fast_pts_norm=fpts, fast_desc=fdesc, fast_valid=fok,
            sequence=1, fast_3d=fast_3d, fast_3d_valid=fast_3d_valid,
        )
        res = pg.add_keyframe(kf)
        rec = {
            "i": i, "t": t,
            "n_fast": int(jax.device_get(fok).sum()),
            "n_fast3d": (int(np.asarray(fast_3d_valid).sum())
                         if fast_3d_valid is not None else 0),
            "scores": [round(float(s), 4) for s in res.get("scores", [])],
            "score_ids": [int(x) for x in res.get("score_idx", [])],
            "candidate": res.get("candidate"),
            "verify": res.get("verify"),
            "loop": res.get("loop"),
        }
        records.append(rec)
        if res.get("loop") is not None or i % 20 == 0:
            print(f"kf {i:4d} t={t:6.2f} fast={rec['n_fast']:3d} "
                  f"3d={rec['n_fast3d']:3d} scores={rec['scores'][:3]} "
                  f"cand={rec['candidate']} verify={rec['verify']} "
                  f"loop={rec['loop']}", flush=True)

    wall = time.perf_counter() - t_start
    n_loops = sum(1 for r in records if r["loop"] is not None)
    summary = {
        "n_keyframes": n_kf, "laps": args.laps, "kf_hz": args.kf_hz,
        "min_loop_num": args.min_loop_num, "pix_noise": args.pix_noise,
        "n_loops": n_loops, "wall_s": round(wall, 1),
        "gates": {
            "no_candidate": sum(1 for r in records
                                if r["candidate"] is None and r["i"] > 5),
            "desc_matches": sum(1 for r in records
                                if str(r.get("verify", "")).startswith("desc")),
            "pnp": sum(1 for r in records
                       if str(r.get("verify", "")).startswith("pnp")),
            "relative": sum(1 for r in records
                            if str(r.get("verify", "")).startswith("relative")),
            "ok": n_loops,
        },
    }
    print(json.dumps(summary))
    out = args.out or f"results/diag_loop_seed{args.seed}.json"
    d = os.path.dirname(out)
    if d:
        os.makedirs(d, exist_ok=True)
    with open(out, "w") as f:
        json.dump({"summary": summary, "records": records}, f, indent=1)


if __name__ == "__main__":
    main()
