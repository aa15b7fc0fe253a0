"""Loop-closure tests: FAST/BRIEF stability, retrieval ranking, PnP-RANSAC
with outliers, 4-DoF pose-graph correction, and the full PoseGraph logic on
a fabricated drift-then-revisit scenario."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vins_tpu.core import lie
from vins_tpu.loop.brief import (brief_describe, fast_detect, hamming_matrix,
                                 match_descriptors, smooth_for_brief)
from vins_tpu.loop.pose_graph import KeyFrame, PoseGraph
from vins_tpu.loop.optimize4dof import GraphArrays, optimize_4dof, drift_from
from vins_tpu.loop.retrieval import KeyframeDB, pick_loop_candidate
from vins_tpu.loop.verify import pnp_ransac

from tests.test_frontend import smooth_texture, shifted


def rand_desc(key, n):
    """Random ±1 BRIEF-like descriptors."""
    return jnp.where(jax.random.bernoulli(key, 0.5, (n, 256)), 1.0, -1.0)


def test_fast_brief_stability():
    img = smooth_texture(jax.random.PRNGKey(0), scale=4)
    pts, ok = fast_detect(img, max_pts=128, threshold=10.0)
    assert int(ok.sum()) > 30
    sm = smooth_for_brief(img)
    d0 = brief_describe(sm, pts)

    img1 = shifted(img, -1.5, -0.8)  # contents move (+1.5, +0.8)
    sm1 = smooth_for_brief(img1)
    d1 = brief_describe(sm1, pts + jnp.asarray([1.5, 0.8], img.dtype))
    same = jnp.einsum("nb,nb->n", d0, d1)
    ham_same = 0.5 * (256 - same)
    m = np.array(ok)
    assert float(np.median(np.array(ham_same)[m])) < 40.0  # same corner ⇒ close
    # distance between different corners is near 128 (random)
    H = np.array(hamming_matrix(d0, d0))
    off = H[np.triu_indices_from(H, 5)]
    assert off.mean() > 90.0


def test_retrieval_ranks_revisit():
    db = KeyframeDB(capacity=64, pts_per_kf=64)
    keys = jax.random.split(jax.random.PRNGKey(1), 80)
    descs = [rand_desc(keys[i], 64) for i in range(60)]
    for d in descs:
        db.add(d, jnp.ones(64, bool))

    # query = noisy copy of keyframe 3 (flip 15 bits/descriptor)
    noise = jax.random.bernoulli(keys[70], 15.0 / 256.0, (64, 256))
    q = jnp.where(noise, -descs[3], descs[3])
    idx, scores = db.query(q, jnp.ones(64, bool), exclude_last=50)
    assert idx[0] == 3, (idx, scores)
    assert scores[0] > 0.9
    cand = pick_loop_candidate(idx, scores, accept=0.35, second=-1.0)
    assert cand is not None

    # unrelated query scores low everywhere
    q2 = rand_desc(keys[71], 64)
    _, s2 = db.query(q2, jnp.ones(64, bool), exclude_last=50)
    assert s2[0] < 0.1


def test_pnp_ransac_with_outliers():
    key = jax.random.PRNGKey(2)
    N = 80
    X = jax.random.uniform(key, (N, 3), jnp.float64, -4.0, 4.0) + jnp.asarray([0, 0, 8.0])
    p_gt = jnp.asarray([0.4, -0.3, 0.2], jnp.float64)
    q_gt = lie.qexp(jnp.asarray([0.05, -0.1, 0.15], jnp.float64))
    Pc = jax.vmap(lambda Xl: lie.qrotate(lie.qconj(q_gt), Xl - p_gt))(X)
    x = Pc[:, :2] / Pc[:, 2:3]
    # 30% outliers
    k1, k2 = jax.random.split(key)
    out_mask = jax.random.bernoulli(k1, 0.3, (N,))
    x = jnp.where(out_mask[:, None], x + jax.random.normal(k2, x.shape) * 0.2, x)

    res = pnp_ransac(X, x, jnp.ones(N, bool),
                     jnp.zeros(3, jnp.float64),
                     jnp.asarray([1.0, 0, 0, 0], jnp.float64),
                     jax.random.PRNGKey(3), min_inliers=25)
    assert bool(res.ok)
    assert np.linalg.norm(np.array(res.p - p_gt)) < 1e-6
    inl = np.array(res.inliers)
    assert (inl == ~np.array(out_mask)).mean() > 0.95


def _circle_graph(K=40, drift_yaw=6.0, drift_t=(0.3, -0.2, 0.1)):
    """Ground-truth circle; VIO poses drift linearly; last kf revisits kf 0."""
    ang = np.linspace(0, 2 * np.pi, K)
    t_gt = np.stack([4 * np.cos(ang), 4 * np.sin(ang), np.zeros(K)], 1)
    yaw_gt = np.degrees(ang + np.pi / 2)
    frac = np.linspace(0, 1, K)
    yaw_vio = yaw_gt + drift_yaw * frac
    t_vio = t_gt.copy()
    for i in range(K):
        R = np.array(lie.ypr2R(jnp.asarray([drift_yaw * frac[i], 0.0, 0.0])))
        t_vio[i] = R @ t_gt[i] + np.asarray(drift_t) * frac[i]
    return t_gt, yaw_gt, t_vio, yaw_vio


def test_optimize_4dof_closes_loop():
    K = 40
    t_gt, yaw_gt, t_vio, yaw_vio = _circle_graph(K)
    Kcap = 64
    g = GraphArrays(
        t_vio=jnp.zeros((Kcap, 3)).at[:K].set(t_vio),
        ypr_vio=jnp.zeros((Kcap, 3)).at[:K, 0].set(yaw_vio),
        yaw=jnp.zeros((Kcap,)).at[:K].set(yaw_vio),
        t=jnp.zeros((Kcap, 3)).at[:K].set(t_vio),
        loop_to=jnp.full((Kcap,), -1, jnp.int32),
        loop_t=jnp.zeros((Kcap, 3)),
        loop_yaw=jnp.zeros((Kcap,)),
        used=jnp.zeros((Kcap,), bool).at[:K].set(True),
        fixed=jnp.zeros((Kcap,), bool).at[0].set(True),
    )
    # loop edges: the last few keyframes re-observe kf 0 with TRUE relative
    # poses (a real revisit produces several consecutive loop closures —
    # a single edge only splits the correction against the seq-edge chain)
    R0 = np.array(lie.ypr2R(jnp.asarray([yaw_gt[0], 0.0, 0.0])))
    for j in range(1, 6):
        rel_t = R0.T @ (t_gt[K - j] - t_gt[0])
        rel_yaw = yaw_gt[K - j] - yaw_gt[0]
        g = g._replace(
            loop_to=g.loop_to.at[K - j].set(0),
            loop_t=g.loop_t.at[K - j].set(jnp.asarray(rel_t)),
            loop_yaw=g.loop_yaw.at[K - j].set(rel_yaw),
        )
    g2 = optimize_4dof(g, iters=8)
    err_before = np.linalg.norm(t_vio[K - 1] - t_gt[K - 1])
    err_after = np.linalg.norm(np.array(g2.t[K - 1]) - t_gt[K - 1])
    assert err_before > 0.25
    assert err_after < 0.35 * err_before, (err_before, err_after)
    ydrift, Rd, td = drift_from(g2, K - 1)
    # the drift estimate must recover most of the injected −6° yaw
    assert -6.5 < float(ydrift) < -3.5, float(ydrift)


def test_optimize_4dof_analytic_matches_jacfwd():
    """The analytic per-edge-Jacobian assembly (the scalable path) must
    reproduce the full-parameter jacfwd reference bit-for-nearly-bit —
    including pitch/roll coupling, the Huber loop weight and fixed masks."""
    rng = np.random.default_rng(3)
    K, Kcap = 200, 256
    t_vio = np.cumsum(rng.normal(0, 0.3, (K, 3)), axis=0)
    ypr = rng.normal(0, 15, (K, 3))  # nonzero pitch/roll exercise A_i
    g = GraphArrays(
        t_vio=jnp.zeros((Kcap, 3)).at[:K].set(t_vio),
        ypr_vio=jnp.zeros((Kcap, 3)).at[:K].set(ypr),
        yaw=jnp.zeros((Kcap,)).at[:K].set(ypr[:, 0] + rng.normal(0, 2, K)),
        t=jnp.zeros((Kcap, 3)).at[:K].set(t_vio + rng.normal(0, 0.1, (K, 3))),
        loop_to=jnp.full((Kcap,), -1, jnp.int32),
        loop_t=jnp.zeros((Kcap, 3)),
        loop_yaw=jnp.zeros((Kcap,)),
        used=jnp.zeros((Kcap,), bool).at[:K].set(True),
        fixed=jnp.zeros((Kcap,), bool).at[0].set(True),
    )
    # a handful of loop edges, some with large residuals (Huber active)
    for j, to in [(150, 3), (180, 10), (199, 0), (120, 60)]:
        g = g._replace(
            loop_to=g.loop_to.at[j].set(to),
            loop_t=g.loop_t.at[j].set(jnp.asarray(rng.normal(0, 1.0, 3))),
            loop_yaw=g.loop_yaw.at[j].set(rng.normal(0, 5)),
        )
    ga = optimize_4dof(g, iters=5, method="analytic")
    gj = optimize_4dof(g, iters=5, method="jacfwd")
    np.testing.assert_allclose(np.array(ga.yaw), np.array(gj.yaw),
                               atol=1e-7, rtol=1e-7)
    np.testing.assert_allclose(np.array(ga.t), np.array(gj.t),
                               atol=1e-7, rtol=1e-7)


def _fabricated_keyframe(index, place_key, p_body, q_body, points_w, qic, tic,
                         sequence=1, n_pts=64):
    """KeyFrame whose descriptors are deterministic per landmark id, so a
    revisit of the same place matches exactly."""
    desc = rand_desc(place_key, n_pts)
    R_b = np.array(lie.q2R(jnp.asarray(q_body)))
    Ric = np.array(lie.q2R(jnp.asarray(qic)))
    p_c = np.asarray(p_body) + R_b @ np.asarray(tic)
    R_c = R_b @ Ric
    Pc = (points_w - p_c) @ R_c
    uv = Pc[:, :2] / Pc[:, 2:3]
    return KeyFrame(
        index=index, stamp=float(index), p_vio=p_body, q_vio=q_body,
        points_3d=points_w, points_2d_norm=uv,
        window_desc=desc, window_valid=jnp.ones(n_pts, bool),
        fast_pts_norm=jnp.asarray(uv), fast_desc=desc,
        fast_valid=jnp.ones(n_pts, bool), sequence=sequence,
    )


def test_pose_graph_end_to_end_drift_correction():
    qic = np.array([1.0, 0, 0, 0])
    tic = np.zeros(3)
    key = jax.random.PRNGKey(7)
    kp, kd = jax.random.split(key)
    points_A = np.array(jax.random.uniform(kp, (64, 3), jnp.float64, -3.0, 3.0)) + np.array([0, 0, 8.0])

    pg = PoseGraph(qic, tic, capacity=64, db=KeyframeDB(64, 64), exclude_last=3)

    # drift grows linearly with keyframe index (a realistic VIO error model;
    # a sudden jump would rightly be resisted by the sequential edges).
    # Magnitudes keep loop residuals near Huber's quadratic region — with a
    # heavily-drifted chain the 4-DoF objective (faithful to the reference)
    # correctly trusts odometry more and splits the correction.
    dR_full, dt_full = 1.0, np.array([0.06, -0.04, 0.03])

    def drifted(p_true, q_true, frac):
        R = np.array(lie.ypr2R(jnp.asarray([dR_full * frac, 0.0, 0.0])))
        p = R @ np.asarray(p_true) + dt_full * frac
        q = np.array(lie.qmul(lie.R2q(jnp.asarray(R)), jnp.asarray(q_true)))
        return p, q, R, dt_full * frac

    keys = jax.random.split(kd, 20)
    n_total = 12
    # keyframes 0..8: distinct places; 9..11 revisit place 0
    kf0_pts = points_A + np.array([0.0, 0.0, 40.0])
    for i in range(9):
        pts_i = points_A + np.array([0.0, 0.0, 40.0 + 10.0 * i])
        frac = i / (n_total - 1)
        p_v, q_v, Rf, tf = drifted([0.0, 0.1 * i, 0.0], [1.0, 0, 0, 0], frac)
        pts_v = pts_i @ Rf.T + tf
        kf = _fabricated_keyframe(i, keys[i], p_v, q_v, pts_v, qic, tic)
        out = pg.add_keyframe(kf)
        assert out["loop"] is None

    kf0 = pg.keyframes[0]
    loops = []
    for j, i in enumerate(range(9, 12)):
        frac = i / (n_total - 1)
        p_true = np.array([0.02 * j, 0.0, 0.0])  # hover near place 0
        p_v, q_v, Rf, tf = drifted(p_true, [1.0, 0, 0, 0], frac)
        pts_v = kf0_pts @ Rf.T + tf
        kf = _fabricated_keyframe(i, keys[0], p_v, q_v, pts_v, qic, tic)
        out = pg.add_keyframe(kf)
        loops.append(out["loop"])
    assert loops[0] == 0, loops

    # the revisit poses should be pulled mostly back onto place 0 (the
    # optimum balances 3 loop edges against the 4-back seq chain, so full
    # closure is not expected — matching the reference's objective)
    err_before = np.linalg.norm(
        drifted([0.04, 0, 0], [1.0, 0, 0, 0], 1.0)[0] - np.array([0.04, 0, 0])
    )
    err_after = np.linalg.norm(pg.keyframes[11].p - np.array([0.04, 0, 0]))
    assert err_before > 0.05
    assert err_after < 0.5 * err_before, (err_before, err_after)
    ydrift = float(
        lie.normalize_angle(jnp.asarray(
            np.degrees(0.0) + np.array(pg.graph.yaw[11] - pg.graph.ypr_vio[11, 0])
        ))
    )
    assert -1.1 < ydrift < -0.3  # recovers most of the injected +1° yaw drift
    # live correction applies the same drift fix as the last keyframe got
    p_corr, _ = pg.correct_pose(pg.keyframes[11].p_vio, pg.keyframes[11].q_vio)
    assert np.linalg.norm(p_corr - pg.keyframes[11].p) < 1e-6


def test_pose_graph_save_load(tmp_path):
    qic = np.array([1.0, 0, 0, 0])
    tic = np.zeros(3)
    key = jax.random.PRNGKey(9)
    pts = np.array(jax.random.uniform(key, (64, 3), jnp.float64, -3.0, 3.0)) + np.array([0, 0, 8.0])
    pg = PoseGraph(qic, tic, capacity=64, db=KeyframeDB(64, 64), exclude_last=3)
    for i in range(5):
        kf = _fabricated_keyframe(i, jax.random.fold_in(key, i),
                                  np.array([0.0, 0.2 * i, 0.0]),
                                  np.array([1.0, 0, 0, 0]), pts, qic, tic)
        pg.add_keyframe(kf, detect_loop=False)
    path = str(tmp_path / "map.npz")
    pg.save(path)

    pg2 = PoseGraph(qic, tic, capacity=64, db=KeyframeDB(64, 64), exclude_last=3)
    pg2.load(path)
    assert len(pg2.keyframes) == 5
    assert all(k.sequence == 0 for k in pg2.keyframes)
    np.testing.assert_allclose(pg2.keyframes[3].p, pg.keyframes[3].p, atol=1e-12)
    # a new-session keyframe revisiting place 0 relocalizes against the map
    kf = _fabricated_keyframe(5, jax.random.fold_in(key, 0),
                              np.array([0.3, -0.1, 0.05]),
                              np.array([1.0, 0, 0, 0]), pts, qic, tic,
                              sequence=1)
    out = pg2.add_keyframe(kf)
    assert out["loop"] is not None


def test_two_session_map_reuse_base_immutable(tmp_path):
    """Reference map-reuse semantics (pose_graph.cpp:473-476, 791-870): a
    loaded base map is pinned in every subsequent 4-DoF solve — session B
    relocalizes + merges against it, and the base poses are BITWISE
    unchanged afterwards; stored loop edges are restored on load."""
    qic = np.array([1.0, 0, 0, 0])
    tic = np.zeros(3)
    key = jax.random.PRNGKey(21)
    pts = np.array(jax.random.uniform(key, (64, 3), jnp.float64, -3.0, 3.0)) + np.array([0, 0, 8.0])

    # --- session A: places 0..7, then a revisit of place 0 → loop + solve
    pg = PoseGraph(qic, tic, capacity=64, db=KeyframeDB(64, 64), exclude_last=3)
    for i in range(8):
        kf = _fabricated_keyframe(i, jax.random.fold_in(key, i),
                                  np.array([0.0, 0.25 * i, 0.0]),
                                  np.array([1.0, 0, 0, 0]),
                                  pts + np.array([0.0, 0.0, 5.0 * i]),
                                  qic, tic)
        pg.add_keyframe(kf)
    kf = _fabricated_keyframe(8, jax.random.fold_in(key, 0),
                              np.array([0.03, 0.02, 0.0]),
                              np.array([1.0, 0, 0, 0]), pts, qic, tic)
    out = pg.add_keyframe(kf)
    assert out["loop"] == 0
    pg.flush()
    path = str(tmp_path / "map.npz")
    pg.save(path)

    # --- session B: load (base = sequence 0, edges restored) …
    pg2 = PoseGraph(qic, tic, capacity=64, db=KeyframeDB(64, 64), exclude_last=3)
    pg2.load(path)
    assert pg2.keyframes[8].loop_index == 0  # stored edge restored
    assert pg2.earliest_loop_index == 0
    assert np.all(pg2.graph.sequence[:9] == 0)
    # graph tensors agree with the authoritative stored poses
    np.testing.assert_array_equal(pg2.graph.t[:9],
                                  np.stack([k.p for k in pg2.keyframes]))
    base_p = np.stack([k.p for k in pg2.keyframes]).copy()
    base_q = np.stack([k.q for k in pg2.keyframes]).copy()

    # … then a drifted new session revisits places 0..2 → loops → merge +
    # 4-DoF solve over a slice containing the whole base map
    drift_t = np.array([0.4, -0.2, 0.1])
    for j in range(4):
        place = min(j, 2)
        p_true = np.array([0.0, 0.25 * place, 0.0])
        kf = _fabricated_keyframe(9 + j, jax.random.fold_in(key, place),
                                  p_true + drift_t,
                                  np.array([1.0, 0, 0, 0]),
                                  (pts + np.array([0.0, 0.0, 5.0 * place])) + drift_t,
                                  qic, tic, sequence=1)
        out = pg2.add_keyframe(kf)
    pg2.flush()
    assert pg2.n_optimizes >= 1
    assert any(k.loop_index >= 0 for k in pg2.keyframes[9:])

    # base map poses: bitwise unchanged
    np.testing.assert_array_equal(
        np.stack([k.p for k in pg2.keyframes[:9]]), base_p)
    np.testing.assert_array_equal(
        np.stack([k.q for k in pg2.keyframes[:9]]), base_q)
    np.testing.assert_array_equal(pg2.graph.t[:9], base_p)

    # session B was merged onto the base map: the relocalized keyframe
    # lands near its true place, not at its drifted VIO position
    k_new = next(k for k in pg2.keyframes[9:] if k.loop_index >= 0)
    place = min(k_new.index - 9, 2)
    p_true = np.array([0.0, 0.25 * place, 0.0])
    assert np.linalg.norm(k_new.p - p_true) < 0.25 * np.linalg.norm(drift_t), (
        k_new.p, p_true)


def test_keyframe_db_eviction_preserves_indices_and_recall():
    """Past capacity the DB halves (every other old entry dropped); the
    slot→keyframe-index map must keep query results pointing at the RIGHT
    keyframes, and a revisit of a surviving keyframe must still rank first
    (the reference caps its map at ~2000 kf, tro p.11)."""
    import jax

    from vins_tpu.loop.retrieval import KeyframeDB

    cap, P = 32, 64
    db = KeyframeDB(capacity=cap, pts_per_kf=P)
    key = jax.random.PRNGKey(5)
    descs = []
    n_total = cap + 20  # forces one halving
    for i in range(n_total):
        key, sub = jax.random.split(key)
        d = jnp.sign(jax.random.normal(sub, (P, 256))).astype(jnp.int8)
        descs.append(d)
        db.add(d, jnp.ones(P, bool), kf_index=i)
    assert db.n_evicted > 0
    assert db.count <= cap
    # surviving ids are a subsequence of 0..n_total-1, newest always kept
    ids = db.kf_index[: db.count]
    assert (np.diff(ids) > 0).all()
    assert ids[-1] == n_total - 1
    # query with an exact copy of a SURVIVING old keyframe's descriptors:
    # the returned external index must be that keyframe's id
    target = int(ids[2])
    idx, scores = db.query(descs[target], jnp.ones(P, bool),
                           exclude_last=5, newest_kf=n_total - 1)
    assert idx[0] == target
    assert scores[0] > 0.9
    # recent keyframes are excluded from retrieval
    assert all(i <= n_total - 1 - 5 for i in idx if i >= 0)
