"""Fast relocalization: BA-refined loop edge (the reference's
FAST_RELOCALIZATION round trip — keyframe.cpp:488-514 match_points →
Estimator::setReloFrame + relo factors (estimator.cpp:1128-1146, 769-801) →
relo_relative_pose → PoseGraph::updateKeyFrameLoop (pose_graph.cpp:889-923))."""
import jax
import jax.numpy as jnp
import numpy as np

from vins_tpu.core import lie
from vins_tpu.loop.relocalize import refine_relo_pose, relative_pose_4dof


def _project(X, p, q):
    Pc = np.stack([np.asarray(lie.qrotate(lie.qconj(q), jnp.asarray(Xl - p))) for Xl in X])
    return Pc[:, :2] / Pc[:, 2:3]


def test_refine_relo_pose_converges():
    key = jax.random.PRNGKey(3)
    X = np.array(jax.random.uniform(key, (64, 3), jnp.float64, -4.0, 4.0))
    X[:, 2] += 8.0
    p_true = np.array([0.3, -0.2, 0.1])
    q_true = np.asarray(lie.qnormalize(jnp.asarray([0.99, 0.05, -0.03, 0.08])))
    x = _project(X, p_true, jnp.asarray(q_true))

    p0 = p_true + np.array([0.4, -0.3, 0.25])
    q0 = lie.qmul(jnp.asarray(q_true), lie.deltaQ(jnp.asarray([0.06, -0.04, 0.08])))
    res = refine_relo_pose(
        jnp.asarray(X), jnp.asarray(x), jnp.ones(64, bool),
        jnp.asarray(p0), q0,
    )
    assert bool(res.ok)
    assert np.linalg.norm(np.asarray(res.p) - p_true) < 1e-6
    assert abs(abs(float(jnp.dot(res.q, jnp.asarray(q_true)))) - 1.0) < 1e-9
    assert int(res.n_inliers) == 64


def test_refine_relo_pose_rejects_outliers():
    key = jax.random.PRNGKey(5)
    X = np.array(jax.random.uniform(key, (80, 3), jnp.float64, -4.0, 4.0))
    X[:, 2] += 8.0
    p_true = np.zeros(3)
    q_true = jnp.asarray([1.0, 0, 0, 0])
    x = _project(X, p_true, q_true)
    x[60:] += 0.3  # gross outliers
    res = refine_relo_pose(
        jnp.asarray(X), jnp.asarray(x), jnp.ones(80, bool),
        jnp.asarray(p_true + 0.2), q_true,
    )
    assert bool(res.ok)
    assert np.linalg.norm(np.asarray(res.p) - p_true) < 1e-3
    assert int(res.n_inliers) == 60


def test_relative_pose_4dof():
    q_old = np.asarray(lie.ypr2R(jnp.asarray([20.0, 3.0, -2.0])))
    q_old = np.asarray(lie.R2q(jnp.asarray(q_old)))
    q_cur = np.asarray(lie.ypr2R(jnp.asarray([35.0, -1.0, 4.0])))
    q_cur = np.asarray(lie.R2q(jnp.asarray(q_cur)))
    p_old = np.array([1.0, 2.0, 0.5])
    p_cur = np.array([2.0, 1.0, 0.7])
    rel_t, rel_q, rel_yaw = relative_pose_4dof(
        jnp.asarray(p_old), jnp.asarray(q_old), jnp.asarray(p_cur), jnp.asarray(q_cur)
    )
    assert abs(float(rel_yaw) - 15.0) < 1e-6
    # reconstruct current pose from old + relative
    R_old = np.asarray(lie.q2R(jnp.asarray(q_old)))
    assert np.allclose(p_old + R_old @ np.asarray(rel_t), p_cur, atol=1e-9)
    q_rec = lie.qmul(jnp.asarray(q_old), rel_q)
    assert abs(abs(float(jnp.dot(q_rec, jnp.asarray(q_cur)))) - 1.0) < 1e-9


def test_set_relo_frame_integration():
    from vins_tpu.config import VinsConfig
    from vins_tpu.estimator.estimator import NON_LINEAR, Estimator
    from vins_tpu.sim.driver import SyntheticDriver
    from vins_tpu.sim.window import R_IC_FORWARD

    cfg = VinsConfig(
        estimate_extrinsic=0, loop_closure=False,
        extrinsic_R=tuple(map(tuple, np.asarray(R_IC_FORWARD))),
        extrinsic_t=(0.06, -0.01, 0.02), g_norm=9.81,
        acc_n=0.01, gyr_n=0.001, acc_w=1e-5, gyr_w=1e-6,
    )
    est = Estimator(cfg)
    driver = SyntheticDriver(imu_hz=200.0, frame_hz=10.0, g_norm=9.81)
    driver.run(est, n_frames=25)
    assert est.solver_flag == NON_LINEAR

    # fabricate the "old keyframe": the window frame W-3's camera pose,
    # shifted — then project this window's landmarks into it
    col = est.W - 3
    Rb = np.asarray(lie.q2R(jnp.asarray(est.q[col])))
    p_old_cam = est.p[col] + Rb @ est.tic + np.array([0.15, -0.1, 0.05])
    q_old_cam = lie.qmul(jnp.asarray(est.q[col]), jnp.asarray(est.qic))

    db = est.db
    Ric = np.asarray(lie.q2R(jnp.asarray(est.qic)))
    ids, pts_old = [], []
    for k in np.nonzero(db.used & (db.inv_depth > 0))[0]:
        a = int(db.anchor[k])
        ray = np.append(db.pt[k, a], 1.0) / db.inv_depth[k]
        Ra = np.asarray(lie.q2R(jnp.asarray(est.q[a])))
        Xw = Ra @ (Ric @ ray + est.tic) + est.p[a]
        Pc = np.asarray(lie.qrotate(lie.qconj(q_old_cam), jnp.asarray(Xw - p_old_cam)))
        if Pc[2] < 0.2:
            continue
        ids.append(int(db.ids[k]))
        pts_old.append(Pc[:2] / Pc[2])
        if len(ids) >= 60:
            break
    assert len(ids) >= 25

    stamp = est.timestamps[col]
    armed = est.set_relo_frame(stamp, ids, np.asarray(pts_old))
    assert armed is not None and armed["pending"]

    # expected relative pose BEFORE the next solve moves the window: old
    # body vs matched window frame body
    q_old_b = lie.qmul(q_old_cam, lie.qconj(jnp.asarray(est.qic)))
    p_old_b = p_old_cam - np.asarray(lie.q2R(q_old_b)) @ est.tic
    exp_t, exp_q, exp_yaw = relative_pose_4dof(
        jnp.asarray(p_old_b), q_old_b,
        jnp.asarray(est.p[col]), jnp.asarray(est.q[col]),
    )

    # the relo pose is a free block inside the NEXT window solve
    # (estimator.cpp:769-801) — run one more frame and read the refined
    # relative pose from its event
    run2 = driver.run(est, n_frames=1, t0=1.0 + 25 / 10.0)
    relo = run2.events[-1].get("relo")
    assert relo is not None and relo["ok"]
    assert np.allclose(relo["rel_t"], np.asarray(exp_t), atol=5e-3), (
        relo["rel_t"], np.asarray(exp_t))
    assert abs(relo["rel_yaw"] - float(exp_yaw)) < 0.2
    # the joint solve kept the window healthy
    assert est.last_cost < 1e4
    assert est._relo is None  # consumed


def test_update_keyframe_loop_drift():
    from vins_tpu.loop.pose_graph import KeyFrame, PoseGraph

    pg = PoseGraph(np.array([1.0, 0, 0, 0]), np.zeros(3))
    zdesc = jnp.zeros((4, 256), jnp.float32)
    zval = jnp.zeros((4,), bool)
    fdesc = jnp.zeros((256, 256), jnp.float32)
    fval = jnp.zeros((256,), bool)

    def mk(p, seq=1):
        return KeyFrame(
            index=-1, stamp=0.0, p_vio=p, q_vio=[1.0, 0, 0, 0],
            points_3d=np.zeros((4, 3)), points_2d_norm=np.zeros((4, 2)),
            window_desc=zdesc, window_valid=zval,
            fast_pts_norm=jnp.zeros((256, 2)), fast_desc=fdesc, fast_valid=fval,
            sequence=seq,
        )

    pg.add_keyframe(mk([0.0, 0, 0]), detect_loop=False)
    pg.add_keyframe(mk([1.0, 0.5, 0]), detect_loop=False)
    pg.keyframes[1].loop_index = 0
    pg.earliest_loop_index = 0
    ok = pg.update_keyframe_loop(
        1, rel_t=np.array([1.0, 0, 0]), rel_q=np.array([1.0, 0, 0, 0]), rel_yaw=0.0
    )
    assert ok
    # the refined edge places kf1 at [1,0,0]; vio said [1,0.5,0]
    p_c, _ = pg.correct_pose(np.array([1.0, 0.5, 0]), np.array([1.0, 0, 0, 0]))
    assert np.allclose(p_c, [1.0, 0, 0], atol=1e-6)
    # sanity gate rejects wild edges
    assert not pg.update_keyframe_loop(1, np.array([50.0, 0, 0]), np.array([1.0, 0, 0, 0]), 0.0)
