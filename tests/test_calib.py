"""Camera intrinsic calibration (the reference's camera_model calibration
pipeline: Chessboard.cc corner detection, CameraCalibration.cc Zhang init +
Ceres refinement, intrinsic_calib.cc CLI)."""
import jax
import jax.numpy as jnp
import numpy as np

from vins_tpu.calib.chessboard import (board_object_points, find_chessboard)
from vins_tpu.calib.intrinsics import (calibrate, homography_dlt,
                                       project_kb, project_pinhole,
                                       zhang_intrinsics)
from vins_tpu.core import lie

ROWS, COLS, SQ = 6, 9, 0.1


def _views(n_views, key, project, params, jitter=0.0):
    """Render synthetic correspondences: board poses in front of the camera."""
    obj = board_object_points(ROWS, COLS, SQ)  # [N,2]
    N = len(obj)
    objs, imgs = [], []
    keys = jax.random.split(key, n_views)
    for k in keys:
        r = np.array(jax.random.uniform(k, (6,), jnp.float64, -1.0, 1.0))
        ang = r[:3] * np.array([0.45, 0.45, 0.6])
        t = np.array([-0.45 + 0.25 * r[3], -0.3 + 0.2 * r[4], 1.3 + 0.35 * r[5]])
        q = lie.deltaQ(jnp.asarray(ang))
        Pb = jnp.asarray(np.concatenate([obj, np.zeros((N, 1))], -1))
        Pc = jax.vmap(lambda X: lie.qrotate(q, X))(Pb) + jnp.asarray(t)
        uv = np.asarray(project(jnp.asarray(params), Pc))
        if jitter > 0:
            uv = uv + np.array(jax.random.normal(jax.random.fold_in(k, 7), uv.shape)) * jitter
        objs.append(obj)
        imgs.append(uv)
    return (jnp.asarray(np.stack(objs)), jnp.asarray(np.stack(imgs)),
            jnp.ones((n_views, N), bool))


def test_homography_and_zhang_init():
    params = jnp.asarray([460.0, 458.0, 376.0, 240.0, 0.0, 0.0, 0.0, 0.0])
    obj, img, valid = _views(8, jax.random.PRNGKey(0), project_pinhole, params)
    Hs = jax.vmap(homography_dlt)(obj, img, valid)
    # homography reprojects exactly for a distortion-free pinhole
    o = jnp.concatenate([obj[0], jnp.ones((obj.shape[1], 1), obj.dtype)], -1)
    pr = (Hs[0] @ o.T).T
    pr = pr[:, :2] / pr[:, 2:3]
    assert np.allclose(np.asarray(pr), np.asarray(img[0]), atol=1e-6)

    K = np.asarray(zhang_intrinsics(Hs, jnp.ones(8, bool)))
    assert np.allclose(K, [460.0, 458.0, 376.0, 240.0], rtol=0.02, atol=2.0)


def test_calibrate_pinhole_radtan():
    gt = jnp.asarray([460.0, 458.0, 376.0, 240.0, -0.28, 0.07, 1e-4, -2e-4])
    obj, img, valid = _views(10, jax.random.PRNGKey(1), project_pinhole, gt)
    res = calibrate(obj, img, valid, model="PINHOLE", iters=20)
    assert float(res.rms) < 0.05
    intr = np.asarray(res.intrinsics)
    assert np.allclose(intr[:4], np.asarray(gt[:4]), atol=0.5)
    assert np.allclose(intr[4:6], np.asarray(gt[4:6]), atol=5e-3)


def test_calibrate_pinhole_noisy():
    gt = jnp.asarray([460.0, 458.0, 376.0, 240.0, -0.28, 0.07, 0.0, 0.0])
    obj, img, valid = _views(12, jax.random.PRNGKey(2), project_pinhole, gt,
                             jitter=0.2)
    res = calibrate(obj, img, valid, model="PINHOLE", iters=20)
    assert float(res.rms) < 0.4  # ~noise floor
    intr = np.asarray(res.intrinsics)
    assert np.allclose(intr[:4], np.asarray(gt[:4]), rtol=0.01, atol=3.0)


def test_calibrate_kannala_brandt():
    gt = jnp.asarray([285.0, 286.0, 376.0, 240.0, 0.02, -0.01, 0.005, -0.001])
    obj, img, valid = _views(10, jax.random.PRNGKey(3), project_kb, gt)
    res = calibrate(obj, img, valid, model="KANNALA_BRANDT", iters=25)
    assert float(res.rms) < 0.1
    intr = np.asarray(res.intrinsics)
    assert np.allclose(intr[:4], np.asarray(gt[:4]), rtol=0.01, atol=3.0)


def _render_board(rows, cols, square_px=40, off=(60, 40)):
    """Axis-aligned synthetic chessboard image; returns (img, inner corners
    row-major [rows*cols, 2])."""
    H = (rows + 1) * square_px + 2 * off[1]
    W = (cols + 1) * square_px + 2 * off[0]
    yy, xx = np.mgrid[:H, :W]
    sq_y = (yy - off[1]) // square_px
    sq_x = (xx - off[0]) // square_px
    inside = (sq_y >= 0) & (sq_y < rows + 1) & (sq_x >= 0) & (sq_x < cols + 1)
    img = np.where(inside & (((sq_y + sq_x) % 2) == 0), 40.0, 220.0)
    jj, ii = np.meshgrid(np.arange(1, cols + 1), np.arange(1, rows + 1))
    # pixel-center convention: the square boundary between pixel k-1 and
    # pixel k lies at coordinate k - 0.5
    corners = np.stack([
        off[0] + jj.ravel() * square_px - 0.5,
        off[1] + ii.ravel() * square_px - 0.5,
    ], -1).astype(float)
    return img.astype(np.float32), corners


def _render_perspective(K, R, t, rows, cols, square, H=480, W=640):
    """Inverse-warp render of the board (plane z=0 in board frame) through a
    distortion-free pinhole: pixel ~ K [r1 r2 t] [X Y 1]."""
    Hm = K @ np.column_stack([R[:, 0], R[:, 1], t])
    Hi = np.linalg.inv(Hm)
    yy, xx = np.mgrid[:H, :W]
    pix = np.stack([xx + 0.0, yy + 0.0, np.ones_like(xx, float)], -1)
    b = pix @ Hi.T
    X, Y = b[..., 0] / b[..., 2], b[..., 1] / b[..., 2]
    sx = np.floor(X / square).astype(int)
    sy = np.floor(Y / square).astype(int)
    # (cols+1)×(rows+1) squares ⇒ full X-corners exactly at the inner lattice
    # j∈[0,cols-1], i∈[0,rows-1] (matching board_object_points)
    inside = (sx >= -1) & (sx < cols) & (sy >= -1) & (sy < rows) & (b[..., 2] != 0)
    img = np.where(inside & (((sx + sy) % 2) == 0), 40.0, 220.0)
    return img.astype(np.float32)


def test_full_pipeline_perspective():
    """Detection → ordering → Zhang → GN on perspective-rendered views (the
    reference's intrinsic_calib.cc flow, minus file I/O)."""
    rng = np.random.default_rng(4)
    K = np.array([[430.0, 0, 320.0], [0, 432.0, 240.0], [0, 0, 1]])
    obj = board_object_points(ROWS, COLS, SQ)
    objs, imgs = [], []
    for _ in range(6):
        ang = rng.uniform(-0.35, 0.35, 3)
        q = np.asarray(lie.deltaQ(jnp.asarray(ang)))
        R = np.asarray(lie.q2R(jnp.asarray(q)))
        # board origin placed so the lattice is roughly centered
        t = np.array([-0.45 + rng.uniform(-0.1, 0.1),
                      -0.3 + rng.uniform(-0.07, 0.07),
                      1.4 + rng.uniform(-0.2, 0.2)])
        img = _render_perspective(K, R, t, ROWS, COLS, SQ)
        got, ok = find_chessboard(img, ROWS, COLS)
        if not ok:
            continue
        objs.append(obj)
        imgs.append(got)
    assert len(objs) >= 4, f"only {len(objs)} views detected"
    res = calibrate(jnp.asarray(np.stack(objs)), jnp.asarray(np.stack(imgs)),
                    jnp.ones((len(objs), len(obj)), bool),
                    model="PINHOLE", iters=20)
    assert float(res.rms) < 0.5
    intr = np.asarray(res.intrinsics)
    # tolerance note: the renderer is hard-edged (no anti-aliasing), which
    # biases sub-pixel corners by ~0.25 px; with 6 mild views that maps to a
    # few px of focal/principal error (the noise-free correspondence tests
    # above pin the solver itself to sub-px accuracy)
    assert np.allclose(intr[:4], [430.0, 432.0, 320.0, 240.0], atol=6.0), intr


def test_find_chessboard_synthetic():
    img, gt = _render_board(ROWS, COLS)
    got, ok = find_chessboard(img, ROWS, COLS)
    assert ok
    assert got.shape == (ROWS * COLS, 2)
    # same lattice up to ordering convention: compare as sets first
    d = np.linalg.norm(got[:, None, :] - gt[None, :, :], axis=-1)
    assert d.min(axis=1).max() < 0.5  # every detection near a true corner
    # and ordered row-major consistently
    assert np.allclose(got, gt, atol=0.5) or np.allclose(got, gt[::-1], atol=0.5)


def test_calibrate_mei():
    """MEI (unified sphere, CataCamera.cc): recover ξ + gammas + distortion
    from synthetic chessboard views — CostFunctionFactory.cc's CATA path."""
    from vins_tpu.calib.intrinsics import project_mei

    gt = jnp.asarray([0.9, 750.0, 748.0, 376.0, 240.0, -0.1, 0.02, 1e-4, -1e-4])
    obj, img, valid = _views(12, jax.random.PRNGKey(4), project_mei, gt)
    res = calibrate(obj, img, valid, model="MEI", iters=30)
    assert float(res.rms) < 0.2, float(res.rms)
    intr = np.asarray(res.intrinsics)
    # xi and gamma trade off; the projection itself must be right
    pred = project_mei(res.intrinsics, jnp.asarray([[0.2, 0.1, 1.0]]))
    true = project_mei(gt, jnp.asarray([[0.2, 0.1, 1.0]]))
    assert np.allclose(np.asarray(pred), np.asarray(true), atol=0.5)
    assert np.allclose(intr[3:5], np.asarray(gt[3:5]), atol=2.0)


def test_calibrate_scaramuzza():
    """SCARAMUZZA (OCAM): recover the inverse polynomial + affine center
    (ScaramuzzaCamera.cc / CostFunctionFactory.cc OCAM path)."""
    from vins_tpu.calib.intrinsics import SCARA_POLY_DEG, project_scaramuzza

    f = 320.0
    poly = np.zeros(SCARA_POLY_DEG)
    poly[1] = f
    poly[2] = 18.0   # mild departure from equidistant
    poly[3] = -6.0
    # a physical camera maps the optical axis (θ = −π/2) to ρ = 0
    h = np.pi / 2
    poly[0] = poly[1] * h - poly[2] * h**2 + poly[3] * h**3
    gt = jnp.asarray(np.concatenate([[1.003, 0.002, -0.001, 376.0, 240.0], poly]))
    obj, img, valid = _views(12, jax.random.PRNGKey(5), project_scaramuzza, gt)
    res = calibrate(obj, img, valid, model="SCARAMUZZA", iters=30)
    assert float(res.rms) < 0.2, float(res.rms)
    pred = project_scaramuzza(res.intrinsics, jnp.asarray([[0.2, -0.15, 1.0]]))
    true = project_scaramuzza(gt, jnp.asarray([[0.2, -0.15, 1.0]]))
    assert np.allclose(np.asarray(pred), np.asarray(true), atol=0.5)
