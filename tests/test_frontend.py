"""Front-end tests: CLAHE, pyramidal LK, Shi-Tomasi grid detection, and the
full tracker loop — validated on synthetic textures with exact sub-pixel
ground-truth motion (the reference only ever validated visually)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vins_tpu.core.cameras import PinholeCamera
from vins_tpu.frontend.detect import detect_grid, shi_tomasi_response
from vins_tpu.frontend.image import bilinear, build_pyramid, clahe
from vins_tpu.frontend.klt import lk_pyramidal
from vins_tpu.frontend.tracker import FeatureTracker

H, W = 240, 320


def smooth_texture(key, h=H, w=W, scale=8):
    """Random smooth texture: bilinear-upsampled coarse noise in [0,255]."""
    coarse = jax.random.uniform(key, (h // scale + 2, w // scale + 2), jnp.float32)
    yy = (jnp.arange(h, dtype=jnp.float32) / scale)[:, None] + jnp.zeros((1, w), jnp.float32)
    xx = (jnp.arange(w, dtype=jnp.float32) / scale)[None, :] + jnp.zeros((h, 1), jnp.float32)
    xy = jnp.stack([xx, yy], axis=-1)
    return (255.0 * bilinear(coarse, xy)).astype(jnp.float32)


def shifted(img, dx, dy):
    """Sample img at (x+dx, y+dy): contents move by (-dx, -dy)."""
    yy, xx = jnp.meshgrid(jnp.arange(img.shape[0], dtype=jnp.float32),
                          jnp.arange(img.shape[1], dtype=jnp.float32), indexing="ij")
    xy = jnp.stack([xx + dx, yy + dy], axis=-1)
    return bilinear(img, xy)


def test_clahe_shapes_and_contrast():
    img = smooth_texture(jax.random.PRNGKey(0)) * 0.2 + 30.0  # low contrast
    out = np.array(clahe(img))
    assert out.shape == (H, W)
    assert out.std() > np.array(img).std() * 1.5  # contrast expanded
    assert 0 <= out.min() and out.max() <= 255.5


def test_lk_recovers_subpixel_shift():
    key = jax.random.PRNGKey(1)
    img0 = smooth_texture(key, scale=6)
    dx, dy = 5.3, -3.7
    img1 = shifted(img0, -dx, -dy)  # contents move by (+dx, +dy)

    pts = jnp.asarray(
        [[60.0, 60.0], [160.0, 80.0], [240.0, 180.0], [100.0, 200.0]], jnp.float32
    )
    valid = jnp.ones(4, bool)
    out, ok = lk_pyramidal(img0, img1, pts, valid)
    assert bool(jnp.all(ok))
    err = np.array(out) - (np.array(pts) + np.array([dx, dy]))
    assert np.abs(err).max() < 0.05, err


def test_lk_rejects_out_of_border():
    key = jax.random.PRNGKey(2)
    img0 = smooth_texture(key)
    img1 = shifted(img0, -8.0, 0.0)  # contents move +8 px in x
    # starts just inside the window margin; correct tracking exits it
    pts = jnp.asarray([[W - 13.0, 100.0], [100.0, 100.0]], jnp.float32)
    out, ok = lk_pyramidal(img0, img1, pts, jnp.ones(2, bool))
    assert not bool(ok[0])
    assert bool(ok[1])  # interior point unaffected


def test_detect_grid_separation():
    key = jax.random.PRNGKey(3)
    img = smooth_texture(key, scale=4)
    resp = shi_tomasi_response(img)
    pts, ok = detect_grid(resp, jnp.zeros((1, 2), jnp.float32),
                          jnp.zeros(1, bool), max_new=60, cell=30)
    pts = np.array(pts)[np.array(ok)]
    assert len(pts) >= 20
    # pairwise min distance respects the cell granularity (adjacent-cell
    # winners can sit near a shared border ⇒ ≥ 1 px guaranteed, typical ≫)
    d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
    d[np.diag_indices(len(pts))] = 1e9
    assert (d.min(1) >= 1.0).all()
    # suppression around existing features
    pts2, ok2 = detect_grid(resp, jnp.asarray(pts[:5], jnp.float32),
                            jnp.ones(5, bool), max_new=60, cell=30)
    pts2 = np.array(pts2)[np.array(ok2)]
    dd = np.linalg.norm(pts2[:, None] - pts[None, :5], axis=-1)
    assert dd.min() > 30.0  # one-ring cell suppression ⇒ ≥ cell distance


def test_tracker_end_to_end():
    cam = PinholeCamera.create(300.0, 300.0, W / 2, H / 2, dtype=jnp.float32)
    tr = FeatureTracker(cam, max_cnt=80, min_dist=24, equalize=False)
    key = jax.random.PRNGKey(4)
    base = smooth_texture(key, scale=5)

    shifts = [(0.0, 0.0), (2.0, 1.0), (4.0, 2.0), (6.0, 3.0), (8.0, 4.0)]
    frames = [shifted(base, -sx, -sy) for sx, sy in shifts]

    outs = [tr.read_image(np.array(f), 0.1 * i) for i, f in enumerate(frames)]
    # first frame publishes nothing with track_cnt > 1
    assert len(outs[0].ids) == 0
    last = outs[-1]
    assert len(last.ids) >= 20
    # ids persist: most ids in frame 4 already existed in frame 2
    common = set(outs[2].ids.tolist()) & set(last.ids.tolist())
    assert len(common) >= 0.8 * len(outs[2].ids)
    # normalized velocity ≈ pixel shift / focal / dt = 2 px / 300 / 0.1
    v = last.vel[np.linalg.norm(last.vel, axis=1) > 0]
    assert np.allclose(v.mean(0), [2.0 / 300 / 0.1, 1.0 / 300 / 0.1], atol=2e-3), v.mean(0)
