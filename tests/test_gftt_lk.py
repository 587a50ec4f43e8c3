import jax
import jax.numpy as jnp
import numpy as np

from stereovision_slam_tpu.ops import gftt, lk, image as imops
from tests import synthetic


def checkerboard(H, W, sq=16):
    yy, xx = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    return (((yy // sq) + (xx // sq)) % 2).astype(jnp.float32) * 200.0


def test_gftt_finds_checkerboard_corners():
    H, W = 128, 160
    img = checkerboard(H, W)
    pts, valid, scores = gftt.detect(img, max_corners=64, min_distance=8)
    n = int(jnp.sum(valid))
    assert n >= 20
    # every valid detection should be near a lattice corner (multiple of 16)
    p = np.asarray(pts[np.asarray(valid)])
    off = np.minimum(p % 16, 16 - (p % 16))
    assert np.all(off <= 2.5)


def test_gftt_respects_mask():
    H, W = 128, 160
    img = checkerboard(H, W)
    existing = jnp.array([[48.0, 48.0], [80.0, 64.0]])
    mask = gftt.occupancy_mask((H, W), existing, jnp.array([True, True]), 10)
    pts, valid, _ = gftt.detect(img, max_corners=64, min_distance=8, mask=mask)
    p = np.asarray(pts[np.asarray(valid)])
    for e in np.asarray(existing):
        d = np.abs(p - e).max(axis=1)
        assert np.all(d > 8), f"detection too close to masked feature {e}"


def test_gftt_flat_image_no_corners():
    img = jnp.full((64, 64), 100.0)
    _, valid, _ = gftt.detect(img, max_corners=32)
    assert int(jnp.sum(valid)) == 0


def test_lk_recovers_translation():
    key = jax.random.PRNGKey(0)
    H, W = 160, 200
    img0 = synthetic.smooth_texture(key, H, W)
    shift = (3.7, -2.3)
    img1 = synthetic.translate_image(img0, *shift)

    pyr0 = imops.build_pyramid(img0, 3)
    pyr1 = imops.build_pyramid(img1, 3)

    pts, valid, _ = gftt.detect(img0, max_corners=48, min_distance=10)
    cur, status = lk.track(pyr0, pyr1, pts)

    ok = np.asarray(valid & status)
    assert ok.sum() >= 10
    flow = np.asarray(cur - pts)[ok]
    err = np.abs(flow - np.array(shift))
    assert np.median(err[:, 0]) < 0.25, f"dx err {np.median(err[:, 0])}"
    assert np.median(err[:, 1]) < 0.25, f"dy err {np.median(err[:, 1])}"


def test_lk_large_motion_needs_pyramid():
    key = jax.random.PRNGKey(1)
    H, W = 160, 200
    img0 = synthetic.smooth_texture(key, H, W)
    shift = (14.0, 6.0)  # > window size: only trackable via pyramid
    img1 = synthetic.translate_image(img0, *shift)

    pyr0 = imops.build_pyramid(img0, 4)
    pyr1 = imops.build_pyramid(img1, 4)
    pts, valid, _ = gftt.detect(img0, max_corners=48, min_distance=12)
    cur, status = lk.track(pyr0, pyr1, pts)
    ok = np.asarray(valid & status)
    flow = np.asarray(cur - pts)[ok]
    err = np.linalg.norm(flow - np.array(shift), axis=1)
    assert np.median(err) < 0.5, f"median flow err {np.median(err)}"


def test_lk_initial_flow_used():
    key = jax.random.PRNGKey(2)
    H, W = 160, 200
    img0 = synthetic.smooth_texture(key, H, W)
    shift = (25.0, 0.0)  # far beyond pyramid reach without a guess
    img1 = synthetic.translate_image(img0, *shift)

    pyr0 = imops.build_pyramid(img0, 3)
    pyr1 = imops.build_pyramid(img1, 3)
    pts, valid, _ = gftt.detect(img0, max_corners=32, min_distance=12)
    guess = pts + jnp.array([24.0, 0.0])  # near-correct initial flow
    cur, status = lk.track(pyr0, pyr1, pts, initial_pts=guess)
    ok = np.asarray(valid & status)
    flow = np.asarray(cur - pts)[ok]
    err = np.linalg.norm(flow - np.array(shift), axis=1)
    assert np.median(err) < 0.5


def test_lk_status_false_for_out_of_bounds():
    key = jax.random.PRNGKey(3)
    img0 = synthetic.smooth_texture(key, 64, 64)
    img1 = synthetic.translate_image(img0, 40.0, 0.0)
    pyr0 = imops.build_pyramid(img0, 3)
    pyr1 = imops.build_pyramid(img1, 3)
    pts = jnp.array([[60.0, 32.0]])  # will exit the image under the true flow
    guess = pts + jnp.array([40.0, 0.0])
    _, status = lk.track(pyr0, pyr1, pts, initial_pts=guess)
    assert not bool(status[0])
