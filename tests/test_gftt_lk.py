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


def test_lk_windowed_matches_full_path():
    """The windowed TPU sampling path must agree with the dynamic-slice path
    for in-window tracks (forced via the explicit `windowed` parameter so the
    CPU suite covers the TPU kernel — ADVICE r2 medium)."""
    key = jax.random.PRNGKey(0)
    H, W = 160, 200
    img0 = synthetic.smooth_texture(key, H, W)
    img1 = synthetic.translate_image(img0, 3.7, -2.3)
    pyr0 = imops.build_pyramid(img0, 3)
    pyr1 = imops.build_pyramid(img1, 3)
    pts, valid, _ = gftt.detect(img0, max_corners=48, min_distance=10)

    cur_f, st_f = lk.track(pyr0, pyr1, pts, mask=valid, windowed=False)
    cur_w, st_w = lk.track(pyr0, pyr1, pts, mask=valid, windowed=True)
    v = np.asarray(valid)
    # small motion: nothing leaves the +-10 px window, so positions and
    # statuses are identical (one-hot matmul gathers are exact)
    np.testing.assert_array_equal(np.asarray(st_f)[v], np.asarray(st_w)[v])
    np.testing.assert_allclose(np.asarray(cur_f)[v], np.asarray(cur_w)[v],
                               atol=1e-4)


def test_lk_windowed_exit_reports_failure():
    """A point whose iteration walks out of its per-level window must return
    status False (ADVICE r2 high: previously the stale mid-iteration position
    came back with status True because only full-image bounds were checked)."""
    H, W = 160, 200
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")

    def blob(cx, cy, sig=12.0):
        return 200.0 * jnp.exp(-((xx - cx) ** 2 + (yy - cy) ** 2)
                               / (2 * sig * sig))

    # wide Gaussian blob moved 14 px: LK walks the smooth slope the whole
    # way — farther than the 10 px per-level window margin
    img0 = blob(100.0, 80.0)
    img1 = blob(114.0, 80.0)
    pts = jnp.array([[100.0, 80.0]])

    cur_f, st_f = lk.track([img0], [img1], pts, windowed=False, max_iters=60)
    cur_w, st_w = lk.track([img0], [img1], pts, windowed=True, max_iters=60)
    # the full-image path converges to the true +14 px flow
    assert bool(st_f[0])
    np.testing.assert_allclose(np.asarray(cur_f - pts)[0, 0], 14.0, atol=0.3)
    # the windowed path cannot reach it: it must say so, not return the
    # stale ~13 px wrong-lock with status True
    assert not bool(st_w[0])


def test_fast_detector_finds_blob_centers():
    # note: an ideal checkerboard corner splits the FAST ring 8/8 and is
    # correctly rejected by the 9-contiguous test; bright blobs are the
    # canonical positive case
    from stereovision_slam_tpu.ops import fast
    H, W = 128, 160
    pts_true = jnp.array([[40.0, 40.0], [100.0, 60.0], [70.0, 90.0],
                          [130.0, 30.0]])
    img = synthetic.render_blobs(pts_true, H, W, sigma=2.5)
    pts, valid, scores = fast.detect(img, max_corners=16, min_distance=8)
    p = np.asarray(pts[np.asarray(valid)])
    assert len(p) >= 4
    for t in np.asarray(pts_true):
        d = np.linalg.norm(p - t, axis=1).min()
        assert d <= 3.0, f"blob at {t} missed (nearest {d:.1f})"


def test_fast_flat_image_no_corners():
    from stereovision_slam_tpu.ops import fast
    img = jnp.full((64, 64), 80.0)
    _, valid, _ = fast.detect(img, max_corners=16)
    assert int(valid.sum()) == 0


def test_keyframe_step_orb_detector_runs():
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __graft_entry__
    import stereovision_slam_tpu.slam.frontend as fe
    fs, m, pyr1, cam_l, cam_r = __graft_entry__._tiny_scene()
    fs2, m2, ev, n_new, n_r = fe.keyframe_step(
        fs, m, fs.pyr, cam_l, cam_r, 3, 3, detector="orb")
    assert np.all(np.isfinite(np.asarray(fs2.feat_uv)))


def test_lk_pallas_kernel_matches_xla_loop():
    """The fused Pallas iteration kernel (ops/lk_pallas.py) must agree
    with the XLA while_loop on the windowed path — statuses exactly,
    positions to float rounding — including under vmap (track_batched)
    and for the window-exit status contract. Runs under the Pallas
    interpreter on CPU."""
    key = jax.random.PRNGKey(0)
    H, W = 200, 320
    img0 = synthetic.smooth_texture(key, H, W)
    img1 = synthetic.translate_image(img0, 3.7, -2.3)
    pyr0 = imops.build_pyramid(img0, 3)
    pyr1 = imops.build_pyramid(img1, 3)
    pts, valid, _ = gftt.detect(img0, max_corners=64, min_distance=10)
    v = np.asarray(valid)

    cur_x, st_x = lk.track(pyr0, pyr1, pts, mask=valid, windowed=True,
                           pallas_mode="xla")
    cur_p, st_p = lk.track(pyr0, pyr1, pts, mask=valid, windowed=True,
                           pallas_mode="interpret")
    # the kernel's row-streamed bilinear/accumulation orders differ from
    # the XLA path's 3-D reductions, so positions agree to float rounding
    # (converged fixed points), statuses exactly
    np.testing.assert_array_equal(np.asarray(st_x)[v], np.asarray(st_p)[v])
    np.testing.assert_allclose(np.asarray(cur_x)[v], np.asarray(cur_p)[v],
                               atol=2e-3)

    stack = lambda lv: [jnp.stack([l, l]) for l in lv]
    b_args = (stack(pyr0), stack(pyr1), jnp.stack([pts, pts]),
              jnp.stack([pts, pts]), jnp.stack([valid, valid]))
    cb_x, sb_x = lk.track_batched(*b_args, windowed=True, pallas_mode="xla")
    cb_p, sb_p = lk.track_batched(*b_args, windowed=True,
                                  pallas_mode="interpret")
    np.testing.assert_array_equal(np.asarray(sb_x)[:, v],
                                  np.asarray(sb_p)[:, v])
    np.testing.assert_allclose(np.asarray(cb_x)[:, v],
                               np.asarray(cb_p)[:, v], atol=2e-3)


def test_lk_pallas_kernel_window_exit_contract():
    """Window-exit reports status False through the Pallas path too."""
    H, W = 160, 200
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")

    def blob(cx, cy, sig=12.0):
        return 200.0 * jnp.exp(-((xx - cx) ** 2 + (yy - cy) ** 2)
                               / (2 * sig * sig))

    img0 = blob(100.0, 80.0)
    img1 = blob(114.0, 80.0)
    pts = jnp.array([[100.0, 80.0]])
    _, st = lk.track([img0], [img1], pts, windowed=True,
                     pallas_mode="interpret", max_iters=60)
    assert not bool(st[0])
