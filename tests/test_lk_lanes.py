"""Lane-major Pallas LK kernel: parity vs the XLA windowed path + driver
semantics (ops/lk_lanes.py). Runs the kernel under the Pallas interpreter
on CPU; statuses must be EQUAL and positions agree to float rounding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests import synthetic
from stereovision_slam_tpu.ops import image as imops
from stereovision_slam_tpu.ops import lk, lk_lanes


@pytest.fixture(scope="module")
def scene():
    rig = synthetic.make_stereo_rig()
    poses = synthetic.forward_motion_poses(3, step=0.4, yaw_rate=0.003)
    lefts, rights = synthetic.render_textured_stereo_sequence(
        poses, H=188, W=620, rig=rig)
    return (imops.build_pyramid(jnp.asarray(np.asarray(lefts[0])), 4),
            imops.build_pyramid(jnp.asarray(np.asarray(lefts[1])), 4),
            imops.build_pyramid(jnp.asarray(np.asarray(rights[0])), 4))


def _pts(n=256, seed=0, border=False):
    rng = np.random.default_rng(seed)
    lo, hi_x, hi_y = (3, 617, 185) if border else (20, 600, 168)
    return np.stack([rng.uniform(lo, hi_x, n),
                     rng.uniform(lo, hi_y, n)], axis=1).astype(np.float32)


def _lanes(pyr_p, pyr_c, pts, mask, **kw):
    tp = [l[None] for l in pyr_p]
    tc = [l[None] for l in pyr_c]
    uv, st = lk_lanes.track_grouped_lanes(
        tp, tc, jnp.asarray(pts)[None], jnp.asarray(pts)[None],
        jnp.asarray(mask)[None], interpret=True, **kw)
    return np.asarray(uv[0]), np.asarray(st[0])


def test_parity_with_xla_windowed(scene):
    pyr_p, pyr_c, _ = scene
    pts = _pts(border=True)
    mask = np.ones(256, bool)
    mask[200:] = False
    uv_x, st_x = lk.track(pyr_p, pyr_c, jnp.asarray(pts),
                          mask=jnp.asarray(mask), max_iters=12,
                          windowed=True, pallas_mode="xla")
    uv_l, st_l = _lanes(pyr_p, pyr_c, pts, mask, max_iters=12)
    uv_x, st_x = np.asarray(uv_x), np.asarray(st_x)
    m = mask
    assert (st_l == st_x)[m].all(), np.where((st_l != st_x) & m)[0]
    both = st_x & st_l & m
    assert both.sum() > 150
    np.testing.assert_allclose(uv_l[both], uv_x[both], atol=1e-3)


def test_stereo_disparity_tracked(scene):
    """L->R stereo with same-position initial guesses: the coarse-level
    margins must cover the full disparity sweep (the failure mode that
    forbade windowing coarse levels in the XLA path)."""
    pyr_p, _, pyr_r = scene
    pts = _pts()
    mask = np.ones(256, bool)
    uv_x, st_x = lk.track(pyr_p, pyr_r, jnp.asarray(pts),
                          mask=jnp.asarray(mask), max_iters=30)
    uv_l, st_l = _lanes(pyr_p, pyr_r, pts, mask, max_iters=30)
    uv_x, st_x = np.asarray(uv_x), np.asarray(st_x)
    # the default XLA path uses full-image sampling at coarse levels, so
    # statuses may differ for a few points at the window margins; demand
    # near-complete agreement and matched positions on the shared inliers
    both = st_x & st_l
    assert st_l.sum() >= st_x.sum() - 4
    assert both.sum() > 150
    np.testing.assert_allclose(uv_l[both], np.asarray(uv_x)[both], atol=0.05)
    # real disparity sweep was exercised (near-field points move far left)
    disp = pts[both, 0] - uv_l[both, 0]
    assert disp.max() > 10.0


def test_masked_slots_hold_position(scene):
    pyr_p, pyr_c, _ = scene
    pts = _pts()
    pts[100:110] = np.nan          # garbage in dead slots must not poison
    mask = np.ones(256, bool)
    mask[100:110] = False
    uv_l, st_l = _lanes(pyr_p, pyr_c, pts, mask, max_iters=8)
    assert np.isfinite(uv_l[mask]).all()


def test_flat_image_all_unsolvable(scene):
    pyr = imops.build_pyramid(jnp.zeros((188, 620), jnp.float32), 4)
    pts = _pts(128)
    uv_l, st_l = _lanes(pyr, pyr, pts, np.ones(128, bool), max_iters=5)
    assert not st_l.any()


def test_group_folding_matches_separate_calls(scene):
    """G=2 groups folded into one kernel call must equal two G=1 calls."""
    pyr_p, pyr_c, pyr_r = scene
    pts = _pts(128, seed=3)
    mask = np.ones(128, bool)
    uv_a, st_a = _lanes(pyr_p, pyr_c, pts, mask, max_iters=10)
    uv_b, st_b = _lanes(pyr_p, pyr_r, pts, mask, max_iters=10)
    tp = [jnp.stack([l, l]) for l in pyr_p]
    tc = [jnp.stack([c, r]) for c, r in zip(pyr_c, pyr_r)]
    uv_g, st_g = lk_lanes.track_grouped_lanes(
        tp, tc, jnp.asarray(np.stack([pts, pts])),
        jnp.asarray(np.stack([pts, pts])),
        jnp.asarray(np.stack([mask, mask])), max_iters=10, interpret=True)
    np.testing.assert_allclose(np.asarray(uv_g[0]), uv_a, atol=1e-5)
    np.testing.assert_allclose(np.asarray(uv_g[1]), uv_b, atol=1e-5)
    assert (np.asarray(st_g[0]) == st_a).all()
    assert (np.asarray(st_g[1]) == st_b).all()


def test_track_entrypoint_lanes_mode(scene):
    """ops.lk.track(pallas_mode='lanes') routes through the lanes kernel."""
    pyr_p, pyr_c, _ = scene
    pts = _pts(128, seed=5)
    mask = np.ones(128, bool)
    uv_a, st_a = lk.track(pyr_p, pyr_c, jnp.asarray(pts),
                          mask=jnp.asarray(mask), max_iters=10,
                          pallas_mode="lanes-interpret")
    uv_b, st_b = _lanes(pyr_p, pyr_c, pts, mask, max_iters=10)
    np.testing.assert_allclose(np.asarray(uv_a), uv_b, atol=1e-5)
    assert (np.asarray(st_a) == st_b).all()


def test_lanes_levels_guard():
    """_lanes_levels_ok must reject pyramids whose coarse levels are too
    small for the lane kernel's clamped windows (the one-hot gather would
    zero-fill out-of-range rows) and accept the operating sizes."""
    import jax.numpy as jnp
    from stereovision_slam_tpu.ops import image as imops
    from stereovision_slam_tpu.ops.lk import _lanes_levels_ok

    # KITTI operating point: 4 levels of 188x620 -> coarsest 23x77, fine
    pyr = imops.build_pyramid(jnp.zeros((188, 620)), 4)
    assert _lanes_levels_ok(pyr, 11)
    # an 8-row image's level-3 is 1 row tall -> padded 15, below the
    # 16-row clamp floor -> must fall back
    tiny = imops.build_pyramid(jnp.zeros((8, 40)), 4)
    assert not _lanes_levels_ok(tiny, 11)
