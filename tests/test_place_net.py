"""PlaceNet (models/place_net.py): the in-repo-trained place-recognition
embedder that replaces the reference's pretrained MobileNet-V2 candidate
stage (/root/reference/src/loopclosure.cpp:73-129 — its weight artifact is
absent from this environment, so the discriminative embedder is trained on
the synthetic renderer instead; benchmarks/train_place_net.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from stereovision_slam_tpu.models import place_net
from tests import synthetic


def test_forward_shape_and_norm():
    params = place_net.init_params(seed=1)
    x = jnp.zeros((3, place_net.IN_H, place_net.IN_W)) + 0.1
    v = place_net.forward(params, x)
    assert v.shape == (3, place_net.PROJ_DIM)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(v), axis=1), 1.0,
                               atol=1e-4)


def test_embed_image_padded_layout():
    params = place_net.init_params(seed=1)
    img = jnp.asarray(np.random.default_rng(0).uniform(0, 255, (188, 620)),
                      jnp.float32)
    e = np.asarray(place_net.embed_image(params, img))
    assert e.shape == (place_net.EMBED_DIM,)
    # learned part L2-normalized, the rest exact zeros (database layout
    # shared with the MobileNet path)
    assert abs(np.linalg.norm(e) - 1.0) < 1e-3
    assert np.all(e[place_net.PROJ_DIM:] == 0.0)


def test_shipped_weights_load_and_roundtrip(tmp_path):
    params = place_net.get_params()
    assert params is not None, "weights artifact missing from the repo"
    # save/load roundtrip is exact
    p = str(tmp_path / "w.npz")
    place_net.save_params(params, p)
    again = place_net.load_params(p)
    import jax
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(again)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_trained_embedder_discriminates_heldout_world():
    """The shipped weights must discriminate places in a world NEVER seen in
    training (texture phase 57.3; training used phases 1..24 and validation
    0/91/92/95): same-place same-heading pairs score far above different
    places, measured the way the pipeline consumes scores (cosine in the
    1280-d database layout)."""
    params = place_net.get_params()
    assert params is not None
    rng = np.random.default_rng(3)
    cam = synthetic.make_stereo_rig()[0]
    cam_params = (cam.fx, cam.fy, cam.cx, cam.cy)

    def render(x, z, yaw):
        from benchmarks.train_place_net import pose_from_xz_yaw
        img = synthetic.render_textured_view_cylinder(
            cam_params, jnp.asarray(pose_from_xz_yaw(x, z, yaw)), 188, 620,
            center_x=0.0, center_z=6.0, radius=24.0, tex_phase=57.3)
        return place_net.embed_image(params, img)

    pos_sims, neg_sims = [], []
    for _ in range(6):
        x = rng.uniform(-8, 8)
        z = rng.uniform(-2, 14)
        yaw = rng.uniform(0, 2 * np.pi)
        e0 = np.asarray(render(x, z, yaw))
        # positive: jittered same place/heading
        e1 = np.asarray(render(x + rng.normal(0, 0.3),
                               z + rng.normal(0, 0.3),
                               yaw + rng.normal(0, np.deg2rad(3))))
        # negatives: far place, and same place rotated 120 degrees
        e2 = np.asarray(render(rng.uniform(-8, 8), rng.uniform(-2, 14),
                               rng.uniform(0, 2 * np.pi)))
        e3 = np.asarray(render(x, z, yaw + 2 * np.pi / 3))
        pos_sims.append(float(e0 @ e1))
        neg_sims.extend([float(e0 @ e2), float(e0 @ e3)])
    assert min(pos_sims) > max(neg_sims) + 0.1, (pos_sims, neg_sims)
    assert np.mean(pos_sims) > 0.8, pos_sims
