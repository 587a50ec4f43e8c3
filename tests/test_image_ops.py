import jax
import jax.numpy as jnp
import numpy as np

from stereovision_slam_tpu.ops import image as imops
from tests import synthetic


def test_gaussian_kernel_normalized():
    k = imops.gaussian_kernel1d(7)
    np.testing.assert_allclose(float(jnp.sum(k)), 1.0, rtol=1e-6)


def test_pyramid_shapes():
    img = jnp.zeros((188, 620))
    pyr = imops.build_pyramid(img, 4)
    assert [p.shape for p in pyr] == [(188, 620), (94, 310), (47, 155), (24, 78)]


def test_resize_half():
    img = jnp.arange(16.0).reshape(4, 4)
    out = imops.resize_half(img)
    assert out.shape == (2, 2)
    np.testing.assert_allclose(np.asarray(out)[0, 0], (0 + 1 + 4 + 5) / 4)


def test_scharr_gradient_of_ramp():
    # image = 3*x + 5*y  ->  Ix = 3, Iy = 5 in the interior
    H, W = 32, 40
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    img = 3.0 * xx + 5.0 * yy
    ix, iy = imops.scharr_gradients(img)
    np.testing.assert_allclose(np.asarray(ix[8:-8, 8:-8]), 3.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(iy[8:-8, 8:-8]), 5.0, atol=1e-3)


def test_sample_patches_integer_centers():
    img = jnp.arange(100.0).reshape(10, 10)
    pts = jnp.array([[5.0, 4.0]])  # x=5, y=4
    patches, valid = imops.sample_patches(img, pts, 3)
    assert bool(valid[0])
    expected = np.asarray(img)[3:6, 4:7]
    np.testing.assert_allclose(np.asarray(patches[0]), expected, atol=1e-5)


def test_sample_patches_subpixel():
    img = jnp.tile(jnp.arange(16.0)[None, :], (16, 1))  # value == x
    pts = jnp.array([[7.25, 8.0], [6.5, 5.5]])
    patches, valid = imops.sample_patches(img, pts, 5)
    assert bool(jnp.all(valid))
    np.testing.assert_allclose(np.asarray(patches[0])[2, 2], 7.25, atol=1e-5)
    np.testing.assert_allclose(np.asarray(patches[1])[2, 2], 6.5, atol=1e-5)


def test_sample_patches_out_of_bounds_flagged():
    img = jnp.zeros((20, 20))
    pts = jnp.array([[1.0, 1.0], [18.5, 10.0], [10.0, 10.0]])
    _, valid = imops.sample_patches(img, pts, 7)
    assert not bool(valid[0])
    assert not bool(valid[1])
    assert bool(valid[2])


def test_bilinear_sample():
    img = jnp.tile(jnp.arange(16.0)[None, :], (16, 1))
    vals, valid = imops.bilinear_sample(img, jnp.array([[3.5, 8.0]]))
    assert bool(valid[0])
    np.testing.assert_allclose(float(vals[0]), 3.5, atol=1e-5)
