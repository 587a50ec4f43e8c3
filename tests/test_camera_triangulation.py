import jax
import jax.numpy as jnp
import numpy as np

from stereovision_slam_tpu.geometry import se3, triangulation
from stereovision_slam_tpu.geometry.camera import (
    Camera, world2camera, camera2world, camera2pixel, pixel2camera,
    world2pixel, pixel2world,
)


def make_kitti_like_cam(x_offset=0.0):
    pose = se3.se3_from_Rt(jnp.eye(3), jnp.array([x_offset, 0.0, 0.0]))
    return Camera.create(fx=350.0, fy=350.0, cx=310.0, cy=94.0,
                         baseline=abs(x_offset), pose=pose)


def test_projection_roundtrip():
    cam = make_kitti_like_cam()
    T = se3.se3_exp(jnp.array([0.3, -0.1, 0.5, 0.02, -0.01, 0.03]))
    p_w = jnp.array([[1.0, 2.0, 8.0], [-2.0, 0.5, 15.0]])
    p_c = world2camera(cam, p_w, T)
    back = camera2world(cam, p_c, T)
    np.testing.assert_allclose(np.asarray(back), np.asarray(p_w), atol=1e-4)

    uv = camera2pixel(cam, p_c)
    p_c2 = pixel2camera(cam, uv, depth=p_c[..., 2])
    np.testing.assert_allclose(np.asarray(p_c2), np.asarray(p_c), atol=1e-4)


def test_world_pixel_chain():
    cam = make_kitti_like_cam(-0.5)
    T = se3.se3_exp(jnp.array([0.0, 0.0, 1.0, 0.0, 0.05, 0.0]))
    p_w = jnp.array([3.0, -1.0, 20.0])
    uv = world2pixel(cam, p_w, T)
    depth = world2camera(cam, p_w, T)[..., 2]
    back = pixel2world(cam, uv, T, depth)
    np.testing.assert_allclose(np.asarray(back), np.asarray(p_w), atol=1e-3)


def test_K_matrix():
    cam = make_kitti_like_cam()
    K = np.asarray(cam.K())
    np.testing.assert_allclose(K, np.array([[350.0, 0, 310.0],
                                            [0, 350.0, 94.0],
                                            [0, 0, 1.0]]))


def test_triangulate_exact():
    # Two cameras: identity and shifted 0.54m along +x (KITTI-ish baseline).
    key = jax.random.PRNGKey(0)
    pts = jax.random.uniform(key, (128, 3),
                             minval=jnp.array([-10.0, -5.0, 4.0]),
                             maxval=jnp.array([10.0, 5.0, 80.0]))
    poses = jnp.stack([
        se3.se3_identity(),
        se3.se3_from_Rt(jnp.eye(3), jnp.array([-0.54, 0.0, 0.0])),
    ])
    # normalized-plane projections
    obs = []
    for i in range(2):
        pc = se3.se3_apply(poses[i], pts)
        obs.append(pc[:, :2] / pc[:, 2:3])
    obs = jnp.stack(obs, axis=1)  # (N, 2, 2)

    xyz, ok = triangulation.triangulate(poses, obs)
    assert bool(jnp.all(ok))
    np.testing.assert_allclose(np.asarray(xyz), np.asarray(pts), atol=1e-2)


def test_triangulate_rejects_degenerate():
    # both cameras identical -> no parallax -> gate must reject
    poses = jnp.stack([se3.se3_identity(), se3.se3_identity()])
    pts = jnp.array([[0.1, 0.2]])
    obs = jnp.stack([pts, pts], axis=1)
    _, ok = triangulation.triangulate(poses, obs)
    assert not bool(ok[0])


def test_triangulate_stereo_helper():
    key = jax.random.PRNGKey(1)
    pts = jax.random.uniform(key, (64, 3),
                             minval=jnp.array([-5.0, -3.0, 5.0]),
                             maxval=jnp.array([5.0, 3.0, 60.0]))
    b = jnp.array([0.0, -0.54])
    pl = pts[:, :2] / pts[:, 2:3]
    pr = (pts + jnp.array([-0.54, 0.0, 0.0]))[:, :2] / pts[:, 2:3]
    xyz, ok = triangulation.triangulate_stereo(b, pl, pr)
    assert bool(jnp.all(ok))
    np.testing.assert_allclose(np.asarray(xyz), np.asarray(pts), atol=1e-2)
