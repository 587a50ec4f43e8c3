"""Synthetic scenes with known geometry for kernel + pipeline tests.

The reference has no tests (SURVEY.md §4); this module is the fixture layer the
new test suite is built on: smooth random textures for flow/corner kernels and
a blob-rendered 3-D world for end-to-end SLAM tests with exact ground truth.
"""

import jax
import jax.numpy as jnp
import numpy as np

from stereovision_slam_tpu.geometry import se3
from stereovision_slam_tpu.geometry.camera import Camera, world2pixel, world2camera


def smooth_texture(key, H, W, octaves=4):
    """Random multi-octave smooth texture in [0, 255]."""
    img = jnp.zeros((H, W))
    for o in range(octaves):
        h, w = max(H // (2 ** (octaves - o)), 2), max(W // (2 ** (octaves - o)), 2)
        key, sub = jax.random.split(key)
        coarse = jax.random.uniform(sub, (h, w))
        img = img + jax.image.resize(coarse, (H, W), "bilinear") * (2.0 ** o)
    img = img - img.min()
    return img / img.max() * 255.0


def translate_image(img, dx, dy):
    """Shift image content by (dx, dy) (new(x) = old(x - d)), bilinear."""
    H, W = img.shape
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    coords = jnp.stack([yy - dy, xx - dx])
    return jax.scipy.ndimage.map_coordinates(img, coords, order=1, mode="nearest")


def make_stereo_rig(fx=350.0, fy=350.0, cx=310.0, cy=94.0, baseline=0.54):
    """KITTI-like rectified stereo rig (left at origin, right at +baseline x).

    Matches the reference's camera construction from calib.txt where the
    extrinsic translation is t = K^-1 p4 (dataset.cpp:24-86): the right
    camera's extrinsic maps rig -> camera, so its x-translation is -baseline.
    """
    left = Camera.create(fx, fy, cx, cy, baseline=0.0)
    right_pose = se3.se3_from_Rt(jnp.eye(3), jnp.array([-baseline, 0.0, 0.0]))
    right = Camera.create(fx, fy, cx, cy, baseline=baseline, pose=right_pose)
    return left, right


def random_landmarks(key, n, x_range=(-15.0, 15.0), y_range=(-3.0, 6.0),
                     z_range=(5.0, 60.0)):
    kx, ky, kz = jax.random.split(key, 3)
    x = jax.random.uniform(kx, (n,), minval=x_range[0], maxval=x_range[1])
    y = jax.random.uniform(ky, (n,), minval=y_range[0], maxval=y_range[1])
    z = jax.random.uniform(kz, (n,), minval=z_range[0], maxval=z_range[1])
    return jnp.stack([x, y, z], axis=-1)


from functools import partial


@partial(jax.jit, static_argnames=("H", "W", "sigma", "distinct"))
def render_blobs(pts_uv, H, W, sigma=1.5, amplitudes=None, distinct=False):
    """Render gaussian blobs at (N, 2) pixel positions onto an (H, W) image.

    Dense evaluation (fine for test-sized images) so blobs are differentiable
    landmarks trackable by LK. With ``distinct=True`` each landmark gets a
    deterministic anisotropic shape (per-axis sigma + orientation), making
    local appearance discriminative for descriptor matching.
    """
    n = pts_uv.shape[0]
    if amplitudes is None:
        amplitudes = jnp.full(n, 200.0)
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    dx = xx[None] - pts_uv[:, 0, None, None]
    dy = yy[None] - pts_uv[:, 1, None, None]
    if distinct:
        idx = jnp.arange(n, dtype=jnp.float32)
        sx = sigma * (0.8 + 0.9 * ((idx * 0.37) % 1.0))[:, None, None]
        sy = sigma * (0.8 + 0.9 * ((idx * 0.61) % 1.0))[:, None, None]
        ang = (idx * 2.39996)[:, None, None]  # golden-angle spread
        ca, sa = jnp.cos(ang), jnp.sin(ang)
        u = ca * dx + sa * dy
        v = -sa * dx + ca * dy
        d2 = (u / sx) ** 2 + (v / sy) ** 2
        blobs = amplitudes[:, None, None] * jnp.exp(-d2 / 2.0)
    else:
        d2 = dx ** 2 + dy ** 2
        blobs = amplitudes[:, None, None] * jnp.exp(-d2 / (2 * sigma * sigma))
    return jnp.clip(jnp.sum(blobs, axis=0) + 30.0, 0.0, 255.0)


def render_stereo_sequence(key, poses, landmarks, H=188, W=620, sigma=1.5,
                           rig=None):
    """Render left/right images of a blob world for each rig pose.

    Args:
      poses: (T, 3, 4) rig poses (T_c_w, world->rig).
      landmarks: (N, 3) world points.

    Returns:
      lefts, rights: (T, H, W) arrays.
    """
    if rig is None:
        rig = make_stereo_rig()
    left, right = rig
    amp_key, _ = jax.random.split(key)
    amps = jax.random.uniform(amp_key, (landmarks.shape[0],), minval=120.0,
                              maxval=230.0)
    @partial(jax.jit, static_argnames=())
    def render_one(pose):
        uv_l = world2pixel(left, landmarks, pose)
        uv_r = world2pixel(right, landmarks, pose)
        z = world2camera(left, landmarks, pose)[:, 2]
        amps_t = jnp.where(z > 0.5, amps, 0.0)
        return (render_blobs(uv_l, H, W, sigma, amps_t),
                render_blobs(uv_r, H, W, sigma, amps_t))

    lefts, rights = [], []
    for t in range(poses.shape[0]):
        l, r = render_one(poses[t])
        lefts.append(l)
        rights.append(r)
    return jnp.stack(lefts), jnp.stack(rights)


def forward_motion_poses(T, step=0.8, yaw_rate=0.0):
    """T rig poses moving forward (+z in camera convention) with optional yaw.

    Returns (T, 3, 4) T_c_w (world->rig) poses; pose 0 = identity.
    """
    poses = [se3.se3_identity()]
    delta = se3.se3_exp(jnp.array([0.0, 0.0, -step, 0.0, yaw_rate, 0.0]))
    for _ in range(T - 1):
        poses.append(se3.se3_compose(delta, poses[-1]))
    return jnp.stack(poses)
