"""Pinhole stereo camera model as batched JAX functions.

TPU-native equivalent of the reference's Camera class
(/root/reference/src/camera.cpp:13-86, camera.h): intrinsics fx, fy, cx, cy,
a stereo baseline, and a rig->camera extrinsic SE(3). The full projection
chain world <-> camera <-> pixel is provided as pure functions that broadcast
over leading batch dims, so whole feature sets project in one fused call.

Pose conventions (same as the reference):
  * ``T_c_w`` — pose of the stereo rig in the world (world -> rig);
  * ``cam.pose`` — rig -> camera extrinsic;
  * world2camera(p) = cam.pose * T_c_w * p  (camera.cpp:28-37).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from stereovision_slam_tpu.geometry import se3


class Camera(NamedTuple):
    """Static pinhole camera description.

    Fields are scalars (or (3,4) for ``pose``); the struct is a pytree, so it
    can be closed over by jit or passed as an argument.
    """

    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    baseline: jax.Array
    pose: jax.Array       # rig -> camera, (3, 4)
    pose_inv: jax.Array   # camera -> rig, (3, 4)

    @staticmethod
    def create(fx, fy, cx, cy, baseline=0.0, pose=None, dtype=jnp.float32) -> "Camera":
        if pose is None:
            pose = se3.se3_identity(dtype)
        pose = jnp.asarray(pose, dtype)
        return Camera(
            fx=jnp.asarray(fx, dtype),
            fy=jnp.asarray(fy, dtype),
            cx=jnp.asarray(cx, dtype),
            cy=jnp.asarray(cy, dtype),
            baseline=jnp.asarray(baseline, dtype),
            pose=pose,
            pose_inv=se3.se3_inverse(pose),
        )

    def K(self) -> jax.Array:
        """3x3 intrinsic matrix (camera.cpp:13-20)."""
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack(
            [
                jnp.stack([self.fx, z, self.cx], axis=-1),
                jnp.stack([z, self.fy, self.cy], axis=-1),
                jnp.stack([z, z, o], axis=-1),
            ],
            axis=-2,
        )


def world2camera(cam: Camera, p_w: jax.Array, T_c_w: jax.Array) -> jax.Array:
    """World point(s) -> this camera's frame (camera.cpp:28-37)."""
    return se3.se3_apply(cam.pose, se3.se3_apply(T_c_w, p_w))


def camera2world(cam: Camera, p_c: jax.Array, T_c_w: jax.Array) -> jax.Array:
    """Camera-frame point(s) -> world (camera.cpp:40-44)."""
    return se3.se3_apply(se3.se3_inverse(T_c_w), se3.se3_apply(cam.pose_inv, p_c))


def camera2pixel(cam: Camera, p_c: jax.Array) -> jax.Array:
    """Perspective projection K*p/z (camera.cpp:47-54)."""
    z = p_c[..., 2]
    return jnp.stack(
        [
            cam.fx * p_c[..., 0] / z + cam.cx,
            cam.fy * p_c[..., 1] / z + cam.cy,
        ],
        axis=-1,
    )


def pixel2camera(cam: Camera, p_p: jax.Array, depth=1.0) -> jax.Array:
    """Back-project pixel(s) at given depth (camera.cpp:58-72)."""
    depth = jnp.asarray(depth, p_p.dtype)
    return jnp.stack(
        [
            (p_p[..., 0] - cam.cx) * depth / cam.fx,
            (p_p[..., 1] - cam.cy) * depth / cam.fy,
            jnp.broadcast_to(depth, p_p[..., 0].shape),
        ],
        axis=-1,
    )


def world2pixel(cam: Camera, p_w: jax.Array, T_c_w: jax.Array) -> jax.Array:
    """Full chain world -> pixel (camera.cpp:74-80)."""
    return camera2pixel(cam, world2camera(cam, p_w, T_c_w))


def pixel2world(cam: Camera, p_p: jax.Array, T_c_w: jax.Array, depth=1.0) -> jax.Array:
    """Full chain pixel -> world at given depth (camera.cpp:82-86)."""
    return camera2world(cam, pixel2camera(cam, p_p, depth), T_c_w)
