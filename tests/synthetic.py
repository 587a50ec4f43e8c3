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


@partial(jax.jit, static_argnames=("H", "W", "sigma", "win", "distinct"))
def render_blobs_splat(pts_uv, H, W, sigma=1.5, amplitudes=None, win=15,
                       distinct=False):
    """Sparse blob renderer: each landmark splats a win x win patch via
    scatter-add — O(N * win^2) instead of O(N * H * W), needed once scenes
    have hundreds of landmarks over long sequences."""
    n = pts_uv.shape[0]
    if amplitudes is None:
        amplitudes = jnp.full(n, 200.0)
    r = win // 2
    # points far outside the image (or non-finite, e.g. z~0 projections)
    # must not splat: the float->int32 cast of huge coords is undefined and
    # can wrap into valid indices (ghost blobs)
    sane = (jnp.isfinite(pts_uv).all(axis=1)
            & (pts_uv[:, 0] > -4 * win) & (pts_uv[:, 0] < W + 4 * win)
            & (pts_uv[:, 1] > -4 * win) & (pts_uv[:, 1] < H + 4 * win))
    amplitudes = jnp.where(sane, amplitudes, 0.0)
    pts_uv = jnp.where(sane[:, None], pts_uv, -2.0 * win)
    base = jnp.floor(pts_uv) - r            # (N, 2) top-left, float
    frac_off = pts_uv - base                # in [r, r+1)
    dy = jnp.arange(win, dtype=jnp.float32)
    dx = jnp.arange(win, dtype=jnp.float32)
    # distances of each patch cell to the (sub-pixel) center
    ddx = dx[None, None, :] - frac_off[:, 0, None, None]
    ddy = dy[None, :, None] - frac_off[:, 1, None, None]
    if distinct:
        idx = jnp.arange(n, dtype=jnp.float32)
        sx = sigma * (0.8 + 0.9 * ((idx * 0.37) % 1.0))[:, None, None]
        sy = sigma * (0.8 + 0.9 * ((idx * 0.61) % 1.0))[:, None, None]
        ang = (idx * 2.39996)[:, None, None]
        ca, sa = jnp.cos(ang), jnp.sin(ang)
        u = ca * ddx + sa * ddy
        v = -sa * ddx + ca * ddy
        patch = amplitudes[:, None, None] * jnp.exp(
            -((u / sx) ** 2 + (v / sy) ** 2) / 2.0)
    else:
        patch = amplitudes[:, None, None] * jnp.exp(
            -(ddx * ddx + ddy * ddy) / (2 * sigma * sigma))
    # scatter-add into a padded canvas so every index is in bounds by
    # construction (scatter modes clamp border-crossing cells onto the edge,
    # which folds blob energy onto border pixels)
    pad = 5 * win
    ys = base[:, 1].astype(jnp.int32)[:, None, None] + \
        jnp.arange(win, dtype=jnp.int32)[None, :, None] + pad
    xs = base[:, 0].astype(jnp.int32)[:, None, None] + \
        jnp.arange(win, dtype=jnp.int32)[None, None, :] + pad
    ys = jnp.broadcast_to(jnp.clip(ys, 0, H + 2 * pad - 1), (n, win, win))
    xs = jnp.broadcast_to(jnp.clip(xs, 0, W + 2 * pad - 1), (n, win, win))
    canvas = jnp.zeros((H + 2 * pad, W + 2 * pad), jnp.float32)
    canvas = canvas.at[ys, xs].add(patch)
    img = canvas[pad:pad + H, pad:pad + W]
    return jnp.clip(img + 30.0, 0.0, 255.0)


def render_stereo_sequence(key, poses, landmarks, H=188, W=620, sigma=1.5,
                           rig=None, distinct=False):
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
        return (render_blobs_splat(uv_l, H, W, sigma, amps_t, distinct=distinct),
                render_blobs_splat(uv_r, H, W, sigma, amps_t, distinct=distinct))

    lefts, rights = [], []
    for t in range(poses.shape[0]):
        l, r = render_one(poses[t])
        lefts.append(l)
        rights.append(r)
    return jnp.stack(lefts), jnp.stack(rights)


def _value_noise(x: jax.Array, z: jax.Array, octaves=4, base_scale=0.7,
                 phase=0.0):
    """Deterministic multi-octave value noise over 2-D coordinates.

    Lattice hashes + bilinear interpolation; smooth, richly textured, exact
    under resampling — what LK/GFTT need to behave like on real imagery.

    `phase` reseeds the lattice hash: two different phases give statistically
    independent textures (the hash is a chaotic sin-fraction), so randomized
    WORLDS for embedder training / held-out validation come from the same
    renderer as the bench scene (phase 0.0 keeps every existing scene
    bit-identical).
    """
    total = jnp.zeros_like(x)
    amp = 1.0
    for o in range(octaves):
        s = base_scale * (2.0 ** o)
        xs = x * s
        zs = z * s
        x0 = jnp.floor(xs)
        z0 = jnp.floor(zs)
        fx = xs - x0
        fz = zs - z0
        # smoothstep
        fx = fx * fx * (3.0 - 2.0 * fx)
        fz = fz * fz * (3.0 - 2.0 * fz)

        def h(ix, iz):
            v = jnp.sin(ix * 127.1 + iz * 311.7 + o * 74.7
                        + phase * 961.7) * 43758.5453
            return v - jnp.floor(v)

        v00 = h(x0, z0)
        v10 = h(x0 + 1, z0)
        v01 = h(x0, z0 + 1)
        v11 = h(x0 + 1, z0 + 1)
        val = ((1 - fx) * (1 - fz) * v00 + fx * (1 - fz) * v10
               + (1 - fx) * fz * v01 + fx * fz * v11)
        total = total + amp * val
        amp *= 0.55
    return total / 2.1


@partial(jax.jit, static_argnames=("H", "W", "wall_symmetry"))
def render_textured_view_cylinder(cam_params, T_cw, H, W, ground_y=1.7,
                                  center_x=0.0, center_z=0.0, radius=30.0,
                                  wall_symmetry: int = 0, tex_phase=0.0):
    """Raycast variant for loop-closure scenarios: textured ground plane
    inside a textured cylinder wall — a closed arena, so a circular
    trajectory revisits identical views.

    `wall_symmetry=k` makes the wall's LOW-frequency texture repeat k times
    around the cylinder while keeping a unique high-frequency component:
    a global-pooled place embedding (thumbnail / MobileNet) aliases between
    the k look-alike sectors, but fine ORB detail still distinguishes them
    — the perceptual-aliasing adversarial scenario (a false candidate must
    die at the match/PnP gates, loopclosure.cpp:286-437)."""
    fx, fy, cx, cy = cam_params
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    d_cam = jnp.stack([(xx - cx) / fx, (yy - cy) / fy, jnp.ones_like(xx)],
                      axis=-1)
    R = T_cw[:3, :3]
    t = T_cw[:3, 3]
    o = -R.T @ t
    d = jnp.einsum("ji,hwj->hwi", R, d_cam)
    BIG = 1e9

    dy = d[..., 1]
    t_g = (ground_y - o[1]) / jnp.where(jnp.abs(dy) < 1e-6, 1e-6, dy)
    t_g = jnp.where((dy > 1e-4) & (t_g > 0.0) & (t_g < 400.0), t_g, BIG)

    # ray-cylinder: |o_xz + t d_xz - c|^2 = radius^2
    ox = o[0] - center_x
    oz = o[2] - center_z
    dx = d[..., 0]
    dz = d[..., 2]
    a = dx * dx + dz * dz
    b = 2.0 * (ox * dx + oz * dz)
    c = ox * ox + oz * oz - radius * radius
    disc = b * b - 4 * a * c
    a_safe = jnp.where(jnp.abs(a) < 1e-9, 1e-9, a)
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t1 = (-b - sq) / (2 * a_safe)
    t2 = (-b + sq) / (2 * a_safe)
    t_c = jnp.where(t1 > 1e-3, t1, t2)
    y_at = o[1] + t_c * dy
    t_c = jnp.where((disc > 0) & (t_c > 1e-3) & (y_at < ground_y)
                    & (y_at > -10.0), t_c, BIG)

    t_hit = jnp.minimum(t_g, t_c)
    px = o[0] + t_hit * d[..., 0]
    py = o[1] + t_hit * d[..., 1]
    pz = o[2] + t_hit * d[..., 2]

    ground = _value_noise(px, pz, octaves=5, base_scale=0.9, phase=tex_phase)
    shade = 1.0 / (1.0 + 0.002 * t_hit * t_hit)
    ground_val = 40.0 + 190.0 * ground * (0.35 + 0.65 * shade)
    # wall texture by unrolled angle + height (world-fixed)
    ang = jnp.arctan2(px - center_x, pz - center_z)
    if wall_symmetry:
        period = 2.0 * np.pi / wall_symmetry
        ang_s = jnp.mod(ang, period)
        low = _value_noise(ang_s * radius * 0.8, py * 1.6, octaves=3,
                           base_scale=0.35, phase=tex_phase)
        fine = _value_noise(ang * radius * 0.8 + 37.0, py * 1.6, octaves=2,
                            base_scale=3.2, phase=tex_phase)
        wall = 0.78 * low + 0.22 * fine
    else:
        wall = _value_noise(ang * radius * 0.8, py * 1.6, octaves=5,
                            base_scale=0.8, phase=tex_phase)
    wall_val = 55.0 + 170.0 * wall * (0.4 + 0.6 * shade)

    sky_val = 120.0
    val = jnp.where(t_hit >= BIG, sky_val,
                    jnp.where(t_g <= t_c, ground_val, wall_val))
    return jnp.clip(val, 0.0, 255.0)


def render_arena_stereo_sequence(poses, H=188, W=620, rig=None,
                                 center=(0.0, 10.0), radius=30.0,
                                 wall_symmetry: int = 0, tex_phase=0.0):
    """Cylindrical-arena stereo sequence (loop-closure scenarios)."""
    if rig is None:
        rig = make_stereo_rig()
    left, right = rig
    from stereovision_slam_tpu.geometry import se3 as _se3

    @jax.jit
    def render_pair(pose):
        Tl = _se3.se3_compose(left.pose, pose)
        Tr = _se3.se3_compose(right.pose, pose)
        pl = (left.fx, left.fy, left.cx, left.cy)
        pr = (right.fx, right.fy, right.cx, right.cy)
        return (render_textured_view_cylinder(pl, Tl, H, W,
                                              center_x=center[0],
                                              center_z=center[1],
                                              radius=radius,
                                              wall_symmetry=wall_symmetry,
                                              tex_phase=tex_phase),
                render_textured_view_cylinder(pr, Tr, H, W,
                                              center_x=center[0],
                                              center_z=center[1],
                                              radius=radius,
                                              wall_symmetry=wall_symmetry,
                                              tex_phase=tex_phase))

    lefts, rights = [], []
    for t in range(poses.shape[0]):
        l, r = render_pair(poses[t])
        lefts.append(l)
        rights.append(r)
    return jnp.stack(lefts), jnp.stack(rights)


@partial(jax.jit, static_argnames=("H", "W", "wall_symmetry", "n_pillars"))
def render_textured_view_cylinder_hard(cam_params, T_cw, H, W, t=0.0,
                                       ground_y=1.7, center_x=0.0,
                                       center_z=0.0, radius=30.0,
                                       wall_symmetry: int = 0,
                                       n_pillars: int = 6, tex_phase=0.0):
    """The arena scene hardened toward real-sequence statistics (VERDICT r4
    #6): static occluding PILLARS (vertical cylinders with their own
    texture — genuine 3-D occluders with parallax) and one INDEPENDENTLY
    MOVING SPHERE orbiting the arena (its pixels violate the static-world
    assumption every estimator stage relies on, the reason the reference
    carries outlier machinery at every stage, frontend.cpp:394-558,
    backend.cpp:166-213).

    `t` is the frame time driving the moving object. Photometric nuisance
    (gain/bias/vignette/noise/blur) is applied by the sequence renderer on
    top (apply_photometric_nuisance), not here, so geometry tests can use
    the clean radiance."""
    base = render_textured_view_cylinder(cam_params, T_cw, H, W,
                                         ground_y=ground_y,
                                         center_x=center_x,
                                         center_z=center_z, radius=radius,
                                         wall_symmetry=wall_symmetry,
                                         tex_phase=tex_phase)
    fx, fy, cx, cy = cam_params
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    d_cam = jnp.stack([(xx - cx) / fx, (yy - cy) / fy, jnp.ones_like(xx)],
                      axis=-1)
    R = T_cw[:3, :3]
    tt = T_cw[:3, 3]
    o = -R.T @ tt
    d = jnp.einsum("ji,hwj->hwi", R, d_cam)
    BIG = 1e9
    t_best = jnp.full((H, W), BIG)
    val = base

    # static pillars on a deterministic ring at 0.55 * radius
    for k in range(n_pillars):
        ang = 2.0 * np.pi * (k + 0.35) / n_pillars
        pcx = center_x + 0.55 * radius * np.sin(ang)
        pcz = center_z + 0.55 * radius * np.cos(ang)
        pr = 0.5 + 0.25 * ((k * 0.37) % 1.0)
        ox = o[0] - pcx
        oz = o[2] - pcz
        a = d[..., 0] ** 2 + d[..., 2] ** 2
        b = 2.0 * (ox * d[..., 0] + oz * d[..., 2])
        c = ox * ox + oz * oz - pr * pr
        disc = b * b - 4 * a * c
        a_safe = jnp.where(jnp.abs(a) < 1e-9, 1e-9, a)
        t_hit = (-b - jnp.sqrt(jnp.maximum(disc, 0.0))) / (2 * a_safe)
        y_at = o[1] + t_hit * d[..., 1]
        ok = (disc > 0) & (t_hit > 1e-3) & (y_at < ground_y) & (y_at > -2.2)
        t_hit = jnp.where(ok, t_hit, BIG)
        px = o[0] + t_hit * d[..., 0]
        py = o[1] + t_hit * d[..., 1]
        tex = _value_noise(px * 2.1 + k * 13.7, py * 2.3,
                           octaves=3, base_scale=1.4, phase=tex_phase)
        pv = 50.0 + 170.0 * tex
        closer = t_hit < t_best
        val = jnp.where(closer, pv, val)
        t_best = jnp.minimum(t_best, t_hit)

    # one moving sphere orbiting at 0.35 * radius, ~1.5 m/s tangential
    m_ang = 0.08 * t
    scx = center_x + 0.35 * radius * jnp.sin(m_ang)
    scz = center_z + 0.35 * radius * jnp.cos(m_ang)
    scy = 0.4
    sr = 0.8
    oc = jnp.stack([o[0] - scx, o[1] - scy, o[2] - scz])
    b = 2.0 * jnp.einsum("hwi,i->hw", d, oc)
    a = jnp.sum(d * d, axis=-1)
    c = oc @ oc - sr * sr
    disc = b * b - 4 * a * c
    t_hit = (-b - jnp.sqrt(jnp.maximum(disc, 0.0))) / (2 * a)
    ok = (disc > 0) & (t_hit > 1e-3)
    t_hit = jnp.where(ok, t_hit, BIG)
    # textured by surface normal direction (rotates as it orbits)
    hit = o[None, None, :] + t_hit[..., None] * d
    n = hit - jnp.stack([scx, scy, scz])
    tex = _value_noise(jnp.arctan2(n[..., 0], n[..., 2]) * 3.0 + m_ang * 5.0,
                       n[..., 1] * 4.0, octaves=3, base_scale=1.2)
    sv = 60.0 + 160.0 * tex
    val = jnp.where(t_hit < t_best, sv, val)
    return jnp.clip(val, 0.0, 255.0)


def apply_photometric_nuisance(img, key, t):
    """Per-frame exposure/gain drift, radial vignette, sensor noise, and
    mild horizontal motion blur — the photometric failure modes real
    sequences (auto-exposure cameras, rolling shutter) are made of.

    Magnitudes are calibrated to real auto-exposure behavior: the gain
    drifts +-12% over ~80 frames (peak ~1.2%/frame — consumer AE converges
    over tens of frames; a first cut at 7%/frame collapsed tracking
    outright, which is outlier-REJECTION territory, not robustness)."""
    H, W = img.shape
    k1, k2 = jax.random.split(key)
    gain = (1.0 + 0.12 * jnp.sin(0.08 * t)
            + 0.01 * jax.random.normal(k1, ()))
    bias = 8.0 * jnp.sin(0.05 * t + 1.2)
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    r2 = (((xx - W / 2) / (W / 2)) ** 2 + ((yy - H / 2) / (H / 2)) ** 2)
    vignette = 1.0 - 0.18 * r2
    # 3-tap horizontal blur (mild motion blur along the dominant flow)
    blurred = (0.25 * jnp.roll(img, 1, axis=1) + 0.5 * img
               + 0.25 * jnp.roll(img, -1, axis=1))
    noise = 2.5 * jax.random.normal(k2, img.shape)
    return jnp.clip(blurred * gain * vignette + bias + noise, 0.0, 255.0)


def render_hard_arena_stereo_sequence(poses, H=188, W=620, rig=None,
                                      center=(0.0, 10.0), radius=30.0,
                                      tex_phase=0.0, seed=0,
                                      photometric=True):
    """Hardened arena stereo sequence: occluder pillars + a moving sphere +
    per-frame photometric nuisance (left AND right get the same gain state
    but independent noise — like a real synchronized stereo rig)."""
    if rig is None:
        rig = make_stereo_rig()
    left, right = rig
    from stereovision_slam_tpu.geometry import se3 as _se3

    @jax.jit
    def render_pair(pose, t, key):
        Tl = _se3.se3_compose(left.pose, pose)
        Tr = _se3.se3_compose(right.pose, pose)
        pl = (left.fx, left.fy, left.cx, left.cy)
        pr = (right.fx, right.fy, right.cx, right.cy)
        kl, kr = jax.random.split(key)
        il = render_textured_view_cylinder_hard(
            pl, Tl, H, W, t=t, center_x=center[0], center_z=center[1],
            radius=radius, tex_phase=tex_phase)
        ir = render_textured_view_cylinder_hard(
            pr, Tr, H, W, t=t, center_x=center[0], center_z=center[1],
            radius=radius, tex_phase=tex_phase)
        if photometric:
            il = apply_photometric_nuisance(il, kl, t)
            ir = apply_photometric_nuisance(ir, kr, t)
        return il, ir

    key = jax.random.PRNGKey(seed)
    lefts, rights = [], []
    for t in range(poses.shape[0]):
        key, sub = jax.random.split(key)
        l, r = render_pair(poses[t], jnp.float32(t), sub)
        lefts.append(l)
        rights.append(r)
    return jnp.stack(lefts), jnp.stack(rights)


@partial(jax.jit, static_argnames=("H", "W"))
def render_textured_view(cam_params, T_cw, H, W, ground_y=1.7):
    """Raycast a textured world: ground plane (strong parallax texture) +
    infinitely-distant angular sky texture. Geometry is exact under the
    pinhole model, so stereo disparity / optical flow / triangulation all
    have rigorous ground truth — unlike blob fields, the texture is
    everywhere and self-dissimilar (no LK wrong-locks).

    cam_params: (fx, fy, cx, cy) scalars. T_cw: (3, 4) world->camera.
    """
    fx, fy, cx, cy = cam_params
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    d_cam = jnp.stack([(xx - cx) / fx, (yy - cy) / fy, jnp.ones_like(xx)],
                      axis=-1)                     # (H, W, 3)
    R = T_cw[:3, :3]
    t = T_cw[:3, 3]
    o = -R.T @ t                                   # camera center in world
    d = jnp.einsum("ji,hwj->hwi", R, d_cam)        # rays in world

    BIG = 1e9

    # ground plane world y = ground_y (y down)
    dy = d[..., 1]
    t_g = (ground_y - o[1]) / jnp.where(jnp.abs(dy) < 1e-6, 1e-6, dy)
    t_g = jnp.where((dy > 1e-4) & (t_g > 0.0) & (t_g < 400.0), t_g, BIG)

    # vertical side walls at world x = +-wall_x (textured building fronts);
    # they give off-plane structure so pose estimation is well-conditioned
    wall_x = 13.0
    dx = d[..., 0]
    dx_safe = jnp.where(jnp.abs(dx) < 1e-6, 1e-6, dx)
    t_wl = (-wall_x - o[0]) / dx_safe
    t_wr = (wall_x - o[0]) / dx_safe
    def wall_valid(t_w):
        y_at = o[1] + t_w * d[..., 1]
        return (t_w > 0.0) & (t_w < 400.0) & (y_at < ground_y) & (y_at > -8.0)
    t_wl = jnp.where(wall_valid(t_wl), t_wl, BIG)
    t_wr = jnp.where(wall_valid(t_wr), t_wr, BIG)
    t_w = jnp.minimum(t_wl, t_wr)

    t_hit = jnp.minimum(t_g, t_w)
    px = o[0] + t_hit * d[..., 0]
    py = o[1] + t_hit * d[..., 1]
    pz = o[2] + t_hit * d[..., 2]

    ground = _value_noise(px, pz, octaves=5, base_scale=0.9)
    shade = 1.0 / (1.0 + 0.004 * t_hit * t_hit)
    ground_val = 40.0 + 190.0 * ground * (0.35 + 0.65 * shade)
    wall = _value_noise(pz * 1.3, py * 1.6, octaves=5, base_scale=0.8)
    wall_val = 55.0 + 170.0 * wall * (0.4 + 0.6 * shade)

    # sky: angular texture (infinitely far -> zero parallax, world-fixed)
    norm = jnp.linalg.norm(d, axis=-1, keepdims=True)
    dn = d / jnp.maximum(norm, 1e-9)
    az = jnp.arctan2(dn[..., 0], dn[..., 2])
    el = dn[..., 1]
    sky = _value_noise(az * 14.0, el * 26.0, octaves=4, base_scale=1.0)
    sky_val = 90.0 + 120.0 * sky

    val = jnp.where(t_hit >= BIG, sky_val,
                    jnp.where(t_g <= t_w, ground_val, wall_val))
    return jnp.clip(val, 0.0, 255.0)


def render_textured_stereo_sequence(poses, H=188, W=620, rig=None,
                                    ground_y=1.7):
    """Textured-world stereo sequence for (T, 3, 4) rig poses."""
    if rig is None:
        rig = make_stereo_rig()
    left, right = rig
    from stereovision_slam_tpu.geometry import se3 as _se3

    @jax.jit
    def render_pair(pose):
        Tl = _se3.se3_compose(left.pose, pose)
        Tr = _se3.se3_compose(right.pose, pose)
        pl = (left.fx, left.fy, left.cx, left.cy)
        pr = (right.fx, right.fy, right.cx, right.cy)
        return (render_textured_view(pl, Tl, H, W, ground_y),
                render_textured_view(pr, Tr, H, W, ground_y))

    lefts, rights = [], []
    for t in range(poses.shape[0]):
        l, r = render_pair(poses[t])
        lefts.append(l)
        rights.append(r)
    return jnp.stack(lefts), jnp.stack(rights)


def figure_eight_poses(T, step=0.5, lead_in=6, tail=8, blend=6):
    """A figure-eight with SMOOTH yaw transitions: straight lead-in (yaw
    ramps up over the last `blend` lead-in frames), a full lobe one way,
    a `blend`-frame ramp to the opposite rate right AFTER the crossing,
    the second lobe, and `tail` frames past the second crossing.

    Instantaneous yaw flips are non-physical and break LK tracking (the
    constant-velocity prediction is off by 2x the per-frame yaw — measured
    as a full tracking collapse through the second lobe); ramping AFTER
    the crossing keeps lobe 1 an exact circle, so the crossing pose
    (~frame `lead_in`) is revisited with the same heading at
    ~`lead_in + half` (sub-cm/sub-degree) and again near `T - tail`
    (~0.2 m / ~7 deg — the blend bends lobe 2 slightly). Two same-view
    revisits = >= 2 loop-closure opportunities. The lead-in matters: the
    pipeline's init keyframe (frame 0) never enters the loop database.
    Returns (T, 3, 4) T_c_w.
    """
    half = (T - lead_in - tail) // 2
    yaw = 2 * jnp.pi / half
    s_flip = lead_in + half
    poses = [se3.se3_identity()]
    for i in range(T - 1):
        if i < lead_in:
            w = 0.0 if i < lead_in - blend else (i - (lead_in - blend)) / blend
        elif i < s_flip:
            w = 1.0
        elif i < s_flip + blend:
            w = 1.0 - 2.0 * (i - s_flip) / blend
        else:
            w = -1.0
        delta = se3.se3_exp(jnp.array([0.0, 0.0, -step, 0.0, yaw * w, 0.0]))
        poses.append(se3.se3_compose(delta, poses[-1]))
    return jnp.stack(poses)


def forward_motion_poses(T, step=0.8, yaw_rate=0.0):
    """T rig poses moving forward (+z in camera convention) with optional yaw.

    Returns (T, 3, 4) T_c_w (world->rig) poses; pose 0 = identity.
    """
    poses = [se3.se3_identity()]
    delta = se3.se3_exp(jnp.array([0.0, 0.0, -step, 0.0, yaw_rate, 0.0]))
    for _ in range(T - 1):
        poses.append(se3.se3_compose(delta, poses[-1]))
    return jnp.stack(poses)
