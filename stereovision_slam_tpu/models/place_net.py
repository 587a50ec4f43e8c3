"""PlaceNet: a compact learned place-recognition embedder.

The reference nominates loop-closure candidates with MobileNet-V2 GAP
embeddings from a pretrained ONNX artifact
(/root/reference/src/loopclosure.cpp:73-129). That artifact does not exist in
this environment (/root/reference/.MISSING_LARGE_BLOBS), so instead of
shipping an undiscriminative stand-in, this module defines a small conv
embedder TRAINED IN-REPO on the synthetic arena renderer (exact pose ground
truth supplies contrastive labels): benchmarks/train_place_net.py renders
randomized worlds (texture phase / radius / center), samples pose pairs, and
optimizes an InfoNCE objective so that views within ~1.5 m and ~10 deg of
heading embed nearby while other places (and the SAME place at a different
heading — a forward camera cannot close a loop sideways) embed far apart.

Architecture (TPU-first): fixed 48x160 grayscale input (blur + resize, any
source size), four stride-2 convs (NHWC, bf16 MXU compute), then a pooling
that KEEPS a coarse horizontal layout (1x5 cells — heading discrimination
lives in left-right structure; pure GAP like MobileNet's would discard it),
a linear projection to 256-d, L2 normalization, and zero-padding to the
1280-d database layout shared with the MobileNet path (slam/fused_loop.py
LoopState.db_embed), so the two embedders are drop-in interchangeable.

Weights ship in-repo at `weights/place_net.npz` (~1.4 MB); `get_params()`
loads them. Training/validation protocol + measured precision/recall:
docs/PERFORMANCE.md (round 5) and tests/test_place_net.py.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from stereovision_slam_tpu.ops import image as imops

EMBED_DIM = 1280         # database layout (matches MobileNet path)
PROJ_DIM = 256           # learned embedding width (rest is zero-padded)
IN_H, IN_W = 48, 160     # fixed network input
# (out_ch, kernel, stride); all conv+relu, NHWC
_CONVS = [(32, 5, 2), (64, 3, 2), (96, 3, 2), (128, 3, 2)]
_POOL_W = 5              # horizontal cells kept before projection

WEIGHTS_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "weights", "place_net.npz")


def preprocess(img_gray: jax.Array) -> jax.Array:
    """(H, W) grayscale [0,255] -> (IN_H, IN_W) normalized float.

    Blur-before-resize antialiases the ~4x decimation (jax.image.resize
    "linear" point-samples); the normalization centers to roughly [-0.5, 0.5]
    so photometric gain/bias augmentation at train time spans the deployed
    input distribution.
    """
    img = imops.gaussian_blur(img_gray, 7)
    img = jax.image.resize(img, (IN_H, IN_W), "linear")
    return img / 255.0 - 0.5


def forward(params: dict, x: jax.Array,
            compute_dtype=jnp.bfloat16) -> jax.Array:
    """(N, IN_H, IN_W) preprocessed inputs -> (N, PROJ_DIM) L2-normalized.

    Inference runs bf16 MXU convs (f32 accumulation); training passes
    `compute_dtype=jnp.float32` (the conv VJP requires matching dtypes).
    """
    h = x[..., None]
    for i, (_, _, stride) in enumerate(_CONVS):
        w, b = params["convs"][i]["w"], params["convs"][i]["b"]
        h = lax.conv_general_dilated(
            h.astype(compute_dtype), w.astype(compute_dtype),
            window_strides=(stride, stride),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        h = jax.nn.relu(h + b)
    # pool: collapse y entirely, keep _POOL_W horizontal cells (coarse
    # left-right layout carries heading; see module docstring)
    N, Hc, Wc, C = h.shape
    assert Wc % _POOL_W == 0, (Wc, _POOL_W)
    h = h.reshape(N, Hc, _POOL_W, Wc // _POOL_W, C).mean(axis=(1, 3))
    h = h.reshape(N, _POOL_W * C)
    v = h @ params["proj"]["w"] + params["proj"]["b"]
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)


@jax.jit
def embed_image(params: dict, img_gray: jax.Array) -> jax.Array:
    """(H, W) grayscale -> (EMBED_DIM,) L2-normalized, zero-padded."""
    v = forward(params, preprocess(img_gray)[None])[0]
    return jnp.pad(v, (0, EMBED_DIM - PROJ_DIM))


def init_params(key=None, seed: int = 0) -> dict:
    if key is None:
        key = jax.random.PRNGKey(seed)
    keys = iter(jax.random.split(key, 16))
    convs = []
    cin = 1
    for cout, k, _ in _CONVS:
        fan_in = k * k * cin
        w = (jax.random.normal(next(keys), (k, k, cin, cout))
             * np.sqrt(2.0 / fan_in)).astype(jnp.float32)
        convs.append({"w": w, "b": jnp.zeros((cout,), jnp.float32)})
        cin = cout
    feat = _POOL_W * cin
    pw = (jax.random.normal(next(keys), (feat, PROJ_DIM))
          * np.sqrt(1.0 / feat)).astype(jnp.float32)
    return {"convs": convs,
            "proj": {"w": pw, "b": jnp.zeros((PROJ_DIM,), jnp.float32)}}


def save_params(params: dict, path: str = WEIGHTS_PATH) -> None:
    flat = {}
    for i, c in enumerate(params["convs"]):
        flat[f"conv{i}_w"] = np.asarray(c["w"], np.float32)
        flat[f"conv{i}_b"] = np.asarray(c["b"], np.float32)
    flat["proj_w"] = np.asarray(params["proj"]["w"], np.float32)
    flat["proj_b"] = np.asarray(params["proj"]["b"], np.float32)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **flat)


def load_params(path: str = WEIGHTS_PATH) -> dict:
    data = np.load(path)
    convs = [{"w": jnp.asarray(data[f"conv{i}_w"]),
              "b": jnp.asarray(data[f"conv{i}_b"])}
             for i in range(len(_CONVS))]
    return {"convs": convs,
            "proj": {"w": jnp.asarray(data["proj_w"]),
                     "b": jnp.asarray(data["proj_b"])}}


def get_params(path: str = WEIGHTS_PATH) -> dict | None:
    """The shipped trained weights, or None if the artifact is absent."""
    if os.path.exists(path):
        return load_params(path)
    return None
