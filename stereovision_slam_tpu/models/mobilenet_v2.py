"""MobileNet-V2 place-recognition embedder in pure JAX.

TPU-native replacement for the reference's cv::dnn ONNX inference
(/root/reference/src/loopclosure.cpp:73-129): the torchvision MobileNet-V2
architecture up to the global-average-pool, producing the same 1280-d
embedding, L2-normalized. Runs as one jitted conv stack on the MXU (bf16
compute, f32 output) instead of a per-frame ONNX session on the CPU.

Weights: torchvision's `mobilenet_v2` state_dict can be converted with
`load_torchvision_weights` (the reference ships an ONNX export of exactly
those weights, dnn_weights/licence/). Without a weights file (none is
available in this environment), `init_params` provides a deterministic random
network — similarity scores remain usable for testing the loop pipeline
end-to-end, and real weights drop in without code changes.

Preprocessing matches the reference pipeline (loopclosure.cpp:92-129):
grayscale -> 3-channel, Gaussian blur 7x7, resize to 224x224,
blobFromImage(scale=1/255, mean=(0.485, 0.456, 0.406), swapRB) — note
OpenCV subtracts the mean *before* scaling, so the effective transform is
(x - mean) / 255; the reference inherits that quirk and so do we.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from stereovision_slam_tpu.ops import image as imops

# torchvision inverted-residual config: (expand_ratio, channels, repeats, stride)
_IR_CONFIG = [
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
]
EMBED_DIM = 1280


def _conv(x, w, stride=1, groups=1):
    """NHWC conv with HWIO weights, bf16 MXU compute.

    Padding is the torch convention (k//2 on BOTH sides) rather than XLA
    SAME: for stride-2 3x3 convs on even inputs SAME pads (0, 1) while
    torchvision/cv::dnn pad (1, 1) — a one-pixel feature-map shift that
    would break parity with the reference's cv::dnn inference
    (loopclosure.cpp:73-129; verified against torch.onnx exports in
    tests/test_mnv2_weights.py)."""
    kh, kw = w.shape[0], w.shape[1]
    return lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        window_strides=(stride, stride),
        padding=((kh // 2, kh // 2), (kw // 2, kw // 2)),
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )


def _bn(x, p):
    """Inference batch-norm (scale/bias folded at load time)."""
    return x * p["scale"] + p["bias"]


def _conv_bn_relu6(x, p, stride=1, groups=1):
    x = _conv(x, p["w"], stride=stride, groups=groups)
    x = _bn(x, p["bn"])
    return jnp.clip(x, 0.0, 6.0)


def _inverted_residual(x, p, stride, expand):
    inp = x
    h = x
    if expand != 1:
        h = _conv_bn_relu6(h, p["expand"])
    cin = h.shape[-1]
    h = _conv_bn_relu6(h, p["depthwise"], stride=stride, groups=cin)
    h = _conv(h, p["project"]["w"])
    h = _bn(h, p["project"]["bn"])
    if stride == 1 and inp.shape[-1] == h.shape[-1]:
        h = h + inp
    return h


def forward(params: dict, x: jax.Array) -> jax.Array:
    """(N, H, W, 3) preprocessed input -> (N, 1280) embedding (pre-norm)."""
    h = _conv_bn_relu6(x, params["stem"], stride=2)
    i = 0
    for expand, _, repeats, stride in _IR_CONFIG:
        for r in range(repeats):
            h = _inverted_residual(h, params["blocks"][i],
                                   stride if r == 0 else 1, expand)
            i += 1
    h = _conv_bn_relu6(h, params["head"])
    return jnp.mean(h, axis=(1, 2))  # global average pool -> (N, 1280)


def embed(params: dict, x: jax.Array) -> jax.Array:
    """L2-normalized embedding (loopclosure.cpp:128-129)."""
    v = forward(params, x)
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)


def preprocess(img_gray: jax.Array) -> jax.Array:
    """Reference preprocessing: (H, W) grayscale [0,255] -> (1,224,224,3)."""
    img = imops.gaussian_blur(img_gray, 7)
    img = jax.image.resize(img, (224, 224), "linear")
    # per-channel mean shift built from SCALAR constants: a literal
    # jnp.array([...]) would embed a dense f32[3] constant in the executable,
    # which the axon runtime executes pathologically (docs/PERFORMANCE.md
    # "array-constant cliff")
    rgb = jnp.stack([img - 0.485, img - 0.456, img - 0.406], axis=-1)
    return (rgb / 255.0)[None]


@jax.jit
def embed_image(params: dict, img_gray: jax.Array) -> jax.Array:
    """(H, W) grayscale image -> (1280,) L2-normalized embedding."""
    return embed(params, preprocess(img_gray))[0]


@jax.jit
def embed_image_thumbnail(img_gray: jax.Array) -> jax.Array:
    """Weight-free place-recognition embedding: heavily blurred 8x40
    thumbnail, mean-subtracted, L2-normalized, zero-padded to 1280-d (same
    DB shape as MobileNet).

    Used when no pretrained MobileNet weights are available (this
    environment ships none): a randomly-initialized CNN cannot discriminate
    places, while the classic "tiny image" descriptor retains coarse scene
    layout and is fully deterministic.

    The 31-tap blur + coarse grid trade selectivity for SHIFT TOLERANCE: a
    sharp 16x80 thumbnail's self-similarity collapses within ~1 frame of
    panning (~24 px at the KITTI operating point), making revisit detection
    depend on a keyframe landing at the exact loop phase; at this operating
    point a +-2-frame misalignment still scores ~0.55-0.58 against a ~0.26
    unrelated-view background (measured on the circuit bench scene), so
    gates around ~0.5 detect revisits robustly while geometric PnP
    verification supplies the precision (loopclosure.cpp:328-437 —
    similarity only NOMINATES candidates in the reference too)."""
    img = imops.gaussian_blur(img_gray, 31, sigma=7.75)
    thumb = jax.image.resize(img, (8, 40), "linear").reshape(-1)
    thumb = thumb - jnp.mean(thumb)
    thumb = thumb / jnp.maximum(jnp.linalg.norm(thumb), 1e-9)
    return jnp.pad(thumb, (0, EMBED_DIM - thumb.shape[0]))


# --------------------------------------------------------------------- #
# parameter construction

def _bn_params(c):
    return {"scale": jnp.ones((c,), jnp.float32),
            "bias": jnp.zeros((c,), jnp.float32)}


def init_params(key=None, seed: int = 0) -> dict:
    """Deterministic random parameters with the torchvision layout."""
    if key is None:
        key = jax.random.PRNGKey(seed)
    keys = iter(jax.random.split(key, 64))

    def conv_p(kh, kw, cin, cout, groups=1):
        fan_in = kh * kw * cin // groups
        w = jax.random.normal(next(keys), (kh, kw, cin // groups, cout)) \
            * np.sqrt(2.0 / max(fan_in, 1))
        return {"w": w.astype(jnp.float32), "bn": _bn_params(cout)}

    params = {"stem": conv_p(3, 3, 3, 32)}
    blocks = []
    cin = 32
    for expand, cout, repeats, stride in _IR_CONFIG:
        for r in range(repeats):
            hidden = cin * expand
            b = {}
            if expand != 1:
                b["expand"] = conv_p(1, 1, cin, hidden)
            b["depthwise"] = conv_p(3, 3, hidden, hidden, groups=hidden)
            b["project"] = conv_p(1, 1, hidden, cout)
            blocks.append(b)
            cin = cout
    params["blocks"] = blocks
    params["head"] = conv_p(1, 1, cin, EMBED_DIM)
    return params


def load_torchvision_weights(path: str) -> dict:
    """Convert a torchvision mobilenet_v2 state_dict (.pth) to our layout.

    BN statistics are folded into inference scale/bias.
    """
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    arrays = {k: np.asarray(t.detach().cpu().numpy(), dtype=np.float32)
              for k, t in sd.items()}
    return convert_param_arrays(arrays)


def load_onnx_weights(path: str) -> dict:
    """Convert the reference's ONNX artifact (dnn_weights/mobilenet_v2.onnx,
    loopclosure.cpp:73-90) to our layout, without the onnx package.

    Works for exports whose initializers keep the torchvision parameter
    names (the standard torch.onnx.export of torchvision mobilenet_v2
    without constant folding). Raises with a clear message otherwise.
    """
    from stereovision_slam_tpu.models.onnx_reader import read_onnx_initializers

    arrays = {k: np.asarray(v, np.float32)
              for k, v in read_onnx_initializers(path).items()}
    if "features.0.0.weight" not in arrays:
        sample = ", ".join(list(arrays)[:5])
        raise ValueError(
            f"{path}: initializer names do not match torchvision parameter "
            f"names (got e.g. {sample}); the export was likely constant-"
            "folded. Re-export without folding, or convert the original "
            ".pth with load_torchvision_weights.")
    return convert_param_arrays(arrays)


def convert_param_arrays(sd: dict) -> dict:
    """Torchvision-named numpy arrays (state_dict layout) -> our param tree,
    with BN folded into inference scale/bias."""

    def to_np(t):
        return np.asarray(t, dtype=np.float32)

    def fold_bn(prefix):
        g = to_np(sd[f"{prefix}.weight"])
        b = to_np(sd[f"{prefix}.bias"])
        mean = to_np(sd[f"{prefix}.running_mean"])
        var = to_np(sd[f"{prefix}.running_var"])
        scale = g / np.sqrt(var + 1e-5)
        return {"scale": jnp.asarray(scale),
                "bias": jnp.asarray(b - mean * scale)}

    def conv_w(prefix, depthwise=False):
        w = to_np(sd[f"{prefix}.weight"])  # torch OIHW
        if depthwise:
            # torch depthwise: (C, 1, H, W) -> HWIO with I=1
            w = w.transpose(2, 3, 1, 0)
        else:
            w = w.transpose(2, 3, 1, 0)    # -> HWIO
        return jnp.asarray(w)

    params = {"stem": {"w": conv_w("features.0.0"),
                       "bn": fold_bn("features.0.1")}}
    blocks = []
    idx = 1
    for expand, cout, repeats, stride in _IR_CONFIG:
        for _ in range(repeats):
            base = f"features.{idx}.conv"
            b = {}
            if expand != 1:
                b["expand"] = {"w": conv_w(f"{base}.0.0"),
                               "bn": fold_bn(f"{base}.0.1")}
                dw, pw, pbn = f"{base}.1.0", f"{base}.2", f"{base}.3"
            else:
                dw, pw, pbn = f"{base}.0.0", f"{base}.1", f"{base}.2"
            b["depthwise"] = {"w": conv_w(dw, depthwise=True),
                              "bn": fold_bn(dw.rsplit(".", 1)[0] + ".1")}
            b["project"] = {"w": conv_w(pw), "bn": fold_bn(pbn)}
            blocks.append(b)
            idx += 1
    params["blocks"] = blocks
    params["head"] = {"w": conv_w("features.18.0"),
                      "bn": fold_bn("features.18.1")}
    return params


def get_params(weights_path: str | None = None, seed: int = 0) -> dict:
    """Load weights if a path is given and exists (.onnx via the built-in
    ONNX reader, anything else as a torch state_dict), else random."""
    if weights_path:
        import os
        if os.path.exists(weights_path):
            if weights_path.endswith(".onnx"):
                return load_onnx_weights(weights_path)
            return load_torchvision_weights(weights_path)
    return init_params(seed=seed)
