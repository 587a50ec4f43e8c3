"""torchvision MobileNet-V2 state_dict converter: layout + forward parity."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from stereovision_slam_tpu.models import mobilenet_v2 as mnv2


def fabricate_state_dict():
    """Build a state_dict with torchvision mobilenet_v2 keys/shapes."""
    sd = {}

    def conv_bn(prefix_conv, prefix_bn, cin, cout, k, groups=1):
        sd[f"{prefix_conv}.weight"] = torch.randn(cout, cin // groups, k, k)
        sd[f"{prefix_bn}.weight"] = torch.rand(cout) + 0.5
        sd[f"{prefix_bn}.bias"] = torch.randn(cout) * 0.1
        sd[f"{prefix_bn}.running_mean"] = torch.randn(cout) * 0.1
        sd[f"{prefix_bn}.running_var"] = torch.rand(cout) + 0.5

    conv_bn("features.0.0", "features.0.1", 3, 32, 3)
    cin = 32
    idx = 1
    for expand, cout, repeats, stride in mnv2._IR_CONFIG:
        for _ in range(repeats):
            base = f"features.{idx}.conv"
            hidden = cin * expand
            if expand != 1:
                conv_bn(f"{base}.0.0", f"{base}.0.1", cin, hidden, 1)
                conv_bn(f"{base}.1.0", f"{base}.1.1", hidden, hidden, 3,
                        groups=hidden)
                conv_bn(f"{base}.2", f"{base}.3", hidden, cout, 1)
            else:
                conv_bn(f"{base}.0.0", f"{base}.0.1", hidden, hidden, 3,
                        groups=hidden)
                conv_bn(f"{base}.1", f"{base}.2", hidden, cout, 1)
            idx += 1
            cin = cout
    conv_bn("features.18.0", "features.18.1", cin, 1280, 1)
    return sd


def test_converter_layout_and_forward(tmp_path):
    torch.manual_seed(0)
    sd = fabricate_state_dict()
    path = str(tmp_path / "mnv2.pth")
    torch.save(sd, path)
    params = mnv2.load_torchvision_weights(path)
    assert params["stem"]["w"].shape == (3, 3, 3, 32)
    assert params["head"]["w"].shape == (1, 1, 320, 1280)
    assert len(params["blocks"]) == 17
    # depthwise weights: HWIO with I=1
    assert params["blocks"][1]["depthwise"]["w"].shape[2] == 1

    import jax.numpy as jnp
    x = jnp.ones((1, 64, 64, 3)) * 0.1
    out = mnv2.forward(params, x)
    assert out.shape == (1, 1280)
    assert np.all(np.isfinite(np.asarray(out)))


def test_bn_folding_matches_reference_formula(tmp_path):
    torch.manual_seed(1)
    sd = fabricate_state_dict()
    path = str(tmp_path / "m.pth")
    torch.save(sd, path)
    params = mnv2.load_torchvision_weights(path)
    g = sd["features.0.1.weight"].numpy()
    b = sd["features.0.1.bias"].numpy()
    mean = sd["features.0.1.running_mean"].numpy()
    var = sd["features.0.1.running_var"].numpy()
    scale = g / np.sqrt(var + 1e-5)
    np.testing.assert_allclose(np.asarray(params["stem"]["bn"]["scale"]),
                               scale, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(params["stem"]["bn"]["bias"]),
                               b - mean * scale, rtol=1e-4, atol=1e-5)
