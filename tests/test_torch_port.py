"""Torch ResNet-50 weight porting (utils/torch_port.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from point_teacher_tpu.models.detector import StudentFCOS
from point_teacher_tpu.utils.torch_port import load_torch_resnet50_into


def _fake_torch_resnet50_state():
    """Minimal torchvision-layout resnet50 state dict with random weights."""
    sd = {}

    def conv(name, o, i, k):
        # small magnitudes so the 50-layer forward stays finite
        sd[name + ".weight"] = torch.randn(o, i, k, k) * 0.02

    def bn(name, c):
        sd[name + ".weight"] = 1.0 + torch.randn(c) * 0.05
        sd[name + ".bias"] = torch.randn(c) * 0.05
        sd[name + ".running_mean"] = torch.randn(c) * 0.05
        sd[name + ".running_var"] = torch.rand(c) * 0.2 + 0.9

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    blocks = {1: (3, 64, 256), 2: (4, 128, 512), 3: (6, 256, 1024), 4: (3, 512, 2048)}
    in_c = 64
    for stage, (n, planes, out_c) in blocks.items():
        for b in range(n):
            p = f"layer{stage}.{b}"
            conv(p + ".conv1", planes, in_c if b == 0 else out_c, 1)
            bn(p + ".bn1", planes)
            conv(p + ".conv2", planes, planes, 3)
            bn(p + ".bn2", planes)
            conv(p + ".conv3", out_c, planes, 1)
            bn(p + ".bn3", out_c)
            if b == 0:
                conv(p + ".downsample.0", out_c, in_c, 1)
                bn(p + ".downsample.1", out_c)
        in_c = out_c
    return sd


def test_port_shapes_and_values(tmp_path):
    sd = _fake_torch_resnet50_state()
    path = str(tmp_path / "r50.pth")
    torch.save({"state_dict": sd}, path)

    model = StudentFCOS(num_classes=4, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 7, 7, 256)),
                        method=StudentFCOS.init_all)
    ported = load_torch_resnet50_into(params, path)

    stem = np.asarray(ported["params"]["backbone"]["stem_conv"]["kernel"])
    assert stem.shape == (7, 7, 3, 64)
    # HWIO == torch OIHW transposed
    assert np.allclose(stem, sd["conv1.weight"].numpy().transpose(2, 3, 1, 0))
    bn1 = ported["params"]["backbone"]["stem_bn"]
    assert np.allclose(np.asarray(bn1["mean"]), sd["bn1.running_mean"].numpy())
    l3b2 = ported["params"]["backbone"]["layer3_block2"]["conv2"]["kernel"]
    assert np.allclose(np.asarray(l3b2),
                       sd["layer3.2.conv2.weight"].numpy().transpose(2, 3, 1, 0))
    # ported model still runs (zero input: random fake weights explode on
    # real inputs through 50 layers, which is not the port's concern)
    outs, feat = model.apply(ported, jnp.zeros((1, 64, 64, 3)))
    assert np.isfinite(np.asarray(outs[0])).all()
    # head params untouched
    h0 = params["params"]["bbox_head"]["conv_cls"]["kernel"]
    h1 = ported["params"]["bbox_head"]["conv_cls"]["kernel"]
    assert np.allclose(np.asarray(h0), np.asarray(h1))
