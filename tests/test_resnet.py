"""ResNet-34 port parity (reference utils/package_data.py).

torchvision is not installed in this image, so the oracle is a minimal
torch ResNet-34 defined here with torchvision's exact state_dict key
layout; numerical agreement is checked on random weights — the same
architecture check the pretrained path relies on.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from multimodalgame_tpu.models.resnet import (STAGES,
                                              params_from_torch_state,
                                              random_state_dict,
                                              resnet34_features)


class _Block(nn.Module):
    def __init__(self, c_in, c_out, stride):
        super().__init__()
        self.conv1 = nn.Conv2d(c_in, c_out, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(c_out)
        self.conv2 = nn.Conv2d(c_out, c_out, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(c_out)
        self.downsample = None
        if stride != 1 or c_in != c_out:
            self.downsample = nn.Sequential(
                nn.Conv2d(c_in, c_out, 1, stride, bias=False),
                nn.BatchNorm2d(c_out))

    def forward(self, x, relu=True):
        r = x if self.downsample is None else self.downsample(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out)) + r
        return F.relu(out) if relu else out


class _ResNet34(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        c_in = 64
        for i, (blocks, c_out, stride) in enumerate(STAGES, start=1):
            layer = nn.ModuleList(
                [_Block(c_in if b == 0 else c_out, c_out,
                        stride if b == 0 else 1) for b in range(blocks)])
            setattr(self, f"layer{i}", layer)
            c_in = c_out
        self.fc = nn.Linear(512, 1000)

    def forward(self, x, pre_relu_tap=False):
        x = F.max_pool2d(F.relu(self.bn1(self.conv1(x))), 3, 2, 1)
        tap = None
        for i in range(1, 5):
            layer = getattr(self, f"layer{i}")
            for b, blk in enumerate(layer):
                last4 = (i == 4 and b == len(layer) - 1)
                if last4 and pre_relu_tap:
                    tap = blk(x, relu=False)
                    x = F.relu(tap)
                else:
                    x = blk(x)
        pooled = x.mean(dim=(2, 3))
        return self.fc(pooled), pooled, tap


@pytest.fixture(scope="module")
def oracle_and_params():
    sd = random_state_dict(0)
    model = _ResNet34()
    model.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()},
                          strict=True)
    model.eval()
    return model, params_from_torch_state(sd)


@pytest.fixture(scope="module")
def images():
    rng = np.random.RandomState(0)
    return (rng.randn(2, 3, 227, 227) * 0.25).astype(np.float32)


def test_fc_avgpool_layer42_match(oracle_and_params, images):
    import jax.numpy as jnp
    model, params = oracle_and_params
    out = resnet34_features(params, jnp.asarray(images),
                            request=("layer4_2", "avgpool_512", "fc"))
    with torch.no_grad():
        fc, pooled, tap = model(torch.from_numpy(images), pre_relu_tap=True)
    np.testing.assert_allclose(np.asarray(out["avgpool_512"]),
                               pooled.numpy(), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out["fc"]), fc.numpy(),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out["layer4_2"]), tap.numpy(),
                               rtol=1e-3, atol=1e-3)


def test_layer4_2_is_pre_relu(oracle_and_params, images):
    """The tap must be the *pre-activation* of layer4's final block
    (utils/package_data.py:59-78, 106-112)."""
    import jax.numpy as jnp
    model, params = oracle_and_params
    out = resnet34_features(
        params, jnp.asarray(images),
        request=("layer4_2", "layer4_2_relu", "avgpool_512"))
    l42 = np.asarray(out["layer4_2"])
    assert l42.shape == (2, 512, 8, 8)
    assert (l42 < 0).any()  # pre-ReLU must contain negatives
    np.testing.assert_allclose(np.maximum(l42, 0),
                               np.asarray(out["layer4_2_relu"]), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out["layer4_2_relu"]).mean(axis=(2, 3)),
        np.asarray(out["avgpool_512"]), rtol=1e-4, atol=1e-5)


def test_intermediate_shapes(oracle_and_params, images):
    """The reference's documented layer table (utils/package_data.py:16-33)
    at 227x227 input."""
    import jax.numpy as jnp
    _, params = oracle_and_params
    out = resnet34_features(
        params, jnp.asarray(images),
        request=("bn1", "maxpool", "layer1", "layer2", "layer3",
                 "layer4_0_relu", "avgpool"))
    assert out["bn1"].shape == (2, 64, 114, 114)
    assert out["maxpool"].shape == (2, 64, 57, 57)
    assert out["layer1"].shape == (2, 64, 57, 57)
    assert out["layer2"].shape == (2, 128, 29, 29)
    assert out["layer3"].shape == (2, 256, 15, 15)
    assert out["layer4_0_relu"].shape == (2, 512, 8, 8)
    assert out["avgpool"].shape == (2, 512, 1, 1)


def test_unknown_request_raises(oracle_and_params, images):
    import jax.numpy as jnp
    _, params = oracle_and_params
    with pytest.raises(KeyError):
        resnet34_features(params, jnp.asarray(images), request=("nope",))
