"""ResNet-34 feature extractor with the pre-ReLU ``layer4_2`` tap.

Parity target: the reference's ``FeatureModel`` (utils/package_data.py:
81-131), which wraps torchvision's pretrained ResNet-34 and *re-implements
the final layer4 block by hand* so the pre-activation output can be tapped
(``basic_block``, utils/package_data.py:59-78). The taps requested by the
dataset build are ``layer4_2`` (512x8x8, pre-ReLU), ``avgpool_512`` (512),
and ``fc`` (1000) at 227x227 input (layer table utils/package_data.py:16-33).

TPU-first design: a purely functional forward over an explicit parameter
pytree (weights come from a torch state_dict — pretrained file or any
torchvision-initialized model), computed in NHWC layout (XLA's preferred
TPU convolution layout) with inference-mode batch norm folded into a
scale/shift. Every intermediate named in the reference's layer table can
be requested, so the extraction pipeline is a drop-in replacement.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# torchvision resnet34 stage spec: (num_blocks, channels, first_stride)
STAGES = [(3, 64, 1), (4, 128, 2), (6, 256, 2), (3, 512, 2)]
BN_EPS = 1e-5


# ---------------------------------------------------------------------------
# Parameter loading
# ---------------------------------------------------------------------------

def _conv(sd, name):
    # torch OIHW -> HWIO
    return np.transpose(np.asarray(sd[name + ".weight"]), (2, 3, 1, 0))


def _bn(sd, name):
    # Fold inference-mode BN into scale/shift:
    #   y = (x - mean) / sqrt(var + eps) * gamma + beta = x * s + b
    gamma = np.asarray(sd[name + ".weight"], np.float32)
    beta = np.asarray(sd[name + ".bias"], np.float32)
    mean = np.asarray(sd[name + ".running_mean"], np.float32)
    var = np.asarray(sd[name + ".running_var"], np.float32)
    s = gamma / np.sqrt(var + BN_EPS)
    return {"scale": s, "shift": beta - mean * s}


def params_from_torch_state(sd) -> Dict:
    """Convert a torchvision ``resnet34`` state_dict (tensors or numpy
    arrays) into the functional parameter pytree."""
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else
              np.asarray(v)) for k, v in sd.items()}
    params: Dict = {
        "conv1": _conv(sd, "conv1"),
        "bn1": _bn(sd, "bn1"),
        "fc": {"kernel": np.transpose(np.asarray(sd["fc.weight"])),
               "bias": np.asarray(sd["fc.bias"])},
    }
    for i, (blocks, _, _) in enumerate(STAGES, start=1):
        layer: List[Dict] = []
        for b in range(blocks):
            pre = f"layer{i}.{b}"
            blk = {
                "conv1": _conv(sd, pre + ".conv1"),
                "bn1": _bn(sd, pre + ".bn1"),
                "conv2": _conv(sd, pre + ".conv2"),
                "bn2": _bn(sd, pre + ".bn2"),
            }
            if pre + ".downsample.0.weight" in sd:
                blk["down_conv"] = _conv(sd, pre + ".downsample.0")
                blk["down_bn"] = _bn(sd, pre + ".downsample.1")
            layer.append(blk)
        params[f"layer{i}"] = layer
    return params


def load_pretrained(path: str) -> Dict:
    """Load a torchvision resnet34 ``.pth`` state_dict file."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return params_from_torch_state(sd)


def random_state_dict(seed: int = 0) -> Dict[str, np.ndarray]:
    """A randomly-initialized resnet34 state_dict in torchvision's key
    layout (numpy arrays; no torch needed). Used for tests and as a
    stand-in when no pretrained ``.pth`` file is available — this
    environment has no network egress to download one."""
    rng = np.random.RandomState(seed)

    # Variance-preserving init (He/2 convs, BN ~identity) so activations
    # stay O(1) through all 34 layers — random-weight parity tests would
    # otherwise drown in compounded fp noise at ~1e6 activation scales.
    def w(*shape, scale=None):
        fan_in = int(np.prod(shape[1:])) if len(shape) > 1 else shape[0]
        scale = scale or np.sqrt(0.5 / fan_in)
        return (rng.randn(*shape) * scale).astype(np.float32)

    def bn(sd, name, c):
        sd[name + ".weight"] = (
            1.0 + 0.1 * rng.randn(c)).astype(np.float32)
        sd[name + ".bias"] = (rng.randn(c) * 0.1).astype(np.float32)
        sd[name + ".running_mean"] = (rng.randn(c) * 0.1).astype(np.float32)
        sd[name + ".running_var"] = (
            1.0 + 0.1 * np.abs(rng.randn(c))).astype(np.float32)

    sd: Dict[str, np.ndarray] = {"conv1.weight": w(64, 3, 7, 7)}
    bn(sd, "bn1", 64)
    c_in = 64
    for i, (blocks, c_out, stride) in enumerate(STAGES, start=1):
        for b in range(blocks):
            pre = f"layer{i}.{b}"
            sd[pre + ".conv1.weight"] = w(c_out, c_in if b == 0 else c_out,
                                          3, 3)
            bn(sd, pre + ".bn1", c_out)
            sd[pre + ".conv2.weight"] = w(c_out, c_out, 3, 3)
            bn(sd, pre + ".bn2", c_out)
            if b == 0 and (stride != 1 or c_in != c_out):
                sd[pre + ".downsample.0.weight"] = w(c_out, c_in, 1, 1)
                bn(sd, pre + ".downsample.1", c_out)
        c_in = c_out
    sd["fc.weight"] = w(1000, 512)
    sd["fc.bias"] = np.zeros(1000, np.float32)
    return sd


def random_params(seed: int = 0) -> Dict:
    return params_from_torch_state(random_state_dict(seed))


# ---------------------------------------------------------------------------
# Functional forward
# ---------------------------------------------------------------------------

def _conv2d(x, kernel, stride):
    return jax.lax.conv_general_dilated(
        x, jnp.asarray(kernel), window_strides=(stride, stride),
        padding=[(kernel.shape[0] // 2,) * 2, (kernel.shape[1] // 2,) * 2],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _bn_apply(x, bn):
    return x * jnp.asarray(bn["scale"]) + jnp.asarray(bn["shift"])


def _basic_block(x, blk, stride) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (post-ReLU output, pre-ReLU output) — the reference taps
    the pre-activation of layer4's last block (utils/package_data.py:59-78).
    """
    residual = x
    out = jax.nn.relu(_bn_apply(_conv2d(x, blk["conv1"], stride),
                                blk["bn1"]))
    out = _bn_apply(_conv2d(out, blk["conv2"], 1), blk["bn2"])
    if "down_conv" in blk:
        residual = _bn_apply(
            jax.lax.conv_general_dilated(
                x, jnp.asarray(blk["down_conv"]),
                window_strides=(stride, stride), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC")),
            blk["down_bn"])
    pre = out + residual
    return jax.nn.relu(pre), pre


def resnet34_features(params: Dict, x: jnp.ndarray,
                      request: Sequence[str] = ("layer4_2", "avgpool_512",
                                                "fc")
                      ) -> Dict[str, jnp.ndarray]:
    """Forward pass collecting the requested named intermediates.

    Args:
        params: pytree from :func:`params_from_torch_state`.
        x: images, NCHW float32 (the reference's tensor layout) — e.g.
           ``(B, 3, 227, 227)`` after Scale(227)+CenterCrop(227)+
           Normalize(.5,.5) (utils/package_data.py:171-178).
        request: names from the reference's layer table
            (utils/package_data.py:16-33): conv1, bn1, relu, maxpool,
            layer1..layer4_2_relu, avgpool, avgpool_512, fc.

    Returns a dict name -> array; spatial features are returned in the
    reference's NCHW layout.
    """
    want = set(request)
    out: Dict[str, jnp.ndarray] = {}

    def grab(name, val, spatial=True):
        if name in want:
            out[name] = (jnp.transpose(val, (0, 3, 1, 2)) if spatial
                         else val)

    x = jnp.transpose(x, (0, 2, 3, 1))  # NCHW -> NHWC
    x = _conv2d(x, params["conv1"], 2)
    grab("conv1", x)
    x = _bn_apply(x, params["bn1"])
    grab("bn1", x)
    x = jax.nn.relu(x)
    grab("relu", x)
    # 3x3 max pool, stride 2, padding 1 (torchvision maxpool).
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])
    grab("maxpool", x)

    for i, (blocks, _, stride) in enumerate(STAGES, start=1):
        layer = params[f"layer{i}"]
        for b in range(blocks):
            s = stride if b == 0 else 1
            x, pre = _basic_block(x, layer[b], s)
            if i == 4:
                grab(f"layer4_{b}_relu", x)
                if b == blocks - 1:
                    grab("layer4_2", pre)
                    grab("layer4_2_relu", x)
        grab(f"layer{i}", x)

    x = jnp.mean(x, axis=(1, 2), keepdims=True)  # adaptive avg pool to 1x1
    grab("avgpool", x)
    x = x.reshape(x.shape[0], -1)
    grab("avgpool_512", x, spatial=False)
    x = jnp.dot(x, jnp.asarray(params["fc"]["kernel"]),
                preferred_element_type=jnp.float32) + params["fc"]["bias"]
    grab("fc", x, spatial=False)

    missing = want - set(out)
    if missing:
        raise KeyError(f"unknown feature names requested: {sorted(missing)}")
    return out
