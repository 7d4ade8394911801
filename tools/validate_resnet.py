"""One-command pretrained-weight validation for the ResNet-34 feature
extractor (VERDICT round-2 missing #1).

The feature pipeline's accuracy parity hinges on our functional NHWC
ResNet-34 (multimodalgame_tpu/models/resnet.py) agreeing with
torchvision's *pretrained* model at the reference's three taps
(utils/package_data.py:16-33: pre-ReLU ``layer4_2``, ``avgpool_512``,
``fc``). This environment has no network egress to fetch the ``.pth``;
architecture parity is pinned at random weights (tests/test_resnet.py).
The day a checkpoint is available, run:

    python tools/validate_resnet.py --pth resnet34-b627a593.pth

It loads the state_dict into BOTH implementations — torchvision's
resnet34 if installed, else the tests' torch oracle with torchvision's
exact key layout — runs a batch of random images through each, and
reports the max absolute difference per tap (expected ~1e-4 at f32 for
real pretrained weights).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pth", required=True,
                   help="torchvision resnet34 state_dict .pth file")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--tol", type=float, default=1e-3)
    args = p.parse_args(argv)

    import jax.numpy as jnp
    import torch

    from multimodalgame_tpu.models.resnet import (load_pretrained,
                                                  resnet34_features)

    sd_torch = torch.load(args.pth, map_location="cpu", weights_only=True)
    sd = {k: v.numpy() for k, v in sd_torch.items()
          if "num_batches_tracked" not in k}

    try:
        from torchvision.models import resnet34
        model = resnet34()
        model.load_state_dict(sd_torch, strict=True)
        print("oracle: torchvision.models.resnet34")

        def torch_taps(x):
            # Re-tap layer4_2 pre-ReLU exactly like the reference
            # (utils/package_data.py:59-78).
            import torch.nn.functional as F
            h = model.maxpool(F.relu(model.bn1(model.conv1(x))))
            h = model.layer3(model.layer2(model.layer1(h)))
            for blk in model.layer4[:-1]:
                h = blk(h)
            blk = model.layer4[-1]
            tap = blk.bn2(blk.conv2(F.relu(blk.bn1(blk.conv1(h))))) + h
            h = F.relu(tap)
            pooled = model.avgpool(h).flatten(1)
            return model.fc(pooled), pooled, tap
    except ImportError:
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tests"))
        from test_resnet import _ResNet34
        model = _ResNet34()
        model.load_state_dict(
            {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
            strict=True)
        print("oracle: tests/test_resnet.py torch re-derivation "
              "(torchvision not installed)")

        def torch_taps(x):
            return model(x, pre_relu_tap=True)

    model.eval()
    params = load_pretrained(args.pth)

    rng = np.random.RandomState(0)
    x = rng.randn(args.batch, 3, 227, 227).astype(np.float32)
    with torch.no_grad():
        fc_t, pool_t, tap_t = torch_taps(torch.from_numpy(x))
    ours = resnet34_features(params, jnp.asarray(x),
                             ("fc", "avgpool_512", "layer4_2"))

    ok = True
    for name, a, b in (("fc", ours["fc"], fc_t.numpy()),
                       ("avgpool_512", ours["avgpool_512"],
                        pool_t.numpy()),
                       ("layer4_2", ours["layer4_2"], tap_t.numpy())):
        diff = float(np.abs(np.asarray(a) - b).max())
        scale = float(np.abs(b).max())
        print(f"{name}: max|diff| = {diff:.3e} (scale {scale:.3e})")
        if diff > args.tol * max(scale, 1.0):
            ok = False
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
