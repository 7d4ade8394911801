"""CIFAR-10 alternative image path.

Parity target: the reference's ``images=cifar`` branch
(model.py:1195-1206) — torchvision CIFAR-10, scaled to 227 and normalized
to (.5, .5), shuffled batches. The reference feeds raw pixels as the
"image features" in this mode.

This environment has no network egress, so the dataset must already exist
on disk (``root``); otherwise a clear error points at the requirement.
Raw CIFAR batches are delivered as numpy ``(B, 3, 227, 227)`` under the
same batch-dict contract as the HDF5 loader.
"""

from __future__ import annotations

from typing import Dict, Iterator

import numpy as np


def load_cifar(batch_size: int, epoch: int, root: str = "./",
               ) -> Iterator[Dict[str, np.ndarray]]:
    try:
        import torchvision.datasets as dset
        import torchvision.transforms as transforms
        import torch
    except ImportError as e:
        raise NotImplementedError(
            "images=cifar requires torchvision with a local CIFAR-10 copy "
            "(no network egress available to download it)") from e

    dataset = dset.CIFAR10(
        root=root, download=False, train=False,
        transform=transforms.Compose([
            transforms.Resize(227),
            transforms.ToTensor(),
            transforms.Normalize((0.5, 0.5, 0.5), (0.5, 0.5, 0.5)),
        ]))
    loader = torch.utils.data.DataLoader(
        dataset, batch_size=batch_size, shuffle=True,
        generator=torch.Generator().manual_seed(11 + epoch))
    for tensor, target in loader:
        data = tensor.numpy().astype(np.float32)
        yield {
            "target": target.numpy().astype(np.int64),
            "example_ids": np.arange(len(target)),
            "avgpool_512": data.reshape(data.shape[0], -1),
            "layer4_2": data,
            "fc": data.reshape(data.shape[0], -1),
        }
