"""CIFAR-10 alternative image path, torchvision-free.

Parity target: the reference's ``images=cifar`` branch
(model.py:1195-1206) — CIFAR-10 test split, each 32×32 image scaled to
227 (bilinear, the torchvision ``Scale(227)`` behavior), converted to
[0,1] floats and normalized to (.5, .5), shuffled batches of raw pixels
fed as the "image features".

Re-derived natively: the CIFAR-10 python-format pickle batch
(``cifar-10-batches-py/test_batch``) is parsed directly and images are
resized with PIL — no torchvision/torch dependency. The dataset must
already exist on disk under ``root`` (this environment has no network
egress; the reference's ``download=True`` is a documented deviation).
Unlike the reference's unseeded DataLoader shuffle, the permutation here
is seeded ``11 + epoch`` like every other loader in this framework.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, Iterator

import numpy as np

_BATCH_FILE = os.path.join("cifar-10-batches-py", "test_batch")


def _resize_bilinear(images: np.ndarray, size: int) -> np.ndarray:
    """(B, 3, 32, 32) uint8 -> (B, 3, size, size) float32 in [0, 1]."""
    from PIL import Image

    out = np.empty((images.shape[0], 3, size, size), np.float32)
    for i, img in enumerate(images):
        pil = Image.fromarray(np.transpose(img, (1, 2, 0)))
        resized = pil.resize((size, size), Image.BILINEAR)
        out[i] = np.transpose(np.asarray(resized, np.float32),
                              (2, 0, 1)) / 255.0
    return out


def load_cifar_staged(root: str = "./", image_size: int = 227):
    """Load + resize the whole CIFAR test split ONCE for device staging
    (the fast-driver path, game/driver.py round-3).

    Returns ``(pixels_u8 (N, 3, S, S) uint8, labels (N,) int32)``. PIL's
    bilinear resize of a uint8 image yields uint8, so the resized images
    are staged losslessly at 1/4 the float32 HBM footprint and the
    normalization ``(x/255 - .5)/.5`` runs on device fused into the
    train step — bit-identical to the streaming loader's host math."""
    from PIL import Image

    path = os.path.join(os.path.expanduser(root), _BATCH_FILE)
    if not os.path.exists(path):
        raise NotImplementedError(
            "images=cifar requires a local CIFAR-10 python-format copy at "
            f"{path!r} (no network egress available to download it)")
    with open(path, "rb") as f:
        d = pickle.load(f, encoding="bytes")
    data = np.asarray(d[b"data"], np.uint8).reshape(-1, 3, 32, 32)
    labels = np.asarray(d[b"labels"], np.int32)
    out = np.empty((data.shape[0], 3, image_size, image_size), np.uint8)
    for i, img in enumerate(data):
        pil = Image.fromarray(np.transpose(img, (1, 2, 0)))
        out[i] = np.transpose(
            np.asarray(pil.resize((image_size, image_size),
                                  Image.BILINEAR), np.uint8), (2, 0, 1))
    return out, labels


def cifar_epoch_perm(n: int, epoch: int, batch_size: int) -> np.ndarray:
    """The streaming loader's exact batch plan as an ``(nb, B)`` index
    array: ``RandomState(11 + epoch).permutation`` order, unsorted rows,
    ragged tail dropped (the semantics of :func:`load_cifar` below)."""
    perm = np.random.RandomState(11 + epoch).permutation(n)
    nb = n // batch_size
    return perm[:nb * batch_size].reshape(nb, batch_size).astype(np.int32)


def load_cifar(batch_size: int, epoch: int, root: str = "./",
               image_size: int = 227,
               ) -> Iterator[Dict[str, np.ndarray]]:
    """Yield shuffled CIFAR batches under the HDF5-loader batch contract:
    raw pixels as ``layer4_2`` (B, 3, S, S) and flattened as
    ``avgpool_512``/``fc``. The ragged final batch is dropped, matching
    the HDF5 train loader (misc.py:274-278)."""
    path = os.path.join(os.path.expanduser(root), _BATCH_FILE)
    if not os.path.exists(path):
        raise NotImplementedError(
            "images=cifar requires a local CIFAR-10 python-format copy at "
            f"{path!r} (no network egress available to download it)")
    with open(path, "rb") as f:
        d = pickle.load(f, encoding="bytes")
    data = np.asarray(d[b"data"], np.uint8).reshape(-1, 3, 32, 32)
    labels = np.asarray(d[b"labels"], np.int64)

    rng = np.random.RandomState(11 + epoch)
    perm = rng.permutation(len(labels))
    for i in range(0, len(perm) - batch_size + 1, batch_size):
        idx = perm[i:i + batch_size]
        pixels = _resize_bilinear(data[idx], image_size)
        pixels = (pixels - 0.5) / 0.5  # Normalize((.5,)*3, (.5,)*3)
        flat = pixels.reshape(pixels.shape[0], -1)
        yield {
            "target": labels[idx],
            "example_ids": idx,
            "avgpool_512": flat,
            "layer4_2": pixels,
            "fc": flat,
        }
