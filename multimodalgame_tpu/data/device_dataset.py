"""Device-resident dataset: stage features once, index on device.

Motivation (measured, PERFORMANCE.md): the axon tunnel moves host->device
data at ~30 MB/s with ~30 ms latency per transfer — per-batch staging of a
64x512 feature batch costs more than the train step it feeds. The game's
datasets are small (30 classes x 100 examples: 6 MB of ``avgpool_512``,
393 MB of ``layer4_2``), so the whole feature set is pushed to HBM *once*
and every batch is a device-side gather driven by a tiny ``(K, B)`` index
array computed on host.

Shuffle parity: :meth:`epoch_indices` reproduces the reference loader's
ordering exactly (``random.seed(11 + epoch)`` + ``random.shuffle`` over
``range(N)``, fixed-size batches, ascending in-batch indices — reference
misc.py:269-284); a permutation-parity test pins it against
``data/hdf5_loader.py`` which pins it against the reference.
"""

from __future__ import annotations

import os
import random
from typing import Callable, Dict, Optional

import h5py
import numpy as np

from multimodalgame_tpu.data.hdf5_loader import _squeeze_keep_batch

# Refuse to stage datasets beyond this size (bytes) — at that point a
# streaming loader is the right tool and silent HBM exhaustion is not.
DEFAULT_LIMIT_BYTES = int(os.environ.get("MMG_DEVICE_DATA_LIMIT",
                                         4 * 1024 ** 3))


class DeviceDataset:
    """Features + mapped labels staged on the default device.

    Attributes:
        feats: ``(N, ...)`` device array of the selected image features.
        context: optional ``(N, C)`` device array (``attn_extra_context``).
        targets: ``(N,)`` int32 device array of *mapped* labels.
        targets_host: host copy of ``targets`` (for log lines — avoids a
            device read just to print the targets row).
        size: N.
    """

    def __init__(self, feats, targets_host: np.ndarray,
                 context=None, keep_dtype: bool = False,
                 numpy_shuffle: bool = False):
        import jax
        import jax.numpy as jnp
        self.size = int(feats.shape[0])
        self.targets_host = np.asarray(targets_host, dtype=np.int32)
        fdtype = None if keep_dtype else jnp.float32
        self.feats = jax.device_put(jnp.asarray(feats, fdtype))
        self.targets = jax.device_put(jnp.asarray(self.targets_host))
        self.context = (jax.device_put(jnp.asarray(context, jnp.float32))
                        if context is not None else None)
        self.numpy_shuffle = numpy_shuffle

    @classmethod
    def from_hdf5(cls, hdf5_file: str, feat_key: str,
                  map_labels: Callable[[int], int] = int,
                  context_key: Optional[str] = None,
                  limit_bytes: int = DEFAULT_LIMIT_BYTES) -> "DeviceDataset":
        """Load an entire feature file (reference schema,
        utils/package_data.py:238-243) and stage it."""
        path = os.path.expanduser(hdf5_file)
        with h5py.File(path, "r") as f:
            targets = np.asarray(
                [map_labels(int(t)) for t in np.asarray(f["Target"])],
                dtype=np.int32)
            feats = _squeeze_keep_batch(
                np.asarray(f[feat_key], dtype=np.float32))
            context = None
            if context_key is not None:
                context = _squeeze_keep_batch(
                    np.asarray(f[context_key], dtype=np.float32))
        nbytes = feats.nbytes + (context.nbytes if context is not None else 0)
        if nbytes > limit_bytes:
            raise MemoryError(
                f"dataset {hdf5_file} is {nbytes / 1e9:.1f} GB — beyond the "
                f"device-staging limit ({limit_bytes / 1e9:.1f} GB); raise "
                "MMG_DEVICE_DATA_LIMIT or shard the file")
        return cls(feats, targets, context)

    @classmethod
    def from_cifar(cls, root: str = "./",
                   image_size: int = 227) -> "DeviceDataset":
        """Stage the CIFAR test split as resized uint8 pixels (lossless —
        PIL's bilinear resize of uint8 yields uint8; normalization runs
        on device inside the train step, see game/driver.py). Uses the
        streaming loader's numpy-seeded shuffle semantics."""
        from multimodalgame_tpu.data.cifar import load_cifar_staged
        pixels, labels = load_cifar_staged(root, image_size)
        return cls(pixels, labels, keep_dtype=True, numpy_shuffle=True)

    def place(self, sharding) -> "DeviceDataset":
        """Re-place the staged arrays with an explicit ``jax.sharding``
        (the mesh driver replicates the dataset across its data-parallel
        mesh so device-side batch gathers stay local; on a multi-process
        mesh each process stages its addressable shards from its own
        full local copy). In-place; returns ``self`` for chaining."""
        from multimodalgame_tpu.parallel.distributed import put_global
        self.feats = put_global(self.feats, sharding)
        self.targets = put_global(self.targets, sharding)
        if self.context is not None:
            self.context = put_global(self.context, sharding)
        return self

    def epoch_indices(self, epoch: int, shuffle: bool, batch_size: int,
                      truncate_final_batch: bool = False) -> np.ndarray:
        """The epoch's batch plan: an ``(nb, B)`` int32 index array with the
        reference loader's exact semantics (misc.py:269-284).

        With ``truncate_final_batch`` the ragged tail is returned too,
        padded with -1 (callers slice it off; training never truncates,
        matching the reference's ``num_batches = N // B``).

        CIFAR datasets (``numpy_shuffle=True``) use the streaming
        loader's semantics instead: ``RandomState(11 + epoch)``
        permutation, unsorted in-batch order, ragged tail always dropped
        (data/cifar.py). ``shuffle`` is ignored for them — the streaming
        loader and the reference's CIFAR DataLoader (model.py:1195-1206)
        have no unshuffled mode, so ``-noshuffle_train`` must not change
        the staged path's data order either."""
        if getattr(self, "numpy_shuffle", False):
            if truncate_final_batch:
                raise ValueError(
                    "truncate_final_batch is not defined for CIFAR-staged "
                    "datasets: the streaming loader drops the ragged tail")
            from multimodalgame_tpu.data.cifar import cifar_epoch_perm
            return cifar_epoch_perm(self.size, epoch, batch_size)
        order = list(range(self.size))
        if shuffle:
            random.seed(11 + epoch)
            random.shuffle(order)
        nb = self.size // batch_size
        # Vectorized in-batch ascending sort (identical to per-row
        # ``sorted``): the plan is built on the host between chunk
        # dispatches, so its cost is hot-path-adjacent (~2 ms/epoch in
        # pure Python at canonical scale, ~10x less here).
        rows = np.sort(np.asarray(order[:nb * batch_size],
                                  dtype=np.int32).reshape(nb, batch_size),
                       axis=1)
        if truncate_final_batch and self.size - nb * batch_size > 0:
            tail = sorted(order[nb * batch_size:])
            tail_row = np.full((1, batch_size), -1, np.int32)
            tail_row[0, :len(tail)] = tail
            rows = np.concatenate([rows, tail_row], axis=0)
        return rows
