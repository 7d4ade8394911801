"""HDF5 batch loader with the reference's exact ordering semantics.

Parity target: ``load_hdf5`` (reference misc.py:257-302):

* epoch-seeded shuffle with Python's ``random`` module — ``seed(11 + epoch)``
  then ``random.shuffle`` over ``range(dataset_size)`` (misc.py:269-271), so
  the permutation sequence is bit-identical to the reference;
* fixed-size batches, optional truncated final batch (misc.py:274-278);
* in-batch indices sorted ascending (h5py fancy-indexing constraint,
  misc.py:282-284) — note this *interacts with the shuffle*: examples within
  a batch always arrive in file order;
* yields ``target`` (label-mapped), ``example_ids``, and all three feature
  sets, squeezed of their stored singleton axis (misc.py:286-302).

TPU-first deviations: the file is opened once per epoch instead of once per
batch (the reference reopened per batch as an AFS workaround), and an
optional background prefetch thread overlaps host I/O with device compute.
"""

from __future__ import annotations

import os
import queue
import random
import threading
from typing import Callable, Dict, Iterator, Optional

import h5py
import numpy as np


def _squeeze_keep_batch(a: np.ndarray) -> np.ndarray:
    """Drop singleton axes except axis 0 (the reference's ``.squeeze()`` on
    (N, 1, ...) feature arrays, misc.py:293-298, without the py2 footgun of
    also dropping a size-1 batch axis)."""
    keep = [a.shape[0]] + [s for s in a.shape[1:] if s != 1]
    return a.reshape(keep)


def load_hdf5(hdf5_file: str, batch_size: int, random_seed: int,
              shuffle: bool, truncate_final_batch: bool = False,
              map_labels: Callable[[int], int] = int,
              ) -> Iterator[Dict[str, np.ndarray]]:
    """Yield batch dicts ``{target, example_ids, layer4_2, avgpool_512, fc}``
    with the reference's shuffle/batching semantics."""
    path = os.path.expanduser(hdf5_file)
    with h5py.File(path, "r") as f:
        dataset_size = f["Target"].shape[0]

    order = list(range(dataset_size))
    if shuffle:
        random.seed(11 + random_seed)
        random.shuffle(order)

    num_batches = dataset_size // batch_size
    if truncate_final_batch and dataset_size - num_batches * batch_size > 0:
        num_batches += 1

    with h5py.File(path, "r") as f:
        for i in range(num_batches):
            batch_indices = sorted(order[i * batch_size:(i + 1) * batch_size])
            batch: Dict[str, np.ndarray] = {}
            batch["target"] = np.asarray(
                [map_labels(int(t)) for t in f["Target"][batch_indices]],
                dtype=np.int64)
            batch["example_ids"] = f["Location"][batch_indices]
            for key in ("layer4_2", "avgpool_512", "fc"):
                if key in f:
                    batch[key] = _squeeze_keep_batch(
                        np.asarray(f[key][batch_indices], dtype=np.float32))
            yield batch


def prefetch(iterator: Iterator, depth: int = 2,
             to_device: bool = False) -> Iterator:
    """Run ``iterator`` on a background thread with a bounded queue so host
    HDF5 reads overlap device compute. New capability over the reference's
    synchronous loader (misc.py:284: blocking per-batch reads on the hot
    path, SURVEY §3.1).

    ``to_device=True`` additionally stages each batch's arrays onto the
    default device from the worker thread (async H2D), so the training
    loop never blocks on transfers.

    The worker shuts down when the consumer closes (or abandons) the
    generator: a consumer that stops mid-epoch — e.g. the training loop
    hitting ``max_steps`` — must not strand a thread blocked on a full
    queue holding device buffers for the rest of the process.
    """
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _END = object()
    stop = threading.Event()

    def stage(item):
        if not to_device:
            return item
        import jax
        return {k: (jax.device_put(v) if isinstance(v, np.ndarray)
                    and v.dtype.kind in "fiu" else v)
                for k, v in item.items()}

    def put(item) -> bool:
        """Bounded put that gives up once the consumer has left."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        # A mid-epoch read error (e.g. an HDF5 file truncated by a killed
        # job) must surface in the consumer, not silently end the epoch
        # early — ship the exception through the queue and re-raise it.
        try:
            for item in iterator:
                if not put(stage(item)):
                    return
        except BaseException as e:  # noqa: BLE001 — re-raised in consumer
            put(e)
        finally:
            put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        # Unblock a worker mid-put and reap it so no dangling thread
        # races later device work.
        while True:
            try:
                q.get_nowait()
            except queue.Empty:
                break
        t.join(timeout=5.0)
