"""HDF5 loader ordering/semantics tests (reference misc.py:257-302)."""

import random

import pytest
import numpy as np

from multimodalgame_tpu.data.hdf5_loader import load_hdf5, prefetch
from multimodalgame_tpu.data.synthetic import write_feature_hdf5


def test_shuffle_matches_reference_permutation(tmp_path):
    path = str(tmp_path / "t.hdf5")
    write_feature_hdf5(path, 20, 4, seed=0)
    batches = list(load_hdf5(path, 5, random_seed=3, shuffle=True))

    # Reference permutation: random.seed(11+epoch); shuffle(range(N))
    # (misc.py:269-271); in-batch indices sorted (misc.py:282).
    order = list(range(20))
    random.seed(11 + 3)
    random.shuffle(order)
    expect_batches = [sorted(order[i * 5:(i + 1) * 5]) for i in range(4)]

    import h5py
    with h5py.File(path) as f:
        targets = f["Target"][:]
    for batch, idx in zip(batches, expect_batches):
        assert list(batch["target"]) == [int(targets[i]) for i in idx]


def test_truncation_semantics(tmp_path):
    path = str(tmp_path / "t.hdf5")
    write_feature_hdf5(path, 23, 4, seed=0)
    # Without truncation: drop the ragged tail (misc.py:274).
    assert sum(len(b["target"]) for b in
               load_hdf5(path, 5, 0, False)) == 20
    # With truncation: keep it (misc.py:276-278).
    sizes = [len(b["target"]) for b in
             load_hdf5(path, 5, 0, False, truncate_final_batch=True)]
    assert sizes == [5, 5, 5, 5, 3]


def test_feature_shapes_and_squeeze(tmp_path):
    path = str(tmp_path / "t.hdf5")
    write_feature_hdf5(path, 8, 2, seed=0)
    b = next(iter(load_hdf5(path, 4, 0, False)))
    # Stored (N,1,512,8,8)/(N,1,512)/(N,1,1000) -> singleton axis dropped
    # (misc.py:293-298).
    assert b["layer4_2"].shape == (4, 512, 8, 8)
    assert b["avgpool_512"].shape == (4, 512)
    assert b["fc"].shape == (4, 1000)
    assert b["target"].dtype == np.int64
    assert len(b["example_ids"]) == 4


def test_map_labels(tmp_path):
    path = str(tmp_path / "t.hdf5")
    write_feature_hdf5(path, 8, 2, label_ids=[7, 13], seed=0)
    mapping = {7: 0, 13: 1}
    b = next(iter(load_hdf5(path, 8, 0, False,
                            map_labels=lambda x: mapping[x])))
    assert set(b["target"].tolist()) <= {0, 1}


def test_prefetch_preserves_order(tmp_path):
    path = str(tmp_path / "t.hdf5")
    write_feature_hdf5(path, 20, 4, seed=0)
    plain = [b["target"] for b in load_hdf5(path, 5, 1, True)]
    fetched = [b["target"] for b in prefetch(load_hdf5(path, 5, 1, True))]
    for a, b in zip(plain, fetched):
        assert np.array_equal(a, b)


def test_prefetch_propagates_worker_exception():
    """A mid-epoch read error in the worker thread must raise in the
    consumer, not silently truncate the epoch (a truncated HDF5 from a
    killed job would otherwise look like a clean short epoch)."""
    def broken():
        yield {"target": np.zeros(2)}
        raise OSError("simulated truncated read")

    it = prefetch(broken())
    next(it)
    with pytest.raises(OSError, match="simulated truncated read"):
        next(it)


def test_prefetch_abandoned_consumer_reaps_worker(tmp_path):
    """A consumer that stops mid-epoch (the training loop hitting
    max_steps) must not strand the worker thread blocked on a full
    queue — leaked workers hold h5py handles/device buffers and have
    been observed alive during *later* unrelated work."""
    import threading

    path = str(tmp_path / "t.hdf5")
    write_feature_hdf5(path, 40, 2, seed=0)
    before = set(threading.enumerate())

    it = prefetch(load_hdf5(path, 2, 1, True), depth=1)
    next(it)          # worker is now blocked putting batch 3 (queue full)
    it.close()        # consumer leaves mid-epoch

    leaked = [t for t in threading.enumerate()
              if t not in before and t.is_alive()]
    for t in leaked:  # close() joins with a timeout; give stragglers 2 s
        t.join(timeout=2.0)
    assert not [t for t in leaked if t.is_alive()]
