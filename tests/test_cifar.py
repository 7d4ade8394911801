"""Native CIFAR path + mode-rejection pins (VERDICT round-1 item #6):
the raw-pixel loader works from a CIFAR-format fixture without
torchvision, and the two documented mode rejections fail loudly with
their documented messages."""

import os
import pickle

import numpy as np
import pytest

from multimodalgame_tpu.data.cifar import load_cifar

pytestmark = pytest.mark.slow  # see pytest.ini: `-m "not slow"` is the fast subset



@pytest.fixture(scope="module")
def cifar_root(tmp_path_factory):
    """A tiny CIFAR-10 python-format test_batch (the real pickle layout:
    {b'data': (N, 3072) uint8 row-major CHW, b'labels': [int]})."""
    root = tmp_path_factory.mktemp("cifar")
    os.makedirs(root / "cifar-10-batches-py")
    rng = np.random.RandomState(0)
    n = 40
    payload = {
        b"data": rng.randint(0, 256, size=(n, 3072), dtype=np.uint8),
        b"labels": [int(x) for x in rng.randint(0, 10, size=n)],
    }
    with open(root / "cifar-10-batches-py" / "test_batch", "wb") as f:
        pickle.dump(payload, f)
    return str(root)


def test_cifar_loader_batches(cifar_root):
    batches = list(load_cifar(8, epoch=0, root=cifar_root, image_size=32))
    assert len(batches) == 5  # 40 // 8, ragged tail dropped
    b = batches[0]
    assert b["layer4_2"].shape == (8, 3, 32, 32)
    assert b["avgpool_512"].shape == (8, 3 * 32 * 32)
    assert b["target"].shape == (8,)
    # Normalize((.5,)*3, (.5,)*3) maps [0,1] -> [-1,1].
    assert -1.0 <= b["layer4_2"].min() and b["layer4_2"].max() <= 1.0
    assert b["layer4_2"].min() < -0.5 < 0.5 < b["layer4_2"].max()


def test_cifar_loader_resize_matches_pil(cifar_root):
    """At size != 32 the bilinear resize must match PIL's (the
    torchvision Scale(227) behavior)."""
    from PIL import Image
    b = next(load_cifar(4, epoch=0, root=cifar_root, image_size=64))
    # Rebuild the first image independently.
    with open(os.path.join(cifar_root, "cifar-10-batches-py",
                           "test_batch"), "rb") as f:
        d = pickle.load(f, encoding="bytes")
    rng = np.random.RandomState(11)
    idx = rng.permutation(40)[:4]
    raw = np.asarray(d[b"data"], np.uint8).reshape(-1, 3, 32, 32)[idx[0]]
    pil = Image.fromarray(np.transpose(raw, (1, 2, 0))).resize(
        (64, 64), Image.BILINEAR)
    want = (np.transpose(np.asarray(pil, np.float32), (2, 0, 1)) / 255.0
            - 0.5) / 0.5
    np.testing.assert_allclose(b["layer4_2"][0], want, atol=1e-6)


def test_cifar_shuffle_is_epoch_seeded(cifar_root):
    a = next(load_cifar(8, epoch=3, root=cifar_root, image_size=32))
    b = next(load_cifar(8, epoch=3, root=cifar_root, image_size=32))
    c = next(load_cifar(8, epoch=4, root=cifar_root, image_size=32))
    np.testing.assert_array_equal(a["example_ids"], b["example_ids"])
    assert not np.array_equal(a["example_ids"], c["example_ids"])


def test_cifar_missing_copy_raises():
    with pytest.raises(NotImplementedError, match="local CIFAR-10"):
        next(load_cifar(8, epoch=0, root="/nonexistent"))


def test_cifar_end_to_end_smoke(cifar_root, synthetic_dataset, tmp_path,
                                monkeypatch):
    """images=cifar trains through the legacy driver on raw pixels
    (reference model.py:1195-1206; dev cadence pushed out because the
    reference shares the HDF5 dev path, whose feature dims differ)."""
    from multimodalgame_tpu.config import (finalize_flags, make_flags,
                                           parse_args)
    from multimodalgame_tpu.data.synthetic import write_descriptions_csv
    from multimodalgame_tpu.train import run

    import h5py

    monkeypatch.chdir(cifar_root)  # reference uses root="./"
    descr = str(tmp_path / "descr10.csv")
    write_descriptions_csv(descr, 10)
    # Dev eval fires at step 0 (reference model.py:1544: step % log_dev);
    # give it a feature file whose dims match the raw-pixel features.
    dev = str(tmp_path / "dev_pixels.hdf5")
    rng = np.random.RandomState(0)
    with h5py.File(dev, "w") as fh:
        fh.create_dataset("Target", data=np.arange(8, dtype=np.int64) % 10)
        fh.create_dataset("Location",
                          data=np.asarray([b"p%d.jpg" % i
                                           for i in range(8)], dtype="S50"))
        fh.create_dataset(
            "avgpool_512",
            data=rng.randn(8, 1, 3 * 227 * 227).astype(np.float32))
    f = make_flags()
    argv = [
        "-experiment_name", "cifar_smoke", "-model_type", "Fixed",
        "-images", "cifar",
        "-log_path", str(tmp_path / "logs"),
        "-img_feat", "avgpool_512", "-img_feat_dim", str(3 * 227 * 227),
        "-batch_size", "8", "-batch_size_dev", "8",
        "-rec_w_dim", "8", "-sender_out_dim", "8",
        "-img_h_dim", "8", "-rec_hidden", "8", "-baseline_hid_dim", "8",
        "-max_exchange", "2", "-max_epoch", "1",
        "-top_k_dev", "2", "-top_k_train", "2",
        "-descr_train", descr, "-descr_dev", descr,
        "-train_file", synthetic_dataset["train"],
        "-dev_file", dev,
        "-wv_dim", "16", "-glove_path", synthetic_dataset["glove"],
        "-log_interval", "2", "-log_dev", "1000",
        "-save_after", "1000", "-save_interval", "1000",
        "-exchange_samples", "0",
    ]
    parse_args(f, argv)
    finalize_flags(f, argv)
    os.makedirs(f.log_path, exist_ok=True)
    out = run(f, max_steps=3)
    assert out["step"] == 3
    assert all(np.isfinite(a) for a in out["batch_accuracy"])


def test_wv_type_none_rejected(synthetic_dataset, tmp_path):
    """The reference's wv_type='none' branch (model.py:1104-1105) is dead
    code (its epoch loop would NameError on undefined desc vars); this
    framework rejects it loudly — documented deviation, PARITY.md."""
    from multimodalgame_tpu.config import (finalize_flags, make_flags,
                                           parse_args)
    from multimodalgame_tpu.train import run

    f = make_flags()
    argv = [
        "-experiment_name", "none_mode", "-model_type", "Adaptive",
        "-log_path", str(tmp_path / "logs"), "-wv_type", "none",
        "-descr_train", synthetic_dataset["descr"],
        "-descr_dev", synthetic_dataset["descr"],
        "-train_file", synthetic_dataset["train"],
        "-dev_file", synthetic_dataset["dev"],
    ]
    parse_args(f, argv)
    finalize_flags(f, argv)
    os.makedirs(f.log_path, exist_ok=True)
    with pytest.raises(NotImplementedError,
                       match="no prediction targets"):
        run(f, max_steps=1)


def test_cifar_staged_pipeline_matches_streaming_loader(cifar_root,
                                                        monkeypatch):
    """The fast driver's staged-uint8 + on-device-normalize pipeline is
    BIT-identical to the streaming loader (VERDICT round-2 #9): same
    RandomState(11+epoch) permutation, same PIL resize, same
    (x/255-.5)/.5 float math."""
    import jax.numpy as jnp
    from multimodalgame_tpu.data.device_dataset import DeviceDataset

    monkeypatch.chdir(cifar_root)
    ds = DeviceDataset.from_cifar(image_size=64)
    assert np.asarray(ds.feats).dtype == np.uint8

    plan = ds.epoch_indices(epoch=2, shuffle=True, batch_size=8)
    stream = list(load_cifar(8, epoch=2, root=cifar_root, image_size=64))
    assert plan.shape[0] == len(stream) == 5
    for row, b in zip(plan, stream):
        np.testing.assert_array_equal(row, b["example_ids"])
        np.testing.assert_array_equal(ds.targets_host[row], b["target"])
        staged = (jnp.asarray(np.asarray(ds.feats)[row], jnp.float32)
                  / 255.0 - 0.5) / 0.5
        np.testing.assert_array_equal(np.asarray(staged), b["layer4_2"])
        flat = np.asarray(staged).reshape(8, -1)
        np.testing.assert_array_equal(flat, b["avgpool_512"])


def test_cifar_staged_plan_ignores_shuffle_flag(cifar_root, monkeypatch):
    """-noshuffle_train must not change CIFAR data order: the streaming
    loader (and the reference's CIFAR DataLoader, model.py:1195-1206)
    always shuffles, so the staged plan does too. And truncation is
    undefined for CIFAR (the streaming loader drops the tail) — asking
    for it fails loudly instead of silently dropping examples."""
    from multimodalgame_tpu.data.device_dataset import DeviceDataset

    monkeypatch.chdir(cifar_root)
    ds = DeviceDataset.from_cifar(image_size=32)
    on = ds.epoch_indices(epoch=1, shuffle=True, batch_size=8)
    off = ds.epoch_indices(epoch=1, shuffle=False, batch_size=8)
    np.testing.assert_array_equal(on, off)
    perm = np.random.RandomState(11 + 1).permutation(ds.size)[:40]
    np.testing.assert_array_equal(on.reshape(-1), perm)
    with pytest.raises(ValueError, match="truncate_final_batch"):
        ds.epoch_indices(epoch=1, shuffle=True, batch_size=8,
                         truncate_final_batch=True)


def test_cifar_fast_driver_matches_legacy_artifacts(cifar_root, tmp_path,
                                                    synthetic_dataset,
                                                    monkeypatch):
    """images=cifar through the chunked driver produces the same log
    artifact structure and step/batch stamps as the legacy streaming
    loop (the mammal-path parity test, applied to CIFAR)."""
    import multimodalgame_tpu.game.driver as drv
    from multimodalgame_tpu.config import (finalize_flags, make_flags,
                                           parse_args)
    from multimodalgame_tpu.data.synthetic import write_descriptions_csv
    from multimodalgame_tpu.train import run

    monkeypatch.chdir(cifar_root)
    monkeypatch.setattr(drv, "CIFAR_IMAGE_SIZE", 32)
    descr = str(tmp_path / "descr10.csv")
    write_descriptions_csv(descr, 10)

    import h5py
    dev = str(tmp_path / "dev_pixels.hdf5")
    rng = np.random.RandomState(0)
    with h5py.File(dev, "w") as fh:
        fh.create_dataset("Target", data=np.arange(8, dtype=np.int64) % 10)
        fh.create_dataset("Location",
                          data=np.asarray([b"p%d.jpg" % i
                                           for i in range(8)], dtype="S50"))
        fh.create_dataset(
            "avgpool_512",
            data=rng.randn(8, 1, 3 * 32 * 32).astype(np.float32))

    def flags_for(name, extra=()):
        f = make_flags()
        argv = [
            "-experiment_name", name, "-model_type", "Fixed",
            "-images", "cifar",
            "-log_path", str(tmp_path / name),
            "-img_feat", "avgpool_512", "-img_feat_dim", str(3 * 32 * 32),
            "-batch_size", "8", "-batch_size_dev", "8",
            "-rec_w_dim", "8", "-sender_out_dim", "8",
            "-img_h_dim", "8", "-rec_hidden", "8", "-baseline_hid_dim", "8",
            "-max_exchange", "2", "-max_epoch", "2",
            "-top_k_dev", "2", "-top_k_train", "2",
            "-descr_train", descr, "-descr_dev", descr,
            "-train_file", synthetic_dataset["train"], "-dev_file", dev,
            "-wv_dim", "16", "-glove_path", synthetic_dataset["glove"],
            "-log_interval", "3", "-log_dev", "5",
            "-save_after", "1000", "-save_interval", "1000",
            "-exchange_samples", "1",
        ] + list(extra)
        parse_args(f, argv)
        finalize_flags(f, argv)
        os.makedirs(f.log_path, exist_ok=True)
        return f

    # The streaming loop resizes 40 images to 227 per batch; shrink its
    # image size too so the comparison run is fast.
    import multimodalgame_tpu.data.cifar as cifar_mod
    real_load = cifar_mod.load_cifar

    def small_load(batch_size, epoch, root="./", image_size=227):
        return real_load(batch_size, epoch, root=root, image_size=32)

    monkeypatch.setattr("multimodalgame_tpu.data.cifar.load_cifar",
                        small_load)

    f_fast = flags_for("cf")
    f_slow = flags_for("cs", extra=["-nofast_driver"])
    r_fast = run(f_fast, max_steps=8)
    r_slow = run(f_slow, max_steps=8)
    assert r_fast["step"] == r_slow["step"] == 8
    assert len(r_fast["batch_accuracy"]) == len(r_slow["batch_accuracy"])

    def line_kinds(path):
        kinds = []
        for ln in open(path).read().splitlines():
            for head in ("Training Accuracy", "Loss Sender",
                         "Loss Receiver (Y)", "Loss Receiver (Z)",
                         "Loss Baseline", "Development Accuracy",
                         "Conversation Length", "Mean Hamming",
                         "Predictions", "Starting epoch", "Train:",
                         "Eval:", "Entropy Sender Binary",
                         "Entropy Receiver Predictions"):
                if head in ln:
                    kinds.append(head)
                    break
        return kinds

    assert line_kinds(f_fast.log_file) == line_kinds(f_slow.log_file)

    def stamps(path):
        return [ln.split("Training Accuracy")[0].split(": ", 1)[-1]
                for ln in open(path).read().splitlines()
                if "Training Accuracy" in ln]
    assert stamps(f_fast.log_file) == stamps(f_slow.log_file)


def test_cifar_attn_context_fast_driver_matches_legacy(cifar_root,
                                                       tmp_path,
                                                       synthetic_dataset,
                                                       monkeypatch):
    """CIFAR + attn_extra_context — the last config that used to stream
    through the legacy loop (VERDICT round-3 #8) — now runs the chunked
    driver with the fc context derived ON DEVICE from the staged pixels,
    and produces the legacy loop's log-artifact structure."""
    import h5py

    import multimodalgame_tpu.data.cifar as cifar_mod
    import multimodalgame_tpu.game.driver as drv
    from multimodalgame_tpu.config import (finalize_flags, make_flags,
                                           parse_args)
    from multimodalgame_tpu.data.synthetic import write_descriptions_csv
    from multimodalgame_tpu.train import run

    monkeypatch.chdir(cifar_root)
    monkeypatch.setattr(drv, "CIFAR_IMAGE_SIZE", 32)
    real_load = cifar_mod.load_cifar
    monkeypatch.setattr(
        "multimodalgame_tpu.data.cifar.load_cifar",
        lambda batch_size, epoch, root="./", image_size=227:
        real_load(batch_size, epoch, root=root, image_size=32))

    descr = str(tmp_path / "descr10.csv")
    write_descriptions_csv(descr, 10)
    dev = str(tmp_path / "dev_attn.hdf5")
    rng = np.random.RandomState(0)
    with h5py.File(dev, "w") as fh:
        fh.create_dataset("Target", data=np.arange(8, dtype=np.int64) % 10)
        fh.create_dataset("Location",
                          data=np.asarray([b"p%d.jpg" % i
                                           for i in range(8)], dtype="S50"))
        fh.create_dataset("layer4_2", data=rng.randn(
            8, 3, 32, 32).astype(np.float32))
        fh.create_dataset("fc", data=rng.randn(
            8, 1, 3 * 32 * 32).astype(np.float32))

    def flags_for(name, extra=()):
        f = make_flags()
        argv = [
            "-experiment_name", name, "-model_type", "FixedAttention",
            "-images", "cifar",
            "-log_path", str(tmp_path / name),
            "-img_feat_dim", "3",
            "-attn_context_dim", str(3 * 32 * 32), "-attn_dim", "8",
            "-batch_size", "8", "-batch_size_dev", "8",
            "-rec_w_dim", "8", "-sender_out_dim", "8",
            "-img_h_dim", "8", "-rec_hidden", "8", "-baseline_hid_dim", "8",
            "-max_exchange", "2", "-max_epoch", "2",
            "-top_k_dev", "2", "-top_k_train", "2",
            "-descr_train", descr, "-descr_dev", descr,
            "-train_file", synthetic_dataset["train"], "-dev_file", dev,
            "-wv_dim", "16", "-glove_path", synthetic_dataset["glove"],
            "-log_interval", "3", "-log_dev", "5",
            "-save_after", "1000", "-save_interval", "1000",
            "-exchange_samples", "1",
        ] + list(extra)
        parse_args(f, argv)
        finalize_flags(f, argv)
        os.makedirs(f.log_path, exist_ok=True)
        return f

    f_fast = flags_for("caf")
    assert f_fast.img_feat == "layer4_2" and f_fast.attn_extra_context
    f_slow = flags_for("cas", extra=["-nofast_driver"])
    r_fast = run(f_fast, max_steps=7)
    r_slow = run(f_slow, max_steps=7)
    assert r_fast["step"] == r_slow["step"] == 7
    assert len(r_fast["batch_accuracy"]) == len(r_slow["batch_accuracy"])

    def line_kinds(path):
        kinds = []
        for ln in open(path).read().splitlines():
            for head in ("Training Accuracy", "Loss Sender",
                         "Loss Receiver (Y)", "Loss Receiver (Z)",
                         "Loss Baseline", "Development Accuracy",
                         "Conversation Length", "Mean Hamming",
                         "Predictions", "Starting epoch", "Train:",
                         "Eval:", "Entropy Sender Binary",
                         "Entropy Receiver Predictions"):
                if head in ln:
                    kinds.append(head)
                    break
        return kinds

    assert line_kinds(f_fast.log_file) == line_kinds(f_slow.log_file)
