"""Mesh-sharded product driver (VERDICT round-2 item #2): the chunked
CLI training driver running data-parallel over an 8-device mesh must
reproduce the single-device driver — same log artifacts, same accuracy
stream, same final parameters (up to psum reassociation) — and the CLI
flag surface must expose it (``-mesh N`` / ``-mesh -1``)."""

import os
import re

import jax
import numpy as np
import pytest

from multimodalgame_tpu.config import finalize_flags, make_flags, parse_args

pytestmark = pytest.mark.slow  # see pytest.ini: `-m "not slow"` is the fast subset

N_DEV = 8


def _flags(paths, tmp_path, name, extra=()):
    f = make_flags()
    argv = [
        "-experiment_name", name, "-model_type", "Adaptive",
        "-log_path", str(tmp_path / name),
        "-batch_size", "8", "-batch_size_dev", "8",
        "-rec_w_dim", "8", "-sender_out_dim", "8",
        "-img_h_dim", "16", "-rec_hidden", "16", "-baseline_hid_dim", "16",
        "-max_exchange", "3", "-max_epoch", "2",
        "-top_k_dev", "2", "-top_k_train", "2",
        "-descr_train", paths["descr"], "-descr_dev", paths["descr"],
        "-train_file", paths["train"], "-dev_file", paths["dev"],
        "-wv_dim", "16", "-glove_path", paths["glove"],
        "-log_interval", "4", "-log_dev", "6",
        "-save_after", "100", "-save_interval", "100",
        "-exchange_samples", "1",
    ] + list(extra)
    parse_args(f, argv)
    finalize_flags(f, argv)
    os.makedirs(f.log_path, exist_ok=True)
    return f


def _log_numbers(path):
    """(raw-line, line-kind, numeric values) triples from a driver log,
    timestamp stripped — the comparable artifact stream."""
    out = []
    for ln in open(path).read().splitlines():
        msg = ln.split(": ", 1)[-1]
        kind = re.sub(r"[-+]?\d+\.?\d*(e[-+]?\d+)?", "#", msg)
        vals = [float(v) for v in re.findall(
            r"[-+]?\d+\.\d+(?:e[-+]?\d+)?", msg)]
        out.append((ln, kind, vals))
    return out


@pytest.mark.parametrize("mesh_flag", ["8", "-1"])
def test_mesh_driver_matches_single_device(synthetic_dataset, tmp_path,
                                           mesh_flag):
    from multimodalgame_tpu.train import run

    assert len(jax.devices()) == N_DEV  # conftest forces 8 CPU devices

    paths = synthetic_dataset
    f_one = _flags(paths, tmp_path, "one")
    f_mesh = _flags(paths, tmp_path, "mesh" + mesh_flag,
                    extra=["-mesh", mesh_flag])

    r_one = run(f_one, max_steps=8)
    r_mesh = run(f_mesh, max_steps=8)

    assert r_one["step"] == r_mesh["step"] == 8
    # Same PRNG schedule -> same sampled conversations -> the per-step
    # accuracy stream is identical up to reduction order.
    np.testing.assert_allclose(r_mesh["batch_accuracy"],
                               r_one["batch_accuracy"], atol=1e-6)
    # Final parameters match up to psum/reduction reassociation
    # accumulated over 8 RMSprop updates. receiver.y2.bias is excluded:
    # its gradient is analytically zero (log-softmax rows sum to 0), so
    # RMSprop turns f32 rounding noise into an lr-scale random walk whose
    # sign legitimately depends on reduction order.
    flat_one = jax.tree_util.tree_leaves_with_path(r_one["params"])
    flat_mesh = jax.tree_util.tree_leaves_with_path(r_mesh["params"])
    for (pa, a), (_, b) in zip(flat_one, flat_mesh):
        label = jax.tree_util.keystr(pa)
        if "y2']['bias" in label:
            continue
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-5,
            err_msg=label)
    # Logged metric history (losses, dev accuracy, conversation stats):
    # same keys, same steps, near-identical values.
    assert set(r_one["metrics"]) == set(r_mesh["metrics"])
    for k in r_one["metrics"]:
        ours = [(s, v) for s, v in r_mesh["metrics"][k]]
        ref = [(s, v) for s, v in r_one["metrics"][k]]
        assert [s for s, _ in ours] == [s for s, _ in ref], k
        np.testing.assert_allclose([v for _, v in ours],
                                   [v for _, v in ref], rtol=2e-2,
                                   atol=2e-3, err_msg=k)
    # Log artifact structure is line-for-line identical from the first
    # epoch on (the preamble embeds run-name-dependent paths; the mesh
    # run adds its one "Data-parallel mesh" banner).
    def body_kinds(path):
        rows = [(raw, k) for raw, k, _ in _log_numbers(path)
                if "Data-parallel mesh" not in raw]
        start = next(i for i, (raw, _) in enumerate(rows)
                     if "Starting epoch" in raw)
        return [k for _, k in rows[start:]]

    assert body_kinds(f_one.log_file) == body_kinds(f_mesh.log_file)


def test_tp_mesh_driver_matches_single_device(synthetic_dataset, tmp_path):
    """`-mesh 8 -mesh_model 2` (a 4x2 data x model grid with the sender
    MLP and baselines Megatron-sharded, parallel/tensor.py) reproduces
    the single-device driver's accuracy stream, final parameters, and
    log-artifact structure."""
    from multimodalgame_tpu.train import run

    paths = synthetic_dataset
    f_one = _flags(paths, tmp_path, "tp_one")
    f_tp = _flags(paths, tmp_path, "tp_mesh",
                  extra=["-mesh", "8", "-mesh_model", "2"])

    r_one = run(f_one, max_steps=8)
    r_tp = run(f_tp, max_steps=8)

    assert r_one["step"] == r_tp["step"] == 8
    np.testing.assert_allclose(r_tp["batch_accuracy"],
                               r_one["batch_accuracy"], atol=1e-6)
    flat_one = jax.tree_util.tree_leaves_with_path(r_one["params"])
    flat_tp = jax.tree_util.tree_leaves_with_path(r_tp["params"])
    for (pa, a), (_, b) in zip(flat_one, flat_tp):
        label = jax.tree_util.keystr(pa)
        if "y2']['bias" in label:  # zero-gradient leaf; see the dp test
            continue
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-5,
            err_msg=label)

    def body_kinds(path):
        rows = [(raw, k) for raw, k, _ in _log_numbers(path)
                if "Data-parallel mesh" not in raw
                and "data x" not in raw]  # the tp banner
        start = next(i for i, (raw, _) in enumerate(rows)
                     if "Starting epoch" in raw)
        return [k for _, k in rows[start:]]

    assert body_kinds(f_one.log_file) == body_kinds(f_tp.log_file)


def test_mesh_flag_validation(synthetic_dataset, tmp_path):
    from multimodalgame_tpu.game.driver import resolve_mesh
    from multimodalgame_tpu.train import run

    paths = synthetic_dataset
    # batch 8 % mesh 3 != 0
    f_bad = _flags(paths, tmp_path, "bad", extra=["-mesh", "3"])
    with pytest.raises(ValueError, match="not divisible"):
        resolve_mesh(f_bad)
    # legacy driver + mesh is rejected loudly
    f_legacy = _flags(paths, tmp_path, "legacy",
                      extra=["-mesh", "8", "-nofast_driver"])
    with pytest.raises(ValueError, match="mesh"):
        run(f_legacy, max_steps=1)
    # -mesh_model needs -mesh, must divide it, and data-axis batch
    # divisibility is validated against mesh/mesh_model.
    f_nom = _flags(paths, tmp_path, "nomesh", extra=["-mesh_model", "2"])
    with pytest.raises(ValueError, match="requires -mesh"):
        resolve_mesh(f_nom)
    f_nodiv = _flags(paths, tmp_path, "nodiv",
                     extra=["-mesh", "8", "-mesh_model", "3"])
    with pytest.raises(ValueError, match="does not divide"):
        resolve_mesh(f_nodiv)
    # batch 8 over a 1-data x 8-model grid: data axis 1 is fine; but a
    # 2-data grid with batch 9 would fail — covered by the n_data check.
    f_tp_bad = _flags(paths, tmp_path, "tpbad",
                      extra=["-mesh", "8", "-mesh_model", "2",
                             "-batch_size", "6"])
    with pytest.raises(ValueError, match="data-axis"):
        resolve_mesh(f_tp_bad)
    # legacy driver + mesh_model alone is rejected loudly too
    f_legacy2 = _flags(paths, tmp_path, "legacy2",
                       extra=["-mesh", "8", "-mesh_model", "2",
                              "-nofast_driver"])
    with pytest.raises(ValueError, match="mesh"):
        run(f_legacy2, max_steps=1)


def test_sharded_dev_eval_matches_unsharded(synthetic_dataset):
    """The device dev sweep under a sharded row plan returns the same
    statistics as the unsharded sweep (same key -> identical
    conversations; hits/lengths are reductions)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from multimodalgame_tpu.data.descriptions import load_descriptions
    from multimodalgame_tpu.data.device_dataset import DeviceDataset
    from multimodalgame_tpu.game.agents import AgentModules, init_params
    from multimodalgame_tpu.game.config import GameConfig
    from multimodalgame_tpu.game.fast_eval import eval_dev_device
    from multimodalgame_tpu.parallel.mesh import BATCH_AXIS, make_mesh

    paths = synthetic_dataset
    desc = load_descriptions(paths["descr"], "fake", 16)
    cfg = GameConfig(img_feat_dim=512, img_h_dim=16, sender_out_dim=8,
                     rec_w_dim=8, rec_hidden=16, wv_dim=16, max_exchange=3,
                     baseline_hid_dim=16, fixed_exchange=False)
    mods = AgentModules(cfg)
    params = init_params(mods, jax.random.PRNGKey(0),
                         num_classes=desc.num_classes)
    ds = DeviceDataset.from_hdf5(paths["dev"], "avgpool_512",
                                 map_labels=desc.map_labels)
    key = jax.random.PRNGKey(5)
    base = eval_dev_device(mods, params, ds, epoch=0, shuffle=False,
                           batch_size=8, top_k=2,
                           desc=jnp.asarray(desc.desc), key=key)

    mesh = make_mesh(N_DEV)
    rep = NamedSharding(mesh, P())
    ds.place(rep)
    params_r = jax.device_put(params, rep)

    def placer(rows):
        rows = np.asarray(rows)
        if rows.shape[-1] % N_DEV:
            return jax.device_put(rows, rep)
        spec = P(*([None] * (rows.ndim - 1) + [BATCH_AXIS]))
        return jax.device_put(rows, NamedSharding(mesh, spec))

    sharded = eval_dev_device(mods, params_r, ds, epoch=0, shuffle=False,
                              batch_size=8, top_k=2,
                              desc=jax.device_put(
                                  jnp.asarray(desc.desc), rep),
                              key=key, row_placer=placer)
    assert sharded[0] == pytest.approx(base[0], abs=1e-6)
    for k in base[1]:
        assert sharded[1][k] == pytest.approx(base[1][k], abs=1e-4), k
    np.testing.assert_array_equal(base[2], sharded[2])
    np.testing.assert_array_equal(base[3], sharded[3])


def test_mesh_cifar_fast_driver(tmp_path, synthetic_dataset, monkeypatch):
    """-mesh composes with the CIFAR staged-uint8 path: the batch gather
    + on-device normalization shard like any other step (replicated u8
    pixels, sharded index rows), and the run matches single-device."""
    import os
    import pickle

    import h5py

    import multimodalgame_tpu.game.driver as drv
    from multimodalgame_tpu.data.synthetic import write_descriptions_csv
    from multimodalgame_tpu.train import run

    root = tmp_path / "cifar"
    os.makedirs(root / "cifar-10-batches-py")
    rng = np.random.RandomState(0)
    payload = {
        b"data": rng.randint(0, 256, size=(40, 3072), dtype=np.uint8),
        b"labels": [int(x) for x in rng.randint(0, 10, size=40)],
    }
    with open(root / "cifar-10-batches-py" / "test_batch", "wb") as f:
        pickle.dump(payload, f)
    monkeypatch.chdir(root)
    monkeypatch.setattr(drv, "CIFAR_IMAGE_SIZE", 32)

    descr = str(tmp_path / "descr10.csv")
    write_descriptions_csv(descr, 10)
    dev = str(tmp_path / "dev_pixels.hdf5")
    with h5py.File(dev, "w") as fh:
        fh.create_dataset("Target", data=np.arange(8, dtype=np.int64) % 10)
        fh.create_dataset("Location",
                          data=np.asarray([b"p%d.jpg" % i
                                           for i in range(8)], dtype="S50"))
        fh.create_dataset(
            "avgpool_512",
            data=np.random.RandomState(0).randn(
                8, 1, 3 * 32 * 32).astype(np.float32))

    def flags_for(name, extra=()):
        from multimodalgame_tpu.config import (finalize_flags, make_flags,
                                               parse_args)
        f = make_flags()
        argv = [
            "-experiment_name", name, "-model_type", "Fixed",
            "-images", "cifar", "-log_path", str(tmp_path / name),
            "-img_feat", "avgpool_512", "-img_feat_dim", str(3 * 32 * 32),
            "-batch_size", "8", "-batch_size_dev", "8",
            "-rec_w_dim", "8", "-sender_out_dim", "8",
            "-img_h_dim", "8", "-rec_hidden", "8", "-baseline_hid_dim", "8",
            "-max_exchange", "2", "-max_epoch", "2",
            "-top_k_dev", "2", "-top_k_train", "2",
            "-descr_train", descr, "-descr_dev", descr,
            "-train_file", synthetic_dataset["train"], "-dev_file", dev,
            "-wv_dim", "16", "-glove_path", synthetic_dataset["glove"],
            "-log_interval", "1000", "-log_dev", "1000",
            "-save_after", "100000", "-save_interval", "100000",
            "-exchange_samples", "0",
        ] + list(extra)
        parse_args(f, argv)
        finalize_flags(f, argv)
        os.makedirs(f.log_path, exist_ok=True)
        return f

    r_one = run(flags_for("c1"), max_steps=6)
    r_mesh = run(flags_for("c8", extra=["-mesh", "8"]), max_steps=6)
    assert r_one["step"] == r_mesh["step"] == 6
    np.testing.assert_allclose(r_mesh["batch_accuracy"],
                               r_one["batch_accuracy"], atol=1e-6)
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(r_one["params"]),
            jax.tree_util.tree_leaves_with_path(r_mesh["params"])):
        label = jax.tree_util.keystr(pa)
        if "y2']['bias" in label:   # zero-grad noise walk (see above)
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-5, err_msg=label)


def test_mesh_eval_only_matches_single_device(synthetic_dataset, tmp_path):
    """-eval_only under -mesh runs the device dev sweep sharded and
    returns the same statistics (and eval CSV) as single-device; the
    host-loop eval (-nofast_driver) still rejects -mesh loudly."""
    from multimodalgame_tpu.train import run

    paths = synthetic_dataset
    f_train = _flags(paths, tmp_path, "mevt",
                     extra=["-save_after", "0", "-save_interval", "2"])
    run(f_train, max_steps=3)
    assert os.path.exists(f_train.checkpoint)

    f_single = _flags(paths, tmp_path, "mevt",
                      extra=["-eval_only", "-checkpoint",
                             f_train.checkpoint])
    out_single = run(f_single)
    f_mesh = _flags(paths, tmp_path, "mevt",
                    extra=["-eval_only", "-mesh", "8", "-checkpoint",
                           f_train.checkpoint])
    out_mesh = run(f_mesh)
    assert out_mesh["dev_acc"] == pytest.approx(out_single["dev_acc"],
                                                rel=1e-6)
    for k in ("conversation_lengths_mean", "hamming_rec_mean",
              "hamming_sen_mean"):
        assert out_mesh["extra"][k] == pytest.approx(
            out_single["extra"][k], rel=1e-5)

    f_host = _flags(paths, tmp_path, "mevth",
                    extra=["-eval_only", "-mesh", "8", "-nofast_driver",
                           "-checkpoint", f_train.checkpoint])
    with pytest.raises(ValueError, match="mesh"):
        run(f_host)
    # Eval configs that fall to the host loop despite -fast_driver (the
    # Pallas opt-in routes through eval.py) must also reject -mesh
    # rather than silently ignore it.
    f_pallas = _flags(paths, tmp_path, "mevtp",
                      extra=["-eval_only", "-mesh", "8", "-checkpoint",
                             f_train.checkpoint])
    os.environ["MMG_USE_PALLAS_EVAL"] = "1"
    try:
        with pytest.raises(ValueError, match="mesh"):
            run(f_pallas)
    finally:
        del os.environ["MMG_USE_PALLAS_EVAL"]
    # Only the dev batch must divide the mesh on the eval path: an
    # eval-only run with an indivisible *training* batch size is fine.
    f_odd = _flags(paths, tmp_path, "mevto",
                   extra=["-eval_only", "-mesh", "8", "-batch_size", "9",
                          "-checkpoint", f_train.checkpoint])
    out_odd = run(f_odd)
    assert out_odd["dev_acc"] == pytest.approx(out_single["dev_acc"],
                                               rel=1e-6)


def test_tp_eval_only_matches_single_device(synthetic_dataset, tmp_path):
    """-eval_only under -mesh 8 -mesh_model 2 applies the Megatron
    placement to the dev sweep (not a silent 1-D fallback — advisor
    round-3 #2): same statistics as single-device, 2-D banner logged."""
    from multimodalgame_tpu.train import run

    paths = synthetic_dataset
    f_train = _flags(paths, tmp_path, "tpev",
                     extra=["-save_after", "0", "-save_interval", "2"])
    run(f_train, max_steps=3)

    f_single = _flags(paths, tmp_path, "tpev",
                      extra=["-eval_only", "-checkpoint",
                             f_train.checkpoint])
    out_single = run(f_single)
    f_tp = _flags(paths, tmp_path, "tpev2",
                  extra=["-eval_only", "-mesh", "8", "-mesh_model", "2",
                         "-checkpoint", f_train.checkpoint])
    out_tp = run(f_tp)
    assert out_tp["dev_acc"] == pytest.approx(out_single["dev_acc"],
                                              rel=1e-6)
    for k in ("conversation_lengths_mean", "hamming_rec_mean",
              "hamming_sen_mean"):
        assert out_tp["extra"][k] == pytest.approx(
            out_single["extra"][k], rel=1e-5)
    log = open(f_tp.log_file).read()
    assert "4 data x 2 model" in log
    assert "Data-parallel mesh" not in log
