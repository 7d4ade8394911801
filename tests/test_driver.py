"""Chunked device-side driver tests (game/driver.py and its building
blocks): the fast path must reproduce the legacy per-batch loop's numbers
and log artifacts — it is the product path for the benchmark throughput
(VERDICT round-1 item #1)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalgame_tpu.config import finalize_flags, make_flags, parse_args
from multimodalgame_tpu.data.descriptions import load_descriptions
from multimodalgame_tpu.data.device_dataset import DeviceDataset
from multimodalgame_tpu.data.hdf5_loader import load_hdf5
from multimodalgame_tpu.game.agents import AgentModules, init_params
from multimodalgame_tpu.game.config import GameConfig
from multimodalgame_tpu.game.driver import decompose_chunks
from multimodalgame_tpu.game.train import (init_opt_states,

                                           make_eval_exchange,
                                           make_multistep_train_step_indexed,
                                           make_train_step_indexed)

pytestmark = pytest.mark.slow  # see pytest.ini: `-m "not slow"` is the fast subset


def test_decompose_chunks():
    for k in (1, 2, 3, 7, 49, 99, 100, 513, 1000):
        parts = decompose_chunks(k)
        assert sum(parts) == k
        assert all(p & (p - 1) == 0 for p in parts)  # powers of two
    assert decompose_chunks(0) == []


def test_epoch_indices_match_hdf5_loader(synthetic_dataset):
    """The device dataset's batch plan visits exactly the rows the
    reference-parity HDF5 loader yields (misc.py:269-284)."""
    paths = synthetic_dataset
    desc = load_descriptions(paths["descr"], "fake", 16)
    ds = DeviceDataset.from_hdf5(paths["train"], "avgpool_512",
                                 map_labels=desc.map_labels)
    for epoch in (0, 3):
        for batch_size, truncate in ((8, False), (7, True)):
            plan = ds.epoch_indices(epoch, True, batch_size,
                                    truncate_final_batch=truncate)
            loader = load_hdf5(paths["train"], batch_size, epoch, True,
                               truncate_final_batch=truncate,
                               map_labels=desc.map_labels)
            batches = list(loader)
            n_full = ds.size // batch_size
            expect_nb = n_full + (1 if truncate and ds.size % batch_size
                                  else 0)
            assert plan.shape[0] == len(batches) == expect_nb
            for row, b in zip(plan, batches):
                row = row[row >= 0]
                # example_ids are Location strings "img_%05d.jpg" in the
                # synthetic fixture — parse back the row index.
                got = [int(s.decode().split("_")[1].split(".")[0])
                       for s in b["example_ids"]]
                np.testing.assert_array_equal(row, got)
                np.testing.assert_array_equal(ds.targets_host[row],
                                              b["target"])
                np.testing.assert_allclose(
                    np.asarray(ds.feats)[row],
                    np.asarray(b["avgpool_512"]).reshape(len(row), -1),
                    rtol=1e-6)


@pytest.fixture(scope="module")
def small_game(synthetic_dataset):
    paths = synthetic_dataset
    desc = load_descriptions(paths["descr"], "fake", 16)
    cfg = GameConfig(img_feat_dim=512, img_h_dim=16, sender_out_dim=8,
                     rec_w_dim=8, rec_hidden=16, wv_dim=16, max_exchange=3,
                     baseline_hid_dim=16, fixed_exchange=False,
                     entropy_s=0.08, entropy_sen=0.01, entropy_rec=0.01,
                     learning_rate=1e-3, optim_type="RMSprop")
    mods = AgentModules(cfg)
    params = init_params(mods, jax.random.PRNGKey(0),
                         num_classes=desc.num_classes)
    ds = DeviceDataset.from_hdf5(paths["train"], "avgpool_512",
                                 map_labels=desc.map_labels)
    return mods, params, ds, desc


def test_chunked_trainer_matches_single_steps(small_game):
    """K scanned updates == K dispatched updates with the same derived
    keys: the chunked product path changes scheduling, not math.
    ``flat=False`` isolates the scan semantics; the flat-carry variant is
    pinned separately (it reassociates the clip-norm sum of squares)."""
    mods, params0, ds, desc = small_game
    cfg = mods.cfg
    desc_j = jnp.asarray(desc.desc)
    idx = ds.epoch_indices(0, True, 8)[:5]  # (5, 8)
    key = jax.random.PRNGKey(42)

    single = make_train_step_indexed(mods, top_k=2, batch_denom=8)
    chunk = make_multistep_train_step_indexed(mods, top_k=2, batch_denom=8,
                                              flat=False)

    p1 = jax.tree_util.tree_map(jnp.copy, params0)
    o1 = init_opt_states(cfg, p1)
    accs = []
    for i in range(idx.shape[0]):
        # step0=i: the single step folds the same per-global-step key
        # the chunk derives internally (fold_in(key, step0 + i)).
        p1, o1, m = single(p1, o1, ds.feats, ds.targets,
                           jnp.asarray(idx[i]), desc_j, key, np.int32(i))
        accs.append(float(m.accuracy))

    p2 = jax.tree_util.tree_map(jnp.copy, params0)
    o2 = init_opt_states(cfg, p2)
    p2, o2, sm = chunk(p2, o2, ds.feats, ds.targets, jnp.asarray(idx),
                       desc_j, key)

    np.testing.assert_allclose(np.asarray(sm.accuracy), accs, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)


def test_chunk_partition_invariance(small_game):
    """The trajectory is invariant to how steps are partitioned into
    dispatches: per-step keys are indexed by GLOBAL step inside the
    program (fold_in(key, step0+i)), so 5 == 2 + 3 — the property that
    makes the driver's exact-length remainder chunks and any future
    re-chunking pure performance knobs."""
    mods, params0, ds, desc = small_game
    cfg = mods.cfg
    desc_j = jnp.asarray(desc.desc)
    idx = ds.epoch_indices(0, True, 8)[:5]
    key = jax.random.PRNGKey(3)
    chunk = make_multistep_train_step_indexed(mods, top_k=2, batch_denom=8,
                                              flat=False)

    p1 = jax.tree_util.tree_map(jnp.copy, params0)
    o1 = init_opt_states(cfg, p1)
    p1, o1, sm1 = chunk(p1, o1, ds.feats, ds.targets, jnp.asarray(idx),
                        desc_j, key)

    p2 = jax.tree_util.tree_map(jnp.copy, params0)
    o2 = init_opt_states(cfg, p2)
    p2, o2, sa = chunk(p2, o2, ds.feats, ds.targets, jnp.asarray(idx[:2]),
                       desc_j, key, np.int32(0))
    p2, o2, sb = chunk(p2, o2, ds.feats, ds.targets, jnp.asarray(idx[2:]),
                       desc_j, key, np.int32(2))

    np.testing.assert_allclose(
        np.concatenate([np.asarray(sa.accuracy), np.asarray(sb.accuracy)]),
        np.asarray(sm1.accuracy), atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)


def test_piece_planner_exact_remainders():
    """512-step pieces + one exact remainder for RECURRING remainder
    lengths only: a first-seen length decomposes into power-of-two
    pieces (no fresh compile for one-off tails), its second occurrence
    dispatches exact, and the compile-bounding cap falls back to the
    power-of-two decomposition."""
    from multimodalgame_tpu.game.driver import make_piece_planner

    plan = make_piece_planner(cap=2)
    assert plan(999) == [512, 256, 128, 64, 32, 4, 2, 1]  # first: pow2
    assert plan(999) == [512, 487]          # recurs: exact program
    assert plan(999) == [512, 487]
    assert plan(512) == [512]
    assert plan(1024) == [512, 512]
    assert plan(3) == [2, 1]                # one-off tail: never compiles
    assert plan(3) == [3]                   # ...until it recurs
    assert plan(517) == [512, 4, 1]         # first occurrence
    assert plan(517) == [512, 4, 1]         # cap (2 admitted): pow2 stays
    assert plan(0) == []


@pytest.mark.parametrize("optim", ["RMSprop", "Adam", "SGD"])
def test_flat_carry_matches_tree_carry(small_game, optim):
    """The flat-vector carry (default) is the tree carry's math with one
    reassociated clip-norm reduction: optimizer-state trees round-trip
    exactly (RMSprop nu / Adam mu, nu, count), losses and accuracies
    agree tightly, and parameters stay close over a chunk (RMSprop's
    g/sqrt(nu) amplifies ~1e-8 reassociation noise in near-zero-gradient
    directions, hence the looser parameter tolerance)."""
    import dataclasses

    mods0, params0, ds, desc = small_game
    cfg = dataclasses.replace(mods0.cfg, optim_type=optim)
    mods = AgentModules(cfg)
    desc_j = jnp.asarray(desc.desc)
    idx = ds.epoch_indices(0, True, 8)[:5]
    key = jax.random.PRNGKey(7)

    outs = {}
    for flat in (False, True):
        p = jax.tree_util.tree_map(jnp.copy, params0)
        o = init_opt_states(cfg, p)
        chunk = make_multistep_train_step_indexed(mods, top_k=2,
                                                  batch_denom=8, flat=flat)
        outs[flat] = chunk(p, o, ds.feats, ds.targets, jnp.asarray(idx),
                           desc_j, key)

    (p_t, o_t, m_t), (p_f, o_f, m_f) = outs[False], outs[True]
    # Tree layout must be preserved exactly (checkpoint/interop surface).
    assert (jax.tree_util.tree_structure(o_t) ==
            jax.tree_util.tree_structure(o_f))
    assert (jax.tree_util.tree_structure(p_t) ==
            jax.tree_util.tree_structure(p_f))
    for a, b in zip(m_t, m_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_t),
                    jax.tree_util.tree_leaves(p_f)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)
    for a, b in zip(jax.tree_util.tree_leaves(o_t),
                    jax.tree_util.tree_leaves(o_f)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_empty_dev_set_fails_loudly(small_game):
    """A zero-row dev set raises a clear error instead of crashing deep
    in the statistics (np.concatenate of an empty list / 0-division)."""
    from multimodalgame_tpu.game.fast_eval import eval_dev_device

    mods, params, _, _ = small_game
    empty = DeviceDataset(np.zeros((0, 512), np.float32),
                          np.zeros((0,), np.int32))
    with pytest.raises(ValueError, match="empty"):
        eval_dev_device(mods, params, empty, epoch=0, shuffle=False,
                        batch_size=8, top_k=2,
                        desc=jnp.zeros((3, 16), jnp.float32),
                        key=jax.random.PRNGKey(0))


def test_fast_dev_eval_matches_host_eval(synthetic_dataset, small_game,
                                         tmp_path):
    """One-program dev sweep (game/fast_eval.py) reproduces eval.py's
    host-loop statistics (accuracy quirk, conversation lengths, Hamming
    means) — eval mode is deterministic, so parity is exact up to f32
    reduction order."""
    from multimodalgame_tpu.eval import eval_dev
    from multimodalgame_tpu.game.fast_eval import eval_dev_device

    paths = synthetic_dataset
    mods, params, _, _ = small_game
    desc = load_descriptions(paths["descr"], "fake", 16)
    dev_ds = DeviceDataset.from_hdf5(paths["dev"], "avgpool_512",
                                     map_labels=desc.map_labels)

    f = make_flags()
    parse_args(f, ["-experiment_name", "fd", "-model_type", "Adaptive",
                   "-log_path", str(tmp_path),
                   "-img_feat", "avgpool_512",
                   "-train_file", paths["train"],
                   "-dev_file", paths["dev"]])
    finalize_flags(f, [])
    os.makedirs(f.log_path, exist_ok=True)

    eval_exchange = make_eval_exchange(mods)
    # batch 7 exercises the ragged final batch + denominator quirk.
    acc_host, extra_host = eval_dev(
        f, mods, params, eval_exchange, paths["dev"], 7, epoch=0,
        shuffle=False, top_k=2, desc_pack=desc)

    acc_dev, extra_dev, trues, preds = eval_dev_device(
        mods, params, dev_ds, epoch=0, shuffle=False, batch_size=7,
        top_k=2, desc=jnp.asarray(desc.desc), key=jax.random.PRNGKey(0))

    assert acc_dev == pytest.approx(acc_host, abs=1e-6)
    for k in extra_host:
        assert extra_dev[k] == pytest.approx(extra_host[k], abs=1e-4), k
    assert trues.shape == preds.shape == (dev_ds.size,)


def test_fast_dev_eval_clamps_k_to_class_count(synthetic_dataset,
                                               small_game, tmp_path):
    """top_k > num_classes must not crash the device sweep: the
    reference's argsort slice keeps all columns when k > D
    (model.py:661-665), losses.topk_accuracy clamps, and the duplicated
    lax.top_k in fast_eval.py got the same clamp (review finding,
    commit following 7e13d7e)."""
    from multimodalgame_tpu.eval import eval_dev
    from multimodalgame_tpu.game.fast_eval import eval_dev_device

    paths = synthetic_dataset
    mods, params, _, _ = small_game
    desc = load_descriptions(paths["descr"], "fake", 16)
    dev_ds = DeviceDataset.from_hdf5(paths["dev"], "avgpool_512",
                                     map_labels=desc.map_labels)

    f = make_flags()
    parse_args(f, ["-experiment_name", "fk", "-model_type", "Adaptive",
                   "-log_path", str(tmp_path),
                   "-img_feat", "avgpool_512",
                   "-train_file", paths["train"],
                   "-dev_file", paths["dev"]])
    finalize_flags(f, [])
    os.makedirs(f.log_path, exist_ok=True)

    # 8 > the fixture's 6 classes; every example is a hit on both paths.
    acc_host, _ = eval_dev(
        f, mods, params, make_eval_exchange(mods), paths["dev"], 8,
        epoch=0, shuffle=False, top_k=8, desc_pack=desc)
    acc_dev, _, _, _ = eval_dev_device(
        mods, params, dev_ds, epoch=0, shuffle=False, batch_size=8,
        top_k=8, desc=jnp.asarray(desc.desc), key=jax.random.PRNGKey(0))
    assert acc_dev == pytest.approx(acc_host, abs=1e-6) == 1.0


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
        "-save_after", "2", "-save_interval", "4",
        "-exchange_samples", "1",
    ] + list(extra)
    parse_args(f, argv)
    finalize_flags(f, argv)
    os.makedirs(f.log_path, exist_ok=True)
    return f


def test_fast_driver_log_artifacts_match_legacy(synthetic_dataset,
                                                tmp_path):
    """Both drivers produce the same set of log lines/artifacts (values
    differ only through the documented PRNG-schedule deviation)."""
    from multimodalgame_tpu.train import run

    paths = synthetic_dataset
    f_fast = _flags(paths, tmp_path, "fast")
    f_slow = _flags(paths, tmp_path, "slow", extra=["-nofast_driver"])
    assert f_fast.fast_driver and not f_slow.fast_driver

    r_fast = run(f_fast, max_steps=8)
    r_slow = run(f_slow, max_steps=8)
    assert r_fast["step"] == r_slow["step"] == 8
    assert len(r_fast["batch_accuracy"]) == len(r_slow["batch_accuracy"])

    def line_kinds(path):
        kinds = []
        for ln in open(path).read().splitlines():
            for head in ("Training Accuracy", "Loss Sender",
                         "Loss Receiver (Y)", "Loss Receiver (Z)",
                         "Loss Receiver (S)", "Loss Baseline",
                         "Development Accuracy", "Conversation Length",
                         "Mean Hamming", "Predictions", "Starting epoch",
                         "Checkpointing", "Train:", "Eval:",
                         "Entropy Sender Binary",
                         "Entropy Receiver Binary",
                         "Entropy Receiver Predictions"):
                if head in ln:
                    kinds.append(head)
                    break
        return kinds

    assert line_kinds(f_fast.log_file) == line_kinds(f_slow.log_file)
    # Same step/batch stamps on the interval lines.
    def stamps(path):
        return [ln.split("Training Accuracy")[0].split(": ", 1)[-1]
                for ln in open(path).read().splitlines()
                if "Training Accuracy" in ln]
    assert stamps(f_fast.log_file) == stamps(f_slow.log_file)
    # Artifacts exist for both.
    for f in (f_fast, f_slow):
        assert os.path.exists(f.checkpoint)
        assert os.path.exists(f.conf_mat)


def test_fast_driver_small_dataset_banner_parity(synthetic_dataset,
                                                  tmp_path):
    """A dataset smaller than one batch yields zero training steps, but
    the legacy loop still prints every epoch's Starting banner — the
    chunked driver must match line-for-line."""
    from multimodalgame_tpu.train import run

    paths = synthetic_dataset
    f_fast = _flags(paths, tmp_path, "tinyf", extra=["-batch_size", "64"])
    f_slow = _flags(paths, tmp_path, "tinys",
                    extra=["-batch_size", "64", "-nofast_driver"])
    run(f_fast)
    run(f_slow)

    def banners(path):
        return [ln.split(": ", 1)[-1]
                for ln in open(path).read().splitlines()
                if "Starting epoch" in ln]

    assert banners(f_fast.log_file) == banners(f_slow.log_file)
    assert len(banners(f_fast.log_file)) == 2


def test_fast_driver_resume(synthetic_dataset, tmp_path):
    from multimodalgame_tpu.train import run

    paths = synthetic_dataset
    f1 = _flags(paths, tmp_path, "res")
    run(f1, max_steps=5)
    # Resuming a msgpack run with -ckpt_format orbax adopts the on-disk
    # format (mirror of the orbax-dir case) instead of dying at the
    # first periodic save.
    f2 = _flags(paths, tmp_path, "res", extra=["-ckpt_format", "orbax"])
    out = run(f2, max_steps=7)
    assert out["step"] == 7
    assert f2.ckpt_format == "msgpack"
    assert "Loading from: " + f2.checkpoint in open(f2.log_file).read()


def test_fast_driver_resume_orbax(synthetic_dataset, tmp_path):
    """-ckpt_format orbax: the driver's periodic checkpoint is an async
    orbax directory, and auto-resume detects and restores it."""
    pytest.importorskip("orbax.checkpoint")
    from multimodalgame_tpu.train import run

    paths = synthetic_dataset
    f1 = _flags(paths, tmp_path, "resorb",
                extra=["-ckpt_format", "orbax"])
    run(f1, max_steps=5)
    assert os.path.isdir(f1.checkpoint)
    f2 = _flags(paths, tmp_path, "resorb",
                extra=["-ckpt_format", "orbax"])
    out = run(f2, max_steps=7)
    assert out["step"] == 7
    assert "Loading from: " + f2.checkpoint in open(f2.log_file).read()
    # Resuming WITHOUT re-passing -ckpt_format adopts the on-disk format
    # (otherwise the next periodic save would collide with the
    # directory).
    f3 = _flags(paths, tmp_path, "resorb")
    out = run(f3, max_steps=9)
    assert out["step"] == 9
    assert f3.ckpt_format == "orbax"
    assert ("Checkpoint is an orbax directory; using -ckpt_format orbax"
            in open(f3.log_file).read())


def test_fast_driver_resume_orbax_mid_swap_crash(synthetic_dataset,
                                                 tmp_path):
    """A crash between the staging swap's two renames leaves NOTHING at
    flags.checkpoint — only the committed ``.staging``. The driver must
    still resume (recover_orbax runs BEFORE its exists() gate); an
    exists()-gated resume would silently restart at step 0 and the first
    periodic save would sweep the only committed copy as stale
    staging."""
    pytest.importorskip("orbax.checkpoint")
    from multimodalgame_tpu.train import run

    paths = synthetic_dataset
    f1 = _flags(paths, tmp_path, "reswap", extra=["-ckpt_format", "orbax"])
    run(f1, max_steps=5)
    assert os.path.isdir(f1.checkpoint)
    # Reproduce the mid-swap crash window: the newest checkpoint is the
    # committed .staging, the final path is already renamed away.
    os.rename(f1.checkpoint, f1.checkpoint + ".staging")
    f2 = _flags(paths, tmp_path, "reswap", extra=["-ckpt_format", "orbax"])
    out = run(f2, max_steps=7)
    assert out["step"] == 7
    log = open(f2.log_file).read()
    assert "Loading from: " + f2.checkpoint in log
    assert "Loaded at step: " in log
    assert os.path.isdir(f2.checkpoint)
    assert not os.path.exists(f2.checkpoint + ".staging")


def test_fast_driver_chunks_span_epochs(synthetic_dataset, tmp_path,
                                        monkeypatch):
    """Chunk boundaries come from host-visible cadences only — a single
    compiled chunk crosses epoch ends (VERDICT round-2 #5). With 6-step
    epochs (48 examples / batch 8) and no log/dev/save events in range,
    the driver must dispatch one >6-step chunk and still print every
    Starting-epoch banner in order."""
    import multimodalgame_tpu.game.driver as drv
    from multimodalgame_tpu.train import run

    sizes = []
    real_factory = drv.make_multistep_train_step_indexed

    def spy_factory(*a, **kw):
        real = real_factory(*a, **kw)

        def wrapper(params, opts, feats, targets, idx, *rest, **rkw):
            sizes.append(int(np.asarray(idx).shape[0]))
            return real(params, opts, feats, targets, idx, *rest, **rkw)

        return wrapper

    monkeypatch.setattr(drv, "make_multistep_train_step_indexed",
                        spy_factory)
    paths = synthetic_dataset
    f = _flags(paths, tmp_path, "span",
               extra=["-log_interval", "1000", "-log_dev", "1000",
                      "-save_after", "100000", "-exchange_samples", "0",
                      "-max_epoch", "3"])
    out = run(f, max_steps=17)
    # 3 epochs x 6 steps, capped at 17: step 0 is a log boundary (single
    # full-metrics step), the remaining 16 steps must arrive as 16 = one
    # power-of-two chunk spanning all three epochs.
    assert out["step"] == 17
    assert sizes == [16], sizes
    log = open(f.log_file).read()
    for e in range(3):
        assert "Starting epoch: {}".format(e) in log
    # Banner order: epoch banners appear in increasing order.
    pos = [log.index("Starting epoch: {}".format(e)) for e in range(3)]
    assert pos == sorted(pos)


def test_deferred_best_checkpoint_matches_dev_step_params(
        synthetic_dataset, tmp_path, monkeypatch):
    """The dev-eval fetch is deferred past further training dispatch
    (round 3); the best checkpoint must still hold the parameters AS OF
    the dev step (the device-side snapshot), not the later ones. Pinned
    by re-running the dev sweep from the saved checkpoint and
    reproducing the logged accuracy exactly."""
    import multimodalgame_tpu.game.driver as drv
    from multimodalgame_tpu.data.descriptions import load_descriptions
    from multimodalgame_tpu.game.fast_eval import eval_dev_device
    from multimodalgame_tpu.train import run
    from multimodalgame_tpu.utils.checkpoint import load_checkpoint

    paths = synthetic_dataset
    saved = {}
    real_save = drv.save_checkpoint

    def spy_save(path, data, params, opts, **kw):
        if path.endswith("_best"):
            saved[data["step"]] = jax.tree_util.tree_map(np.asarray,
                                                         params)
        return real_save(path, data, params, opts, **kw)

    monkeypatch.setattr(drv, "save_checkpoint", spy_save)
    f = _flags(paths, tmp_path, "defer",
               extra=["-log_interval", "1000", "-log_dev", "4",
                      "-save_after", "0", "-save_interval", "1000",
                      "-exchange_samples", "0"])
    out = run(f, max_steps=7)  # dev at steps 0 and 4; training to 7
    assert out["step"] == 7
    assert saved, "no best checkpoint was written"
    t_best = max(saved)
    assert t_best < 6  # training continued after the snapshot

    # The snapshot must differ from the final params (later updates)...
    final = jax.tree_util.tree_map(np.asarray, out["params"])
    leaves_a = jax.tree_util.tree_leaves(saved[t_best])
    leaves_b = jax.tree_util.tree_leaves(final)
    assert any(not np.array_equal(a, b)
               for a, b in zip(leaves_a, leaves_b))

    # ...and re-running the dev sweep from it must reproduce the logged
    # accuracy at that step exactly (same deterministic eval, but a
    # fresh PRNG key — eval-mode conversations are key-independent).
    logged = dict(out["metrics"]["Development Accuracy"])
    desc = load_descriptions(paths["descr"], f.wv_type, f.wv_dim,
                             glove_path=f.glove_path)
    ds = DeviceDataset.from_hdf5(paths["dev"], "avgpool_512",
                                 map_labels=desc.map_labels)
    mods = AgentModules(GameConfig.from_flags(f))
    acc, _, _, _ = eval_dev_device(
        mods, saved[t_best], ds, epoch=0, shuffle=f.shuffle_dev,
        batch_size=f.batch_size_dev, top_k=f.top_k_dev,
        desc=jnp.asarray(desc.desc), key=jax.random.PRNGKey(99))
    assert acc == pytest.approx(logged[t_best], abs=1e-9)


def test_deferred_periodic_save_matches_save_step_params(
        synthetic_dataset, tmp_path, monkeypatch):
    """The periodic checkpoint's fetch + file write are deferred past
    further training dispatch (round-3 continuation), riding on the next
    host-visible event like the dev-eval payload. The file must still
    hold the parameters AS OF the save step (the device-side snapshot),
    not the later ones — pinned by an identical run truncated at the
    save step."""
    import multimodalgame_tpu.game.driver as drv
    from multimodalgame_tpu.train import run
    from multimodalgame_tpu.utils.checkpoint import load_checkpoint

    paths = synthetic_dataset
    saved = {}
    real_save = drv.save_checkpoint

    def spy_save(path, data, params, opts, **kw):
        if not path.endswith("_best"):
            saved[data["step"]] = jax.tree_util.tree_map(np.asarray,
                                                         params)
        return real_save(path, data, params, opts, **kw)

    monkeypatch.setattr(drv, "save_checkpoint", spy_save)
    extra = ["-log_interval", "1000", "-log_dev", "1000",
             "-save_after", "0", "-save_interval", "4",
             "-exchange_samples", "0"]
    f = _flags(paths, tmp_path, "dsavea", extra=extra)
    out = run(f, max_steps=7)   # saves at steps 0 and 4; training to 7
    assert out["step"] == 7
    assert sorted(saved) == [0, 4]
    # The save at step 4 has no later host-visible event before
    # max_steps — it must still be on disk when the driver returns,
    # holding step 4.
    data, _, _ = load_checkpoint(
        f.checkpoint, out["params"], out["opt_states"])
    assert data["step"] == 4
    assert open(f.log_file).read().count("Checkpointing.") == 2

    # The snapshot differs from the final params (training continued)...
    snap4 = saved[4]
    final = jax.tree_util.tree_map(np.asarray, out["params"])
    assert any(not np.array_equal(a, b)
               for a, b in zip(jax.tree_util.tree_leaves(snap4),
                               jax.tree_util.tree_leaves(final)))

    # ...and equals, bit-for-bit, the final params of the same run
    # truncated at the save step (chunk boundaries coincide — the save
    # breaks the chunk at step 4 in both — so the PRNG schedule is
    # identical).
    f2 = _flags(paths, tmp_path, "dsaveb", extra=extra)
    out2 = run(f2, max_steps=5)
    for a, b in zip(jax.tree_util.tree_leaves(snap4),
                    jax.tree_util.tree_leaves(
                        jax.tree_util.tree_map(np.asarray,
                                               out2["params"]))):
        np.testing.assert_array_equal(a, b)


def test_fast_driver_dense_boundaries(synthetic_dataset, tmp_path):
    """Stress the flattened loop where EVERY step is a log boundary and
    every other step a dev boundary (log_interval=1, log_dev=2): event
    ordering, accuracy windows, and the step/batch stamps must all hold
    with zero-length chunks between boundaries."""
    from multimodalgame_tpu.train import run

    paths = synthetic_dataset
    f = _flags(paths, tmp_path, "dense",
               extra=["-log_interval", "1", "-log_dev", "2",
                      "-save_after", "0", "-save_interval", "3",
                      "-exchange_samples", "0"])
    out = run(f, max_steps=5)
    assert out["step"] == 5
    assert len(out["batch_accuracy"]) == 5
    log = open(f.log_file).read()
    # One Training Accuracy line per step, stamped 0..4.
    stamps = [ln.split("Training Accuracy")[0].split(": ", 1)[-1]
              for ln in log.splitlines() if "Training Accuracy" in ln]
    assert len(stamps) == 5
    steps = [int(s.split("Step: ")[1].split(" ")[0]) for s in stamps]
    assert steps == [0, 1, 2, 3, 4]
    # Dev lines at steps 0, 2, 4 in order.
    dev_steps = [int(ln.split("Step: ")[1].split(" ")[0])
                 for ln in log.splitlines()
                 if "Development Accuracy" in ln and "Step: " in ln]
    assert dev_steps == [0, 2, 4]
    # Dev lines for step t print after step t's window and before
    # step t+1's window.
    order = []
    for ln in log.splitlines():
        if "Training Accuracy" in ln:
            order.append(("w", int(ln.split("Step: ")[1].split(" ")[0])))
        elif "Development Accuracy" in ln and "Step: " in ln:
            order.append(("d", int(ln.split("Step: ")[1].split(" ")[0])))
    assert order == [("w", 0), ("d", 0), ("w", 1), ("w", 2), ("d", 2),
                     ("w", 3), ("w", 4), ("d", 4)]


def test_fast_driver_debug_mode(synthetic_dataset, tmp_path):
    """-debug arms jax_debug_nans (the reference's np.seterr analog,
    model.py:1806-1807); the chunked driver's scans and donated buffers
    must run clean under it."""
    import jax

    from multimodalgame_tpu.train import run

    paths = synthetic_dataset
    old_seterr = np.seterr()   # -debug arms np.seterr(all="raise")
    f = _flags(paths, tmp_path, "dbg",
               extra=["-debug", "-exchange_samples", "0",
                      "-log_dev", "1000"])
    try:
        out = run(f, max_steps=3)
    finally:
        jax.config.update("jax_debug_nans", False)
        np.seterr(**old_seterr)
    assert out["step"] == 3
    assert all(np.isfinite(a) for a in out["batch_accuracy"])


def test_mesh_driver_resume(synthetic_dataset, tmp_path):
    """Checkpoint resume under -mesh: the loaded trees re-place onto the
    mesh and training continues from the saved step."""
    from multimodalgame_tpu.train import run

    paths = synthetic_dataset
    f1 = _flags(paths, tmp_path, "mres",
                extra=["-mesh", "8", "-save_after", "0",
                       "-save_interval", "2", "-exchange_samples", "0"])
    run(f1, max_steps=3)
    f2 = _flags(paths, tmp_path, "mres",
                extra=["-mesh", "8", "-save_after", "0",
                       "-save_interval", "2", "-exchange_samples", "0"])
    out = run(f2, max_steps=5)
    assert out["step"] == 5
    assert "Loading from: " + f2.checkpoint in open(f2.log_file).read()
