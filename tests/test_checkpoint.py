"""Checkpoint round-trip tests (reference misc.py:58-92)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalgame_tpu.game.agents import AgentModules, init_params
from multimodalgame_tpu.game.config import GameConfig
from multimodalgame_tpu.game.train import init_opt_states, make_train_step
from multimodalgame_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def _setup():
    cfg = GameConfig(img_feat_dim=16, img_h_dim=8, sender_out_dim=4,
                     rec_w_dim=4, rec_hidden=8, wv_dim=6, max_exchange=2,
                     baseline_hid_dim=8)
    mods = AgentModules(cfg)
    params = init_params(mods, jax.random.PRNGKey(0), num_classes=3)
    opts = init_opt_states(cfg, params)
    return cfg, mods, params, opts


def test_roundtrip(tmp_path):
    cfg, mods, params, opts = _setup()
    path = str(tmp_path / "ckpt.pt")
    save_checkpoint(path, dict(step=42, best_dev_acc=0.75), params, opts)

    # Fresh templates with different values.
    params2 = init_params(mods, jax.random.PRNGKey(9), num_classes=3)
    opts2 = init_opt_states(cfg, params2)
    data, params3, opts3 = load_checkpoint(path, params2, opts2)

    assert data["step"] == 42
    assert data["best_dev_acc"] == 0.75
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params3)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Optimizer-state pytree structure survives.
    assert (jax.tree_util.tree_structure(opts)
            == jax.tree_util.tree_structure(opts3))


def test_resume_training_continuity(tmp_path):
    """Save -> load -> one step must equal just continuing (optimizer
    state included), mirroring the reference's auto-resume
    (model.py:1149-1156)."""
    cfg, mods, params, opts = _setup()
    step = make_train_step(mods, top_k=2, batch_denom=4)
    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.randn(4, 16), jnp.float32)
    target = jnp.asarray([0, 1, 2, 0])
    desc = jnp.asarray(rng.randn(3, 6), jnp.float32)

    # Advance two steps, checkpoint midway.
    params, opts, _ = step(params, opts, data, target, desc,
                           jax.random.PRNGKey(1))
    path = str(tmp_path / "mid.pt")
    save_checkpoint(path, dict(step=1, best_dev_acc=0.0), params, opts)
    params_cont, opts_cont, m_cont = step(params, opts, data, target, desc,
                                          jax.random.PRNGKey(2))

    cfg2, mods2, params2, opts2 = _setup()
    _, params_re, opts_re = load_checkpoint(path, params2, opts2)
    step2 = make_train_step(mods2, top_k=2, batch_denom=4)
    params_res, opts_res, m_res = step2(params_re, opts_re, data, target,
                                        desc, jax.random.PRNGKey(2))

    np.testing.assert_allclose(float(m_cont.loss_rec),
                               float(m_res.loss_rec), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(params_cont),
                    jax.tree_util.tree_leaves(params_res)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_missing_file_raises(tmp_path):
    cfg, mods, params, opts = _setup()
    with pytest.raises(FileNotFoundError):
        load_checkpoint(str(tmp_path / "nope.pt"), params, opts)


def test_atomic_overwrite(tmp_path):
    cfg, mods, params, opts = _setup()
    path = str(tmp_path / "ckpt.pt")
    save_checkpoint(path, dict(step=1, best_dev_acc=0.1), params, opts)
    save_checkpoint(path, dict(step=2, best_dev_acc=0.2), params, opts)
    data, _, _ = load_checkpoint(path, params, opts)
    assert data["step"] == 2


def test_orbax_roundtrip(tmp_path):
    """-ckpt_format orbax: async directory checkpoint; load_checkpoint
    auto-detects the format from the path (directory = orbax)."""
    import os
    pytest.importorskip("orbax.checkpoint")
    cfg, mods, params, opts = _setup()
    path = str(tmp_path / "ckpt.orbax")
    save_checkpoint(path, dict(step=7, best_dev_acc=0.5), params, opts,
                    fmt="orbax")

    params2 = init_params(mods, jax.random.PRNGKey(9), num_classes=3)
    opts2 = init_opt_states(cfg, params2)
    data, params3, opts3 = load_checkpoint(path, params2, opts2)

    assert os.path.isdir(path)
    assert data["step"] == 7
    assert data["best_dev_acc"] == 0.5
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params3)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert (jax.tree_util.tree_structure(opts)
            == jax.tree_util.tree_structure(opts3))


def test_orbax_overwrite_and_unknown_fmt(tmp_path):
    import os
    pytest.importorskip("orbax.checkpoint")
    cfg, mods, params, opts = _setup()
    path = str(tmp_path / "ckpt.orbax")
    save_checkpoint(path, dict(step=1, best_dev_acc=0.1), params, opts,
                    fmt="orbax")
    # Crash safety: before the next synchronization point the previous
    # checkpoint is still intact at the path (the new one commits to a
    # .staging sibling and swaps in at wait_for_checkpoints).
    data, _, _ = load_checkpoint(path, params, opts)
    assert data["step"] == 1
    save_checkpoint(path, dict(step=2, best_dev_acc=0.2), params, opts,
                    fmt="orbax")
    # The async save must not have deleted the live checkpoint.
    assert os.path.isdir(path)
    data, _, _ = load_checkpoint(path, params, opts)
    assert data["step"] == 2
    # No staging/old leftovers after the swap finalized.
    assert not os.path.exists(path + ".staging")
    assert not os.path.exists(path + ".old")
    with pytest.raises(ValueError):
        save_checkpoint(str(tmp_path / "x"), dict(step=0), params, opts,
                        fmt="pickle")


def test_orbax_crash_recovery_every_stage(tmp_path):
    """Fault injection for the async staging/swap protocol (VERDICT
    round-3 #9): simulate a process death at every stage and assert a
    loadable checkpoint — holding the newest *committed* payload —
    survives each one, via load_checkpoint's self-healing recovery.

    Stages (utils/checkpoint.py:_save_orbax/wait_for_checkpoints):
    A. mid-serialization (orbax tmp dir present, staging never renamed)
    B. after the async commit, before the swap ran
    C. between the swap's two renames (final path missing!)
    D. after the swap, before the ``.old`` cleanup
    E. pathological lone ``.old`` (manual interference)"""
    import os
    import shutil

    pytest.importorskip("orbax.checkpoint")
    import multimodalgame_tpu.utils.checkpoint as C
    cfg, mods, params, opts = _setup()
    path = str(tmp_path / "ckpt.orbax")

    def save(step):
        save_checkpoint(path, dict(step=step, best_dev_acc=0.0),
                        params, opts, fmt="orbax")

    def load_step():
        data, _, _ = load_checkpoint(path, params, opts)
        return data["step"]

    save(1)
    C.wait_for_checkpoints()
    assert load_step() == 1

    # A: partial-serialization garbage; v1 intact, trash swept by the
    # next save dispatch.
    trash = path + ".staging.orbax-checkpoint-tmp-12345"
    os.makedirs(trash)
    with open(os.path.join(trash, "junk"), "w") as fh:
        fh.write("partial")
    assert load_step() == 1
    save(2)
    assert not os.path.exists(trash)
    C.wait_for_checkpoints()
    assert load_step() == 2

    # B: staging holds committed v3, final still v2; process death =
    # losing the in-memory pending-swap list.
    save(3)
    C._ORBAX.wait_until_finished()
    assert os.path.isdir(path + ".staging")
    C._PENDING_SWAPS.clear()
    assert load_step() == 3
    assert not os.path.exists(path + ".staging")

    # C: the swap's first rename ran (final moved to .old), the second
    # didn't — NOTHING at the final path, staging holds committed v4.
    save(4)
    C._ORBAX.wait_until_finished()
    C._PENDING_SWAPS.clear()
    os.rename(path, path + ".old")
    assert not os.path.exists(path)
    assert load_step() == 4
    assert not os.path.exists(path + ".old")
    assert not os.path.exists(path + ".staging")

    # D: swap completed but the stale .old cleanup didn't run.
    save(5)
    C.wait_for_checkpoints()
    shutil.copytree(path, path + ".old")
    assert load_step() == 5
    assert not os.path.exists(path + ".old")

    # E: lone .old with no live checkpoint — restored, not lost.
    os.rename(path, path + ".old")
    assert load_step() == 5
    assert not os.path.exists(path + ".old")


def test_checkpoint_format_mismatch_fails_fast(tmp_path):
    """Writing one format over the other's artifact is an actionable
    error, not a corruption or an opaque OS error."""
    pytest.importorskip("orbax.checkpoint")
    cfg, mods, params, opts = _setup()
    fpath = str(tmp_path / "ckpt.pt")
    save_checkpoint(fpath, dict(step=1, best_dev_acc=0.1), params, opts)
    with pytest.raises(ValueError, match="msgpack checkpoint file"):
        save_checkpoint(fpath, dict(step=2, best_dev_acc=0.2), params,
                        opts, fmt="orbax")
    dpath = str(tmp_path / "ckpt.orbax")
    save_checkpoint(dpath, dict(step=1, best_dev_acc=0.1), params, opts,
                    fmt="orbax")
    from multimodalgame_tpu.utils.checkpoint import wait_for_checkpoints
    wait_for_checkpoints()
    with pytest.raises(ValueError, match="orbax checkpoint directory"):
        save_checkpoint(dpath, dict(step=2, best_dev_acc=0.2), params,
                        opts, fmt="msgpack")


def test_to_host_exact_mixed_dtypes():
    """The checkpoint fetch (_to_host = jax.device_get) pipelines the
    leaf transfers; the result must be bit-identical to a per-leaf
    np.asarray fetch — dtypes, shapes (incl. 0-d), and values — with
    host leaves passing through untouched."""
    from multimodalgame_tpu.utils.checkpoint import _to_host as fetch_tree

    rng = np.random.RandomState(3)
    tree = {
        "f32": jnp.asarray(rng.randn(3, 4), jnp.float32),
        "f32_scalar": jnp.asarray(np.float32(2.5)),
        "i32": jnp.asarray(rng.randint(-5, 9, size=(7,)), jnp.int32),
        "i32_count": jnp.asarray(17, jnp.int32),
        "bf16": jnp.asarray(rng.randn(2, 3), jnp.bfloat16),
        "nested": [jnp.arange(5, dtype=jnp.float32),
                   {"deep": jnp.ones((2, 2, 2), jnp.float32) * np.pi}],
        "host_np": np.arange(4, dtype=np.int64),
        "host_scalar": 1.25,
    }
    got = fetch_tree(tree)
    want = jax.tree_util.tree_map(lambda x: np.asarray(x), tree)
    assert (jax.tree_util.tree_structure(got)
            == jax.tree_util.tree_structure(want))
    for a, b in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(want)):
        assert np.asarray(a).dtype == np.asarray(b).dtype
        assert np.shape(a) == np.shape(b)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_to_host_empty_and_device_free():
    from multimodalgame_tpu.utils.checkpoint import _to_host
    assert _to_host({}) == {}
    out = _to_host({"a": 1, "b": np.zeros(2)})
    assert out["a"] == 1
    np.testing.assert_array_equal(out["b"], np.zeros(2))
