"""Torch checkpoint interop + profiling subsystem tests."""

import os
import time

import jax
import numpy as np
import pytest

from multimodalgame_tpu.game.agents import AgentModules, init_params
from multimodalgame_tpu.game.config import GameConfig
from multimodalgame_tpu.utils.profiling import StepTimer, trace
from multimodalgame_tpu.utils.torch_interop import (
    load_reference_checkpoint, params_from_torch_state,
    params_to_torch_state, save_reference_checkpoint)


def _params(**kw):
    cfg = GameConfig(img_feat_dim=16, img_h_dim=8, sender_out_dim=4,
                     rec_w_dim=4, rec_hidden=8, wv_dim=6, max_exchange=2,
                     baseline_hid_dim=8, **kw)
    mods = AgentModules(cfg)
    return cfg, mods, init_params(mods, jax.random.PRNGKey(0),
                                  num_classes=3)


def _leaves_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_state_roundtrip():
    _, _, params = _params()
    state = params_to_torch_state(params)
    # torch layout sanity: Linear weight is (out, in).
    w = state["sender"]["image_layer.weight"]
    assert w.shape == (8, 16)
    assert state["receiver"]["rnn.weight_ih"].shape == (24, 4)  # (3H, in)
    assert state["receiver"]["y1.weight"].shape == (8, 8 + 6)
    # Round-trip through a zeroed template restores every tensor.
    zeroed = jax.tree_util.tree_map(lambda x: np.zeros_like(x), params)
    restored = params_from_torch_state(zeroed, state)
    _leaves_equal(params, restored)


def test_attention_variant_roundtrip():
    _, _, params = _params(visual_attn=True, desc_attn=True,
                           attn_extra_context=True, attn_context_dim=10)
    state = params_to_torch_state(params)
    assert "attn_W_x.weight" in state["sender"]
    assert "d_attn.weight" in state["receiver"]
    zeroed = jax.tree_util.tree_map(lambda x: np.zeros_like(x), params)
    _leaves_equal(params, params_from_torch_state(zeroed, state))


def test_pt_file_roundtrip(tmp_path):
    pytest.importorskip("torch")
    _, _, params = _params()
    path = str(tmp_path / "ref.pt")
    save_reference_checkpoint(path, dict(step=7, best_dev_acc=0.5), params)
    zeroed = jax.tree_util.tree_map(lambda x: np.zeros_like(x), params)
    data, restored = load_reference_checkpoint(path, zeroed)
    assert data["step"] == 7
    assert data["best_dev_acc"] == 0.5
    _leaves_equal(params, restored)


def test_step_timer():
    t = StepTimer()
    for _ in range(3):
        with t:
            time.sleep(0.002)
    s = t.summary()
    assert s["steps"] == 3
    assert s["mean_ms"] >= 2.0
    assert s["steps_per_sec"] > 0
    t.reset()
    assert t.summary() == {}


def test_trace_noop_and_real(tmp_path, monkeypatch):
    monkeypatch.delenv("MMG_PROFILE_DIR", raising=False)
    with trace():  # no-op without a dir
        pass
    d = str(tmp_path / "prof")
    with trace(d):
        import jax.numpy as jnp
        jnp.ones(8).sum().block_until_ready()
    assert os.path.isdir(d)
