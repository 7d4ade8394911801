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


@pytest.mark.parametrize("optim", ["RMSprop", "Adam", "SGD"])
def test_optimizer_state_roundtrip(tmp_path, optim):
    """Optimizer accumulators survive the .pt round trip for every
    supported optimizer (VERDICT round-1 item #9; reference restores all
    4 optimizer state_dicts, misc.py:78-92)."""
    import jax.numpy as jnp
    from multimodalgame_tpu.game.train import (build_optimizer,
                                               init_opt_states)

    cfg, mods, params = _params(optim_type=optim, learning_rate=1e-3)
    opts = init_opt_states(cfg, params)
    # A few real updates so the accumulators are non-trivial.
    tx = build_optimizer(cfg)
    rng = np.random.RandomState(0)
    for _ in range(3):
        grads = jax.tree_util.tree_map(
            lambda x: jnp.asarray(rng.randn(*np.shape(x)) * 0.1,
                                  jnp.float32), params)
        for name in params:
            upd, opts[name] = tx.update(grads[name], opts[name],
                                        params[name])

    path = str(tmp_path / "full.pt")
    save_reference_checkpoint(path, dict(step=3, best_dev_acc=0.1),
                              params, opts, optim_type=optim)
    fresh = init_opt_states(cfg, params)
    data, p2, opts2 = load_reference_checkpoint(path, params, fresh,
                                                optim_type=optim)
    _leaves_equal(params, p2)
    for name in params:
        _leaves_equal(opts[name], opts2[name])


def test_rmsprop_trajectory_continuation(tmp_path):
    """Resuming from a torch-written mid-training checkpoint reproduces
    torch's next update: train a torch module with torch.optim.RMSprop,
    save the reference layout, load here, apply one more identical
    gradient in both frameworks, and compare parameters."""
    import torch
    from multimodalgame_tpu.game.train import (build_optimizer,
                                               init_opt_states)
    from tests.torch_oracle import OracleBaseline

    cfg, mods, params = _params(optim_type="RMSprop", learning_rate=1e-2)
    # Torch side: same weights (baseline_rec: x_dim=0, inp=rec_hidden).
    o = OracleBaseline(cfg.baseline_hid_dim, 0, cfg.rec_w_dim,
                       cfg.rec_hidden)
    from multimodalgame_tpu.utils.torch_interop import (
        opt_state_from_torch)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v).copy())
          for k, v in params_to_torch_state(params)[
              "baseline_rec"].items()}
    o.load_state_dict(sd)
    opt = torch.optim.RMSprop(o.parameters(), lr=1e-2, alpha=0.99,
                              eps=1e-8)

    rng = np.random.RandomState(1)
    z = torch.from_numpy(rng.randn(5, cfg.rec_w_dim).astype(np.float32))
    h = torch.from_numpy(rng.randn(5, cfg.rec_hidden).astype(np.float32))
    for _ in range(4):  # accumulate real square_avg state in torch
        opt.zero_grad()
        (o(None, z, h) ** 2).mean().backward()
        torch.nn.utils.clip_grad_norm_(o.parameters(), 1.0)
        opt.step()

    # Convert torch's state into optax and step both with one more
    # identical gradient.
    import jax.numpy as jnp
    import optax
    opt.zero_grad()
    (o(None, z, h) ** 2).mean().backward()
    named = dict(o.named_parameters())
    opts = init_opt_states(cfg, params)
    tsd = opt.state_dict()
    tsd_np = {"state": {k: {kk: vv.numpy() for kk, vv in v.items()}
                        for k, v in tsd["state"].items()},
              "param_groups": tsd["param_groups"]}
    br = opt_state_from_torch("baseline_rec", params["baseline_rec"],
                              opts["baseline_rec"], tsd_np, "RMSprop")

    g_ours = {
        "linear1": {"kernel": jnp.asarray(named["linear1.weight"]
                                          .grad.numpy().T),
                    "bias": jnp.asarray(named["linear1.bias"]
                                        .grad.numpy())},
        "linear2": {"kernel": jnp.asarray(named["linear2.weight"]
                                          .grad.numpy().T),
                    "bias": jnp.asarray(named["linear2.bias"]
                                        .grad.numpy())},
    }
    # A real resume also loads torch's CURRENT weights, not the init.
    p_now = params_from_torch_state(
        params, {"baseline_rec": {k: v.detach().numpy()
                                  for k, v in named.items()}})
    tx = build_optimizer(cfg)
    upd, _ = tx.update(g_ours, br, p_now["baseline_rec"])
    ours_next = optax.apply_updates(p_now["baseline_rec"], upd)

    torch.nn.utils.clip_grad_norm_(o.parameters(), 1.0)
    opt.step()
    np.testing.assert_allclose(
        np.asarray(ours_next["linear1"]["kernel"]),
        named["linear1.weight"].detach().numpy().T, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(ours_next["linear2"]["bias"]),
        named["linear2.bias"].detach().numpy(), rtol=1e-5, atol=1e-7)
