"""Cross-framework TRAINING-step parity (VERDICT round-2 item #1).

The strongest accuracy-parity evidence obtainable without real data: a
torch re-derivation of the reference's full training step — losses
(model.py:879-988), loss assembly (model.py:1247-1305), and the four
backward/clip(1.0)/step updates (model.py:1307-1330) with torch
RMSprop/Adam/SGD — fed the *identical recorded bit traces* (z, w, s)
that a JAX training exchange sampled, at identical interop-converted
weights, all in float64.

Because sampled bits cross the channel as constants in both frameworks,
identical traces make every downstream quantity deterministic and
comparable: per-loss scalars, per-agent gradients, and per-agent
post-update parameter deltas must agree to ~1e-9 relative. This converts
'parity by construction' into 'parity by test' for the part of the
framework that actually determines learning.

Covered: all four reference presets x {RMSprop, Adam, SGD}, plus
description attention and the mou sender mix (RMSprop).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from multimodalgame_tpu.game.agents import AgentModules, init_params
from multimodalgame_tpu.game.config import GameConfig
from multimodalgame_tpu.game.train import (compute_losses, init_opt_states,
                                           make_train_step)
from multimodalgame_tpu.utils.torch_interop import params_to_torch_state

from tests.torch_oracle import (OracleBaseline, OracleReceiver, OracleSender,

                                build_torch_optimizers, optax_style_clip_,
                                oracle_apply_updates, oracle_losses,
                                oracle_train_exchange)

pytestmark = pytest.mark.slow  # see pytest.ini: `-m "not slow"` is the fast subset

BASE = dict(img_feat_dim=24, img_h_dim=12, sender_out_dim=10, rec_w_dim=10,
            rec_hidden=14, wv_dim=16, max_exchange=4, baseline_hid_dim=12,
            attn_dim=8, attn_context_dim=20, desc_attn_dim=6,
            entropy_s=0.08, entropy_sen=0.01, entropy_rec=0.01,
            learning_rate=1e-3)

PRESETS = {
    "Fixed": dict(fixed_exchange=True),
    "Adaptive": dict(fixed_exchange=False),
    "FixedAttention": dict(fixed_exchange=True, visual_attn=True,
                           attn_extra_context=True),
    "AdaptiveAttention": dict(fixed_exchange=False, visual_attn=True,
                              attn_extra_context=True),
}
OPTIMS = ("RMSprop", "Adam", "SGD")
NUM_CLASSES = 5
BATCH = 6
AGENTS = ("sender", "receiver", "baseline_sen", "baseline_rec")


def f64(tree):
    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float64)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x, tree)


def torchify64(state):
    return {k: torch.from_numpy(np.array(v, np.float64, copy=True))
            for k, v in state.items()}


def build_torch_modules(cfg, state):
    """Oracle modules at float64 loaded with interop-converted weights.
    ``.double()`` BEFORE ``load_state_dict`` so no f32 round-trip."""
    mods = {
        "sender": OracleSender(cfg, cfg.img_feat_dim),
        "receiver": OracleReceiver(cfg, NUM_CLASSES),
        "baseline_sen": OracleBaseline(cfg.baseline_hid_dim, cfg.img_h_dim,
                                       cfg.rec_w_dim, 0),
        "baseline_rec": OracleBaseline(cfg.baseline_hid_dim, 0,
                                       cfg.rec_w_dim, cfg.rec_hidden),
    }
    for name, m in mods.items():
        m.double()
        m.load_state_dict(torchify64(state[name]))
        m.train()
    return mods


def run_case(cfg, desc_pack=None):
    """Run one f64 training step in both frameworks off the same traces
    and assert losses, gradients, and update deltas match."""
    with jax.enable_x64(True):
        mods = AgentModules(cfg)
        params = f64(init_params(mods, jax.random.PRNGKey(0),
                                 num_classes=NUM_CLASSES, max_words=6))
        params_np = jax.tree_util.tree_map(np.asarray, params)
        opts = init_opt_states(cfg, params)

        rng = np.random.RandomState(11)
        if cfg.visual_attn:
            data = rng.randn(BATCH, cfg.img_feat_dim, 8, 8)
        else:
            data = rng.randn(BATCH, cfg.img_feat_dim)
        ctx = (rng.randn(BATCH, cfg.attn_context_dim)
               if cfg.attn_extra_context else None)
        target = rng.randint(0, NUM_CLASSES, size=BATCH)
        if desc_pack is None:
            desc = rng.randn(NUM_CLASSES, cfg.wv_dim)
            padded = pmask = desc_set = lens = None
        else:
            desc, padded, pmask, desc_set, lens = desc_pack

        j = lambda x: None if x is None else jnp.asarray(x, jnp.float64)
        key = jax.random.PRNGKey(42)

        # --- JAX: losses + per-agent grads (one pass), then the real
        # jitted update step with the same key (identical exchange). ---
        def loss_fn(p):
            return compute_losses(mods, p, j(data), jnp.asarray(target),
                                  j(desc), key, j(padded), j(pmask),
                                  j(ctx), 2, BATCH)

        (_, m), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        grads_np = jax.tree_util.tree_map(np.asarray, grads)

        step = make_train_step(mods, top_k=2, batch_denom=BATCH, fast=False)
        new_params, _, _ = step(f64(params_np), opts, j(data),
                                jnp.asarray(target), j(desc), key,
                                desc_set_padded=j(padded),
                                desc_set_mask=j(pmask), data_context=j(ctx))
        new_np = jax.tree_util.tree_map(np.asarray, new_params)

        n = int(m.exchange.n_steps)
        traces = {"z": np.asarray(m.exchange.sen_feats),
                  "w": np.asarray(m.exchange.rec_feats),
                  "s": np.asarray(m.exchange.stop_feats)}

    # --- Torch oracle: replay the traces, rebuild the reference's
    # training step end to end. ---
    state0 = params_to_torch_state(params_np)
    tmods = build_torch_modules(cfg, state0)
    t = lambda x: None if x is None else torch.as_tensor(
        np.asarray(x, np.float64))
    rec = oracle_train_exchange(
        tmods["sender"], tmods["receiver"], tmods["baseline_sen"],
        tmods["baseline_rec"], cfg, t(data), t(desc), traces,
        data_context=t(ctx), desc_set=t(desc_set), desc_set_lens=lens)
    assert len(rec["sen_feats"]) == n, "break_early step count differs"

    # Sanity: the replayed forward reproduces the traced probabilities.
    for i in range(n):
        np.testing.assert_allclose(
            rec["sen_probs"][i].detach().numpy(),
            np.asarray(m.exchange.sen_probs[i]), rtol=1e-9, atol=1e-12)

    losses_t = oracle_losses(cfg, rec, torch.as_tensor(target))

    # --- Loss scalars ---
    for ours, theirs in (
            (m.nll_loss, losses_t["nll"]),
            (m.loss_rec, losses_t["loss_rec"]),
            (m.loss_sen, losses_t["loss_sen"]),
            (m.loss_binary_rec, losses_t["loss_binary_rec"]),
            (m.loss_binary_s, losses_t["loss_binary_s"]),
            (m.loss_bas_rec, losses_t["loss_bas_rec"]),
            (m.loss_bas_sen, losses_t["loss_bas_sen"])):
        np.testing.assert_allclose(float(ours), float(theirs.detach()),
                                   rtol=1e-9, atol=1e-12)

    # --- Per-agent gradients, then clip + torch-optimizer step ---
    g_state = params_to_torch_state(grads_np)  # grads share the tree layout
    optimizers = build_torch_optimizers(cfg, tmods)
    plan = [("receiver", losses_t["loss_rec"]),
            ("sender", losses_t["loss_sen"]),
            ("baseline_rec", losses_t["loss_bas_rec"]),
            ("baseline_sen", losses_t["loss_bas_sen"])]
    for name, loss in plan:
        optimizers[name].zero_grad()
        loss.backward(retain_graph=True)
        for pname, p in tmods[name].named_parameters():
            grad = (p.grad.detach().numpy() if p.grad is not None
                    else np.zeros(p.shape))
            np.testing.assert_allclose(
                grad, g_state[name][pname], rtol=1e-9, atol=1e-12,
                err_msg=f"grad {name}.{pname}")
        optax_style_clip_(tmods[name].parameters(), 1.0)
        optimizers[name].step()

    # --- Post-update parameter deltas ---
    # atol floor: parameters with analytically-zero gradients (e.g.
    # y2.bias under log_softmax) carry ~1e-16 f64 rounding noise that
    # RMSprop/Adam amplify by up to lr/eps = 1e5 into ~1e-11 deltas.
    new_state = params_to_torch_state(new_np)
    for name in AGENTS:
        for pname, p in tmods[name].named_parameters():
            ours = new_state[name][pname] - state0[name][pname]
            theirs = p.detach().numpy() - state0[name][pname]
            np.testing.assert_allclose(
                ours, theirs, rtol=1e-8, atol=3e-11,
                err_msg=f"update delta {name}.{pname}")


@pytest.mark.parametrize("optim", OPTIMS)
@pytest.mark.parametrize("preset", sorted(PRESETS))
def test_train_step_parity(preset, optim):
    cfg = GameConfig(**{**BASE, **PRESETS[preset]}, optim_type=optim)
    run_case(cfg)


def test_train_step_parity_desc_attn(synthetic_dataset):
    from multimodalgame_tpu.data.descriptions import load_descriptions
    cfg = GameConfig(**BASE, fixed_exchange=False, desc_attn=True)
    pack = load_descriptions(synthetic_dataset["descr"], "fake",
                             cfg.wv_dim)
    lens = pack.desc_set_lens[:NUM_CLASSES]
    desc_pack = (pack.desc[:NUM_CLASSES],
                 pack.desc_set_padded[:NUM_CLASSES],
                 pack.desc_set_mask[:NUM_CLASSES],
                 pack.desc_set[:sum(lens)], lens)
    run_case(cfg, desc_pack=desc_pack)


def test_train_step_parity_mou():
    cfg = GameConfig(**{**BASE, **PRESETS["Adaptive"]}, sender_mix="mou")
    run_case(cfg)


@pytest.mark.parametrize("optim", OPTIMS)
def test_train_trajectory_parity(optim):
    """Multi-step f64 trajectory parity (beyond the single-step cases
    above): three consecutive optimizer steps with per-step bit-trace
    injection. This pins the *accumulator evolution* — torch RMSprop's
    square_avg / Adam's moments and bias correction at steps 2-3 — not
    just fresh-state updates."""
    cfg = GameConfig(**{**BASE, **PRESETS["Adaptive"]}, optim_type=optim)
    n_steps = 3

    with jax.enable_x64(True):
        mods = AgentModules(cfg)
        params = f64(init_params(mods, jax.random.PRNGKey(0),
                                 num_classes=NUM_CLASSES, max_words=6))
        params_np = jax.tree_util.tree_map(np.asarray, params)
        params0_np = params_np
        opts = init_opt_states(cfg, params)

        rng = np.random.RandomState(17)
        data = rng.randn(BATCH, cfg.img_feat_dim)
        target = rng.randint(0, NUM_CLASSES, size=BATCH)
        desc = rng.randn(NUM_CLASSES, cfg.wv_dim)
        j = lambda x: jnp.asarray(x, jnp.float64)

        step = make_train_step(mods, top_k=2, batch_denom=BATCH,
                               fast=False)
        key = jax.random.PRNGKey(7)
        jax_params_per_step = []
        traces_per_step = []
        for i in range(n_steps):
            key, sub = jax.random.split(key)
            params, opts, m = step(f64(params_np), opts, j(data),
                                   jnp.asarray(target), j(desc), sub)
            params_np = jax.tree_util.tree_map(np.asarray, params)
            jax_params_per_step.append(params_np)
            traces_per_step.append({
                "z": np.asarray(m.exchange.sen_feats),
                "w": np.asarray(m.exchange.rec_feats),
                "s": np.asarray(m.exchange.stop_feats)})

    # Torch: the exact same initial weights, optimizers persist across
    # steps.
    state0 = params_to_torch_state(params0_np)
    tmods = build_torch_modules(cfg, state0)
    optimizers = build_torch_optimizers(cfg, tmods)
    t = lambda x: torch.as_tensor(np.asarray(x, np.float64))
    for i in range(n_steps):
        rec = oracle_train_exchange(
            tmods["sender"], tmods["receiver"], tmods["baseline_sen"],
            tmods["baseline_rec"], cfg, t(data), t(desc),
            traces_per_step[i])
        losses_t = oracle_losses(cfg, rec, torch.as_tensor(target))
        oracle_apply_updates(losses_t, tmods, optimizers)
        want = params_to_torch_state(jax_params_per_step[i])
        for name in AGENTS:
            for pname, p in tmods[name].named_parameters():
                np.testing.assert_allclose(
                    p.detach().numpy(), want[name][pname],
                    rtol=1e-8, atol=1e-10,
                    err_msg=f"step {i} {name}.{pname}")
