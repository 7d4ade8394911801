"""Cross-framework forward parity: our flax agents vs a torch oracle
re-deriving the reference math (tests/torch_oracle.py), with identical
weights moved through utils/torch_interop (VERDICT round-1 item #2).

This converts 'parity by construction' into 'parity by test' for the
Sender/Receiver heads, the baselines, and a full eval-mode exchange —
across all four presets and every sender_mix variant."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from multimodalgame_tpu.game.agents import AgentModules, init_params
from multimodalgame_tpu.game.config import GameConfig
from multimodalgame_tpu.game.exchange import exchange
from multimodalgame_tpu.utils.torch_interop import params_to_torch_state

from tests.torch_oracle import (OracleBaseline, OracleReceiver,

                                OracleSender, oracle_eval_exchange)

pytestmark = pytest.mark.slow  # see pytest.ini: `-m "not slow"` is the fast subset

BASE = dict(img_feat_dim=24, img_h_dim=12, sender_out_dim=10, rec_w_dim=10,
            rec_hidden=14, wv_dim=16, max_exchange=4, baseline_hid_dim=12,
            attn_dim=8, attn_context_dim=20, desc_attn_dim=6)

# Named like the reference presets (model.py:1605-1636); attention runs
# on (B, C, 8, 8) layer4_2-shaped features with fc context.
PRESETS = {
    "Fixed": dict(fixed_exchange=True),
    "Adaptive": dict(fixed_exchange=False),
    "FixedAttention": dict(fixed_exchange=True, visual_attn=True,
                           attn_extra_context=True),
    "AdaptiveAttention": dict(fixed_exchange=False, visual_attn=True,
                              attn_extra_context=True),
}

NUM_CLASSES = 5


def make_cfg(**kw):
    return GameConfig(**{**BASE, **kw})


def torchify(state):
    return {k: torch.from_numpy(np.ascontiguousarray(v).copy())
            for k, v in state.items()}


def build_pair(cfg, seed=0):
    """Our modules + params, and the torch oracle loaded with the SAME
    weights (converted through the interop layer)."""
    mods = AgentModules(cfg)
    params = init_params(mods, jax.random.PRNGKey(seed),
                         num_classes=NUM_CLASSES, max_words=6)
    state = params_to_torch_state(params)
    o_sen = OracleSender(cfg, cfg.img_feat_dim)
    o_sen.load_state_dict(torchify(state["sender"]))
    o_rec = OracleReceiver(cfg, NUM_CLASSES)
    o_rec.load_state_dict(torchify(state["receiver"]))
    o_bs = OracleBaseline(cfg.baseline_hid_dim, cfg.img_h_dim,
                          cfg.rec_w_dim, 0)
    o_bs.load_state_dict(torchify(state["baseline_sen"]))
    o_br = OracleBaseline(cfg.baseline_hid_dim, 0, cfg.rec_w_dim,
                          cfg.rec_hidden)
    o_br.load_state_dict(torchify(state["baseline_rec"]))
    for m in (o_sen, o_rec, o_bs, o_br):
        m.eval()
    return mods, params, o_sen, o_rec, o_bs, o_br


def rand_inputs(cfg, rng, batch=7):
    x = rng.randn(batch, cfg.img_feat_dim).astype(np.float32)
    if cfg.visual_attn:
        x = rng.randn(batch, cfg.img_feat_dim, 8, 8).astype(np.float32)
    g = (rng.randn(batch, cfg.attn_context_dim).astype(np.float32)
         if cfg.attn_extra_context else None)
    w = (rng.rand(batch, cfg.rec_w_dim) < 0.5).astype(np.float32)
    desc = rng.randn(NUM_CLASSES, cfg.wv_dim).astype(np.float32)
    return x, g, w, desc


@pytest.mark.parametrize("variant", [
    dict(),                                       # sum
    dict(sender_mix="prod"),
    dict(sender_mix="mou"),
    dict(sender_mix="mou", ignore_code=True),     # second code path
    dict(ignore_code=True),                       # binary(tanh(h_x))
    dict(visual_attn=True),                       # Xu-style attention
    dict(visual_attn=True, attn_extra_context=True),
])
def test_sender_forward_parity(variant):
    cfg = make_cfg(**variant)
    mods, params, o_sen, *_ = build_pair(cfg)
    rng = np.random.RandomState(1)
    x, g, w, _ = rand_inputs(cfg, rng)

    for t in (0, 2):  # first-step code bias vs query path
        logits, h_x, attn = mods.sender.apply(
            {"params": params["sender"]}, jnp.asarray(x), jnp.asarray(w),
            None if g is None else jnp.asarray(g), jnp.int32(t))
        with torch.no_grad():
            probs_t, attn_t = o_sen(torch.from_numpy(x),
                                    torch.from_numpy(w),
                                    None if g is None
                                    else torch.from_numpy(g), t)
        np.testing.assert_allclose(np.asarray(jax.nn.sigmoid(logits)),
                                   probs_t.numpy(), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(h_x), o_sen.h_x.numpy(),
                                   rtol=1e-5, atol=1e-6)
        if cfg.visual_attn:
            np.testing.assert_allclose(np.asarray(attn), attn_t.numpy(),
                                       rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("desc_attn", [False, True])
def test_receiver_forward_parity(desc_attn, synthetic_dataset):
    from multimodalgame_tpu.data.descriptions import load_descriptions
    cfg = make_cfg(desc_attn=desc_attn)
    mods, params, _, o_rec, *_ = build_pair(cfg)
    pack = load_descriptions(synthetic_dataset["descr"], "fake", cfg.wv_dim)
    assert pack.num_classes >= NUM_CLASSES
    # Trim to NUM_CLASSES so the same weights fit both frameworks.
    desc = pack.desc[:NUM_CLASSES]
    lens = pack.desc_set_lens[:NUM_CLASSES]
    desc_set = pack.desc_set[:sum(lens)]
    padded = pack.desc_set_padded[:NUM_CLASSES]
    pmask = pack.desc_set_mask[:NUM_CLASSES]

    rng = np.random.RandomState(2)
    batch = 7
    h_z = jnp.zeros((batch, cfg.rec_hidden), jnp.float32)
    o_rec.reset_state()
    for step in range(3):  # GRU chain + cumulative stop product
        z = (rng.rand(batch, cfg.sender_out_dim) < 0.5).astype(np.float32)
        h_z, s_logits, y, w_logits = mods.receiver.apply(
            {"params": params["receiver"]}, jnp.asarray(z), h_z,
            jnp.asarray(desc),
            jnp.asarray(padded) if desc_attn else None,
            jnp.asarray(pmask) if desc_attn else None)
        with torch.no_grad():
            (s_bin_t, s_prob_t), (w_bin_t, w_prob_t), y_t = o_rec(
                torch.from_numpy(z), torch.from_numpy(np.asarray(desc)),
                torch.from_numpy(np.asarray(desc_set)), lens)
        np.testing.assert_allclose(np.asarray(h_z), o_rec.h_z.numpy(),
                                   rtol=1e-5, atol=1e-6, err_msg=f"h_z@{step}")
        np.testing.assert_allclose(np.asarray(jax.nn.sigmoid(s_logits)),
                                   s_prob_t.numpy(), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(y), y_t.numpy(),
                                   rtol=1e-5, atol=2e-5, err_msg=f"y@{step}")
        np.testing.assert_allclose(np.asarray(jax.nn.sigmoid(w_logits)),
                                   w_prob_t.numpy(), rtol=1e-5, atol=1e-6)


def test_baseline_parity():
    cfg = make_cfg()
    mods, params, _, _, o_bs, o_br = build_pair(cfg)
    rng = np.random.RandomState(3)
    h_x = rng.randn(7, cfg.img_h_dim).astype(np.float32)
    z_r = (rng.rand(7, cfg.rec_w_dim) < 0.5).astype(np.float32)
    h_z = rng.randn(7, cfg.rec_hidden).astype(np.float32)

    ours = mods.baseline_sen.apply({"params": params["baseline_sen"]},
                                   jnp.asarray(h_x), jnp.asarray(z_r), None)
    with torch.no_grad():
        theirs = o_bs(torch.from_numpy(h_x), torch.from_numpy(z_r), None)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                               rtol=1e-5, atol=1e-6)

    ours = mods.baseline_rec.apply({"params": params["baseline_rec"]},
                                   None, jnp.asarray(z_r), jnp.asarray(h_z))
    with torch.no_grad():
        theirs = o_br(None, torch.from_numpy(z_r), torch.from_numpy(h_z))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("preset", sorted(PRESETS))
def test_eval_exchange_parity(preset):
    """Full eval-mode conversation: every probability, message, stop bit,
    prediction row, and the break_early step count match the reference
    loop (model.py:725-876) bit-for-bit in f32."""
    cfg = make_cfg(**PRESETS[preset])
    mods, params, o_sen, o_rec, *_ = build_pair(cfg)
    rng = np.random.RandomState(4)
    x, g, _, desc = rand_inputs(cfg, rng)

    ex = exchange(mods, params, jnp.asarray(x), jnp.asarray(desc),
                  jax.random.PRNGKey(0), train=False,
                  data_context=None if g is None else jnp.asarray(g))
    rec = oracle_eval_exchange(
        o_sen, o_rec, cfg, torch.from_numpy(x),
        torch.from_numpy(desc), cfg.max_exchange,
        data_context=None if g is None else torch.from_numpy(g),
        break_early=not cfg.fixed_exchange)

    n = int(ex.n_steps)
    assert n == len(rec["sen_feats"])
    for t in range(n):
        for ours, theirs in (
                (ex.sen_probs[t], rec["sen_probs"][t]),
                (ex.sen_feats[t], rec["sen_feats"][t]),
                (ex.rec_probs[t], rec["rec_probs"][t]),
                (ex.rec_feats[t], rec["rec_feats"][t]),
                (ex.stop_probs[t], rec["stop_prob"][t]),
                (ex.stop_feats[t], rec["stop_feat"][t]),
                (ex.y[t], rec["y"][t])):
            np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                                       rtol=1e-5, atol=2e-5,
                                       err_msg=f"{preset} step {t}")
    # Mask chain parity under the reference's final-forced-zero rule
    # (model.py:870), via the same slicing eval_dev uses.
    from multimodalgame_tpu.eval import sliced_masks
    ours_masks = sliced_masks(np.asarray(ex.stop_masks), n)
    for t in range(n + 1):
        np.testing.assert_array_equal(ours_masks[t],
                                      rec["stop_mask"][t].numpy())


def test_eval_exchange_parity_with_corruption():
    """Adversarial bit flipping happens at the same point in both loops
    (model.py:814-820)."""
    from multimodalgame_tpu.game.masks import build_mask
    cfg = make_cfg(fixed_exchange=False)
    mods, params, o_sen, o_rec, *_ = build_pair(cfg)
    rng = np.random.RandomState(5)
    x, g, _, desc = rand_inputs(cfg, rng)
    cmask = build_mask("0:3,5", cfg.rec_w_dim)

    ex = exchange(mods, params, jnp.asarray(x), jnp.asarray(desc),
                  jax.random.PRNGKey(0), train=False,
                  corrupt_mask=jnp.asarray(cmask))
    rec = oracle_eval_exchange(
        o_sen, o_rec, cfg, torch.from_numpy(x), torch.from_numpy(desc),
        cfg.max_exchange, break_early=True,
        corrupt_mask=torch.from_numpy(np.asarray(cmask, np.float32)))
    n = int(ex.n_steps)
    assert n == len(rec["sen_feats"])
    for t in range(n):
        np.testing.assert_array_equal(np.asarray(ex.sen_feats[t]),
                                      rec["sen_feats"][t].numpy())
        np.testing.assert_allclose(np.asarray(ex.y[t]),
                                   rec["y"][t].numpy(), rtol=1e-5,
                                   atol=2e-5)
