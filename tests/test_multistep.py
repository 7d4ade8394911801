"""Device-side multi-step trainer (make_multistep_train_step)."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodalgame_tpu.game.agents import AgentModules, init_params
from multimodalgame_tpu.game.config import GameConfig
from multimodalgame_tpu.game.train import (init_opt_states,
                                           make_multistep_train_step,
                                           make_train_step)
import pytest

pytestmark = pytest.mark.slow  # see pytest.ini: `-m "not slow"` is the fast subset

K, B, D = 3, 4, 4


def _data(cfg, rng):
    if cfg.visual_attn:
        data = jnp.asarray(rng.randn(K, B, 32, 4, 4), jnp.float32)
    else:
        data = jnp.asarray(rng.randn(K, B, 32), jnp.float32)
    target = jnp.asarray(rng.randint(0, D, size=(K, B)))
    desc = jnp.asarray(rng.randn(D, 12), jnp.float32)
    return data, target, desc


def test_chunk_equals_sequential_steps():
    """K fused updates must equal K sequential single-step updates."""
    cfg = GameConfig(img_feat_dim=32, img_h_dim=16, sender_out_dim=8,
                     rec_w_dim=8, rec_hidden=16, wv_dim=12, max_exchange=2,
                     baseline_hid_dim=16, fixed_exchange=False,
                     entropy_s=0.08, entropy_sen=0.01, entropy_rec=0.01)
    mods = AgentModules(cfg)
    params = init_params(mods, jax.random.PRNGKey(0), num_classes=D)
    opts = init_opt_states(cfg, params)
    rng = np.random.RandomState(0)
    data, target, desc = _data(cfg, rng)
    keys = jax.random.split(jax.random.PRNGKey(1), K)

    chunk = make_multistep_train_step(mods, 2, B)
    pc, oc, mc = chunk(
        jax.tree_util.tree_map(lambda x: x.copy(), params),
        jax.tree_util.tree_map(lambda x: x.copy(), opts),
        data, target, desc, keys)

    step = make_train_step(mods, 2, B)
    ps, os_ = params, opts
    losses = []
    for i in range(K):
        ps, os_, m = step(ps, os_, data[i], target[i], desc, keys[i])
        losses.append(float(m.loss_rec))

    np.testing.assert_allclose(np.asarray(mc.loss_rec), losses, rtol=2e-5,
                               atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(pc),
                    jax.tree_util.tree_leaves(ps)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


def test_chunk_with_attention_inputs():
    """Attention configs chunk too (per-step data_context stacks)."""
    cfg = GameConfig(img_feat_dim=32, img_h_dim=16, sender_out_dim=8,
                     rec_w_dim=8, rec_hidden=16, wv_dim=12, max_exchange=2,
                     baseline_hid_dim=16, visual_attn=True, attn_dim=8,
                     attn_extra_context=True, attn_context_dim=10,
                     fixed_exchange=True)
    mods = AgentModules(cfg)
    params = init_params(mods, jax.random.PRNGKey(0), num_classes=D)
    opts = init_opt_states(cfg, params)
    rng = np.random.RandomState(0)
    data, target, desc = _data(cfg, rng)
    ctx = jnp.asarray(rng.randn(K, B, 10), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(1), K)
    chunk = make_multistep_train_step(mods, 2, B)
    p, o, m = chunk(params, opts, data, target, desc, keys,
                    data_context=ctx)
    assert m.loss_rec.shape == (K,)
    assert np.isfinite(np.asarray(m.loss_rec)).all()
