"""Fast batched-gradient path vs the reference scan path.

Same PRNG key -> same sampled bits -> the recomputed probabilities and
every loss/gradient must agree to fp tolerance (game/fast_train.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalgame_tpu.game.agents import AgentModules, init_params
from multimodalgame_tpu.game.config import GameConfig
from multimodalgame_tpu.game.fast_train import (compute_losses_fast,
                                                supports_fast)
from multimodalgame_tpu.game.train import compute_losses

pytestmark = pytest.mark.slow  # see pytest.ini: `-m "not slow"` is the fast subset


B, D, FEAT, W, HID, WV, T = 6, 5, 32, 8, 16, 12, 4


def _setup(**kw):
    base = dict(img_feat_dim=FEAT, img_h_dim=16, sender_out_dim=W,
                rec_w_dim=W, rec_hidden=HID, wv_dim=WV, max_exchange=T,
                baseline_hid_dim=16, fixed_exchange=False,
                entropy_s=0.08, entropy_sen=0.01, entropy_rec=0.01)
    base.update(kw)
    cfg = GameConfig(**base)
    mods = AgentModules(cfg)
    params = init_params(mods, jax.random.PRNGKey(0), num_classes=D,
                         max_words=4)
    rng = np.random.RandomState(0)
    if cfg.visual_attn:
        data = jnp.asarray(rng.randn(B, FEAT, 4, 4), jnp.float32)
    else:
        data = jnp.asarray(rng.randn(B, FEAT), jnp.float32)
    desc = jnp.asarray(rng.randn(D, WV), jnp.float32)
    target = jnp.asarray(rng.randint(0, D, size=B))
    kwargs = {}
    if cfg.desc_attn:
        kwargs["desc_set_padded"] = jnp.asarray(
            rng.randn(D, 4, WV), jnp.float32)
        kwargs["desc_set_mask"] = jnp.asarray(
            (rng.rand(D, 4) < 0.8), jnp.float32).at[:, 0].set(1.0)
    if cfg.attn_extra_context:
        kwargs["data_context"] = jnp.asarray(rng.randn(B, 10), jnp.float32)
    return cfg, mods, params, data, desc, target, kwargs


VARIANTS = [dict(), dict(fixed_exchange=True), dict(sender_mix="prod"),
            dict(sender_mix="mou"), dict(ignore_code=True),
            dict(ignore_receiver=True), dict(use_binary=False),
            dict(flipout_sen=0.1, flipout_rec=0.1), dict(max_exchange=1),
            dict(visual_attn=True),
            dict(visual_attn=True, attn_extra_context=True,
                 attn_context_dim=10),
            dict(desc_attn=True, desc_attn_dim=8)]


@pytest.mark.parametrize("kw", VARIANTS,
                         ids=[str(sorted(v.items())) for v in VARIANTS])
def test_losses_and_grads_match(kw):
    cfg, mods, params, data, desc, target, kwargs = _setup(**kw)
    assert supports_fast(cfg)
    key = jax.random.PRNGKey(3)

    def ref(p):
        return compute_losses(mods, p, data, target, desc, key,
                              kwargs.get("desc_set_padded"),
                              kwargs.get("desc_set_mask"),
                              kwargs.get("data_context"), 2, B)

    def fast(p):
        return compute_losses_fast(mods, p, data, target, desc, key, 2, B,
                                   **kwargs)

    (l_ref, m_ref), g_ref = jax.value_and_grad(ref, has_aux=True)(params)
    (l_fast, m_fast), g_fast = jax.value_and_grad(fast, has_aux=True)(params)

    np.testing.assert_allclose(float(l_ref), float(l_fast), rtol=1e-5,
                               atol=1e-6)
    for field in ("loss_rec", "loss_sen", "nll_loss", "loss_bas_rec",
                  "loss_bas_sen", "accuracy"):
        np.testing.assert_allclose(
            float(getattr(m_ref, field)), float(getattr(m_fast, field)),
            rtol=1e-5, atol=1e-6, err_msg=field)
    # Conversation record identical (bits are shared; probs recomputed).
    np.testing.assert_array_equal(np.asarray(m_ref.exchange.sen_feats),
                                  np.asarray(m_fast.exchange.sen_feats))
    np.testing.assert_allclose(np.asarray(m_ref.exchange.rec_probs),
                               np.asarray(m_fast.exchange.rec_probs),
                               atol=1e-6)
    # Gradients agree tree-wide.
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_ref),
            jax.tree_util.tree_leaves_with_path(g_fast)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6,
            err_msg=jax.tree_util.keystr(pa))


def test_all_configs_supported():
    assert supports_fast(GameConfig(visual_attn=True))
    assert supports_fast(GameConfig(desc_attn=True))
