"""Fused Pallas eval-exchange kernel vs the lax.scan reference path.

Eval mode is deterministic, so outputs must agree bit-for-bit in the
binary features and to fp tolerance in the probabilities. Runs in Pallas
interpret mode on the CPU test platform; the same kernel compiles for TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalgame_tpu.game.agents import AgentModules, init_params
from multimodalgame_tpu.game.config import GameConfig
from multimodalgame_tpu.game.exchange import exchange
from multimodalgame_tpu.game.masks import build_mask
from multimodalgame_tpu.ops.pallas_exchange import (fused_eval_exchange,

                                                    supports_config)

pytestmark = pytest.mark.slow  # see pytest.ini: `-m "not slow"` is the fast subset

B, D, FEAT, W, HID, WV, T = 8, 5, 64, 16, 32, 24, 4


def _setup(**kw):
    base = dict(img_feat_dim=FEAT, img_h_dim=32, sender_out_dim=W,
                rec_w_dim=W, rec_hidden=HID, wv_dim=WV, max_exchange=T,
                baseline_hid_dim=16, fixed_exchange=False)
    base.update(kw)
    cfg = GameConfig(**base)
    mods = AgentModules(cfg)
    params = init_params(mods, jax.random.PRNGKey(0), num_classes=D)
    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.randn(B, FEAT), jnp.float32)
    desc = jnp.asarray(rng.randn(D, WV), jnp.float32)
    return cfg, mods, params, data, desc


def _compare(cfg, mods, params, data, desc, corrupt=None):
    ref = exchange(mods, params, data, desc, jax.random.PRNGKey(1),
                   train=False, corrupt_mask=corrupt)
    fused = fused_eval_exchange(cfg, params, data, desc,
                                corrupt_mask=corrupt, interpret=True)
    np.testing.assert_array_equal(np.asarray(fused.sen_feats),
                                  np.asarray(ref.sen_feats))
    np.testing.assert_array_equal(np.asarray(fused.rec_feats),
                                  np.asarray(ref.rec_feats))
    np.testing.assert_array_equal(np.asarray(fused.stop_feats),
                                  np.asarray(ref.stop_feats))
    # ref.stop_masks[-1] is forced to zero (model.py:870); compare the
    # unforced prefix of the chain.
    np.testing.assert_array_equal(np.asarray(fused.masks[:-1]),
                                  np.asarray(ref.stop_masks[1:-1]),
                                  err_msg="pre-force mask chain")
    np.testing.assert_allclose(np.asarray(fused.sen_probs),
                               np.asarray(ref.sen_probs), atol=1e-5)
    np.testing.assert_allclose(np.asarray(fused.rec_probs),
                               np.asarray(ref.rec_probs), atol=1e-5)
    np.testing.assert_allclose(np.asarray(fused.stop_probs),
                               np.asarray(ref.stop_probs), atol=1e-5)
    np.testing.assert_allclose(np.asarray(fused.y), np.asarray(ref.y),
                               atol=1e-4)


def test_matches_scan_adaptive():
    cfg, mods, params, data, desc = _setup()
    assert supports_config(cfg)
    _compare(cfg, mods, params, data, desc)


def test_matches_scan_fixed_and_variants():
    for kw in (dict(fixed_exchange=True),
               dict(sender_mix="prod"),
               dict(ignore_code=True),
               dict(ignore_receiver=True),
               dict(s_prob_prod=False),
               dict(first_rec=1.0)):
        cfg, mods, params, data, desc = _setup(**kw)
        assert supports_config(cfg), kw
        _compare(cfg, mods, params, data, desc)


def test_matches_scan_with_corruption():
    cfg, mods, params, data, desc = _setup()
    corrupt = jnp.asarray(build_mask("0:3,7", W))
    _compare(cfg, mods, params, data, desc, corrupt=corrupt)


def test_unsupported_configs_rejected():
    for kw in (dict(visual_attn=True), dict(desc_attn=True),
               dict(use_binary=False), dict(sender_mix="mou")):
        cfg = GameConfig(img_feat_dim=FEAT, sender_out_dim=W, rec_w_dim=W,
                         **kw)
        assert not supports_config(cfg)
