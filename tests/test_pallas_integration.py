"""The pallas-backed make_eval_exchange must agree with the scan-backed
one on the full ExchangeOutputs contract (interpret-free: on the CPU test
platform the Pallas kernel runs via the Mosaic CPU/interpret lowering)."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodalgame_tpu.game.agents import AgentModules, init_params
from multimodalgame_tpu.game.config import GameConfig
from multimodalgame_tpu.game.train import make_eval_exchange
import pytest

pytestmark = pytest.mark.slow  # see pytest.ini: `-m "not slow"` is the fast subset



def test_eval_exchange_pallas_vs_scan(monkeypatch):
    # Pallas on the CPU backend requires interpret mode.
    import multimodalgame_tpu.ops.pallas_exchange as px
    orig = px.fused_eval_exchange
    monkeypatch.setattr(
        px, "fused_eval_exchange",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}))

    cfg = GameConfig(img_feat_dim=32, img_h_dim=16, sender_out_dim=8,
                     rec_w_dim=8, rec_hidden=16, wv_dim=12, max_exchange=3,
                     baseline_hid_dim=16, fixed_exchange=False)
    mods = AgentModules(cfg)
    params = init_params(mods, jax.random.PRNGKey(0), num_classes=5)
    rng = np.random.RandomState(0)
    # batch >= 8: below a full sublane tile make_eval_exchange routes to
    # the scan path (Mosaic can't lower the kernel's reductions there).
    data = jnp.asarray(rng.randn(8, 32), jnp.float32)
    desc = jnp.asarray(rng.randn(5, 12), jnp.float32)
    key = jax.random.PRNGKey(1)

    scan = make_eval_exchange(mods, use_pallas=False)(
        params, data, desc, key)
    fused = make_eval_exchange(mods, use_pallas=True)(
        params, data, desc, key)

    assert int(scan.n_steps) == int(fused.n_steps)
    np.testing.assert_array_equal(np.asarray(scan.stop_masks),
                                  np.asarray(fused.stop_masks))
    np.testing.assert_array_equal(np.asarray(scan.sen_feats),
                                  np.asarray(fused.sen_feats))
    np.testing.assert_array_equal(np.asarray(scan.rec_feats),
                                  np.asarray(fused.rec_feats))
    np.testing.assert_allclose(np.asarray(scan.y), np.asarray(fused.y),
                               atol=1e-4)
    # The train-only outputs are zeros in eval mode either way.
    assert float(jnp.abs(fused.bs).max()) == 0.0

    # Small batches fall back to the scan path silently — identical
    # record, no Mosaic compile (which would fail at these shapes).
    small = jnp.asarray(rng.randn(2, 32), jnp.float32)
    a = make_eval_exchange(mods, use_pallas=True)(params, small, desc, key)
    b = make_eval_exchange(mods, use_pallas=False)(params, small, desc,
                                                   key)
    np.testing.assert_array_equal(np.asarray(a.sen_feats),
                                  np.asarray(b.sen_feats))
    np.testing.assert_array_equal(np.asarray(a.y), np.asarray(b.y))
