"""bf16 compute mode (VERDICT round-1 item #10): conversation in
bfloat16, parameters/optimizer/losses in f32."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalgame_tpu.game.agents import AgentModules, init_params
from multimodalgame_tpu.game.config import GameConfig
from multimodalgame_tpu.game.train import (compute_losses, init_opt_states,
                                           make_train_step)

pytestmark = pytest.mark.slow  # see pytest.ini: `-m "not slow"` is the fast subset

BASE = dict(img_feat_dim=32, img_h_dim=16, sender_out_dim=8, rec_w_dim=8,
            rec_hidden=16, wv_dim=12, max_exchange=3, baseline_hid_dim=16,
            fixed_exchange=False, entropy_s=0.08, entropy_sen=0.01,
            entropy_rec=0.01, learning_rate=1e-3)


def _inputs(rng):
    data = jnp.asarray(rng.randn(6, 32), jnp.float32)
    target = jnp.asarray(rng.randint(0, 5, size=6))
    desc = jnp.asarray(rng.randn(5, 12), jnp.float32)
    return data, target, desc


def test_bf16_keeps_f32_params_grads_and_losses():
    cfg = GameConfig(compute_dtype="bfloat16", **BASE)
    mods = AgentModules(cfg)
    params = init_params(mods, jax.random.PRNGKey(0), num_classes=5)
    data, target, desc = _inputs(np.random.RandomState(7))

    def loss(p):
        total, m = compute_losses(mods, p, data, target, desc,
                                  jax.random.PRNGKey(3), None, None, None,
                                  2, 6)
        return total, m

    (total, m), grads = jax.value_and_grad(loss, has_aux=True)(params)
    assert total.dtype == jnp.float32          # loss algebra stays f32
    assert m.dist.dtype == jnp.float32
    for leaf in jax.tree_util.tree_leaves(grads):
        assert leaf.dtype == jnp.float32       # mixed-precision grads
    assert np.isfinite(float(total))


@pytest.mark.parametrize("fast", [False, True])
def test_bf16_close_to_f32(fast):
    """Same seed, loosened tolerance: the bf16 conversation lands near the
    f32 one (bf16 has ~3 decimal digits; sampled bits coincide at this
    fixed seed, so only matmul precision differs)."""
    data, target, desc = _inputs(np.random.RandomState(7))
    key = jax.random.PRNGKey(3)
    results = {}
    for dtype in ("float32", "bfloat16"):
        cfg = GameConfig(compute_dtype=dtype, **BASE)
        mods = AgentModules(cfg)
        params = init_params(mods, jax.random.PRNGKey(0), num_classes=5)
        if fast:
            from multimodalgame_tpu.game.fast_train import compute_losses_fast
            total, m = compute_losses_fast(mods, params, data, target,
                                           desc, key, 2, 6)
        else:
            total, m = compute_losses(mods, params, data, target, desc,
                                      key, None, None, None, 2, 6)
        results[dtype] = (float(total), float(m.nll_loss),
                          np.asarray(m.exchange.sen_feats))
    # Identical sampled bits at this seed -> only precision differs.
    np.testing.assert_array_equal(results["float32"][2],
                                  results["bfloat16"][2])
    assert results["float32"][0] == pytest.approx(results["bfloat16"][0],
                                                  rel=0.05)
    assert results["float32"][1] == pytest.approx(results["bfloat16"][1],
                                                  rel=0.05)


def test_bf16_train_step_updates_f32_params():
    cfg = GameConfig(compute_dtype="bfloat16", **BASE)
    mods = AgentModules(cfg)
    params = init_params(mods, jax.random.PRNGKey(0), num_classes=5)
    opts = init_opt_states(cfg, params)
    step = make_train_step(mods, top_k=2, batch_denom=6)
    data, target, desc = _inputs(np.random.RandomState(7))
    p0 = jax.tree_util.tree_map(np.asarray, params)
    params, opts, m = step(params, opts, data, target, desc,
                           jax.random.PRNGKey(5))
    assert np.isfinite(float(m.loss_rec))
    changed = False
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(params)):
        assert np.asarray(b).dtype == np.float32
        changed = changed or not np.array_equal(np.asarray(a),
                                                np.asarray(b))
    assert changed


def test_bf16_rejects_pallas_sampler():
    from multimodalgame_tpu.game.fast_train import compute_losses_fast
    cfg = GameConfig(compute_dtype="bfloat16", **BASE)
    mods = AgentModules(cfg)
    params = init_params(mods, jax.random.PRNGKey(0), num_classes=5)
    data, target, desc = _inputs(np.random.RandomState(7))
    with pytest.raises(AssertionError, match="f32-only"):
        compute_losses_fast(mods, params, data, target, desc,
                            jax.random.PRNGKey(3), 2, 6, sampler="pallas")
