"""Exchange-engine tests: shapes, stop semantics, gradient isolation
(reference model.py:725-876 and the detach map in SURVEY §7)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalgame_tpu.game.agents import AgentModules, init_params
from multimodalgame_tpu.game.config import GameConfig
from multimodalgame_tpu.game.exchange import exchange
from multimodalgame_tpu.game.masks import assemble_loss_masks
from multimodalgame_tpu.game.train import compute_losses

B, D, FEAT, W, HID, WV, T = 6, 5, 32, 8, 16, 12, 4


def _cfg(**kw):
    base = dict(img_feat_dim=FEAT, img_h_dim=16, sender_out_dim=W,
                rec_w_dim=W, rec_hidden=HID, wv_dim=WV, max_exchange=T,
                baseline_hid_dim=24, fixed_exchange=False,
                entropy_s=0.08, entropy_sen=0.01, entropy_rec=0.01)
    base.update(kw)
    return GameConfig(**base)


def _setup(cfg, seed=0):
    mods = AgentModules(cfg)
    params = init_params(mods, jax.random.PRNGKey(seed), num_classes=D)
    rng = np.random.RandomState(seed)
    data = jnp.asarray(rng.randn(B, FEAT), jnp.float32)
    desc = jnp.asarray(rng.randn(D, WV), jnp.float32)
    return mods, params, data, desc


def test_output_shapes():
    cfg = _cfg()
    mods, params, data, desc = _setup(cfg)
    ex = exchange(mods, params, data, desc, jax.random.PRNGKey(1),
                  train=True)
    assert ex.stop_masks.shape == (T + 1, B, 1)
    assert ex.stop_feats.shape == (T, B, 1)
    assert ex.sen_feats.shape == (T, B, W)
    assert ex.rec_feats.shape == (T, B, W)
    assert ex.y.shape == (T, B, D)
    assert ex.bs.shape == (T, B, 1)
    assert ex.br.shape == (T, B, 1)


def test_stop_mask_chain_invariants():
    cfg = _cfg()
    mods, params, data, desc = _setup(cfg)
    ex = exchange(mods, params, data, desc, jax.random.PRNGKey(2),
                  train=True)
    m = np.asarray(ex.stop_masks)[:, :, 0]
    assert (m[0] == 1).all()                        # ones padding
    assert (m[-1] == 0).all()                       # forced final zero
    assert (np.diff(m, axis=0) <= 0).all()          # monotone decreasing
    # Binary messages.
    assert set(np.unique(np.asarray(ex.sen_feats))) <= {0.0, 1.0}
    # y-mask columns each select exactly one step (debug assert parity,
    # model.py:898-900).
    y = np.asarray(assemble_loss_masks(ex.stop_masks).y)[:, :, 0]
    np.testing.assert_array_equal(y.sum(0), np.ones(B))


def test_eval_mode_deterministic_and_stop_product():
    cfg = _cfg()
    mods, params, data, desc = _setup(cfg)
    ex1 = exchange(mods, params, data, desc, jax.random.PRNGKey(3),
                   train=False)
    ex2 = exchange(mods, params, data, desc, jax.random.PRNGKey(99),
                   train=False)
    # Eval has no sampling: results are key-independent.
    np.testing.assert_array_equal(np.asarray(ex1.sen_feats),
                                  np.asarray(ex2.sen_feats))
    np.testing.assert_array_equal(np.asarray(ex1.stop_feats),
                                  np.asarray(ex2.stop_feats))
    # Cumulative stop product makes stop feats monotone non-increasing
    # over steps (model.py:423-427).
    s = np.asarray(ex1.stop_feats)[:, :, 0]
    assert (np.diff(s, axis=0) <= 0).all()


def test_n_steps_semantics():
    cfg = _cfg(fixed_exchange=True)
    mods, params, data, desc = _setup(cfg)
    ex = exchange(mods, params, data, desc, jax.random.PRNGKey(4),
                  train=True)
    assert int(ex.n_steps) == T  # fixed: always max_exchange

    cfg = _cfg()
    mods, params, data, desc = _setup(cfg)
    ex = exchange(mods, params, data, desc, jax.random.PRNGKey(4),
                  train=True)
    n = int(ex.n_steps)
    masks = np.asarray(ex.stop_masks)[:, :, 0]
    # Steps before n: someone was active at entry; at n (if < T): the
    # post-step mask of step n-1 is all-zero (the break condition,
    # model.py:866-867).
    assert 1 <= n <= T
    if n < T:
        assert masks[n].sum() == 0
        assert masks[n - 1].sum() > 0


def test_first_rec_seeds_initial_query():
    cfg = _cfg(first_rec=1.0, max_exchange=1)
    mods, params, data, desc = _setup(cfg)
    ex_ones = exchange(mods, params, data, desc, jax.random.PRNGKey(5),
                       train=False)
    # Genuinely different modules built from first_rec=0.0 (identical
    # parameters: init is a function of the key and shapes only).
    cfg0 = _cfg(first_rec=0.0, max_exchange=1)
    mods0, params0, _, _ = _setup(cfg0)
    ex_zeros = exchange(mods0, params0, data, desc, jax.random.PRNGKey(5),
                        train=False)
    # first_rec changes nothing at t==0 for the sender code path (the
    # learned code_bias is used instead of w, model.py:196-200), so the
    # messages agree...
    np.testing.assert_array_equal(np.asarray(ex_ones.sen_probs),
                                  np.asarray(ex_zeros.sen_probs))


def test_ignore_receiver_zeroes_queries():
    cfg = _cfg(ignore_receiver=True)
    mods, params, data, desc = _setup(cfg)
    ex = exchange(mods, params, data, desc, jax.random.PRNGKey(6),
                  train=True)
    assert float(np.abs(np.asarray(ex.rec_feats)).sum()) == 0.0


def test_rec_out_dim_gt_1_rejected():
    """rec_out_dim > 1 is dead configuration space in the reference too
    (model.py:433/439-449: the confidence-weighted mixing multiplies a
    (B, D*out) softmax into (D, wv) descriptions and fails) — the
    receiver rejects it loudly at setup instead of crashing with an
    opaque broadcast error downstream."""
    cfg = _cfg(rec_out_dim=2)
    mods = AgentModules(cfg)
    with pytest.raises(NotImplementedError, match="rec_out_dim"):
        init_params(mods, jax.random.PRNGKey(0), num_classes=D)


def test_rec_s_dim_gt_1_rejected():
    """Same dead-config policy as rec_out_dim: the (B, 1) stop-bit shape
    is assumed by the exchange mask chain in both frameworks
    (model.py:852); s_dim > 1 would die with an opaque scan carry-shape
    error."""
    cfg = _cfg(rec_s_dim=2)
    mods = AgentModules(cfg)
    with pytest.raises(NotImplementedError, match="rec_s_dim"):
        init_params(mods, jax.random.PRNGKey(0), num_classes=D)


def test_continuous_channel():
    cfg = _cfg(use_binary=False)
    mods, params, data, desc = _setup(cfg)
    ex = exchange(mods, params, data, desc, jax.random.PRNGKey(7),
                  train=True)
    vals = np.unique(np.asarray(ex.sen_feats))
    assert not set(vals) <= {0.0, 1.0}  # raw scores, not bits


def test_corrupt_mask_flips_bits():
    cfg = _cfg()
    mods, params, data, desc = _setup(cfg)
    clean = exchange(mods, params, data, desc, jax.random.PRNGKey(8),
                     train=False)
    mask = jnp.asarray([1., 0., 0., 0., 0., 0., 0., 1.])
    corrupt = exchange(mods, params, data, desc, jax.random.PRNGKey(8),
                       train=False, corrupt_mask=mask)
    a = np.asarray(clean.sen_feats)[0]
    b = np.asarray(corrupt.sen_feats)[0]
    np.testing.assert_array_equal(np.abs(a - b).sum(0) > 0,
                                  np.asarray(mask) > 0)


@pytest.mark.slow
def test_gradient_isolation():
    """The four agents' losses must only produce gradients for their own
    parameter trees — the reference's four-separate-graphs semantics
    (model.py:1307-1330; detach points per SURVEY §7 hard part 2)."""
    cfg = _cfg()
    mods, params, data, desc = _setup(cfg)
    target = jnp.asarray(np.arange(B) % D)
    key = jax.random.PRNGKey(9)

    def component(p, name):
        _, m = compute_losses(mods, p, data, target, desc, key,
                              None, None, None, 3, B)
        return getattr(m, name)

    def max_abs(tree):
        return max(float(jnp.abs(x).max())
                   for x in jax.tree_util.tree_leaves(tree))

    g_sen = jax.grad(lambda p: component(p, "loss_sen"))(params)
    assert max_abs(g_sen["receiver"]) == 0.0
    assert max_abs(g_sen["baseline_sen"]) == 0.0
    assert max_abs(g_sen["baseline_rec"]) == 0.0
    assert max_abs(g_sen["sender"]) > 0.0

    g_rec = jax.grad(lambda p: component(p, "loss_rec"))(params)
    assert max_abs(g_rec["sender"]) == 0.0
    assert max_abs(g_rec["baseline_sen"]) == 0.0
    assert max_abs(g_rec["baseline_rec"]) == 0.0
    assert max_abs(g_rec["receiver"]) > 0.0

    g_bas = jax.grad(lambda p: component(p, "loss_bas_rec")
                     + component(p, "loss_bas_sen"))(params)
    assert max_abs(g_bas["sender"]) == 0.0
    assert max_abs(g_bas["receiver"]) == 0.0
    assert max_abs(g_bas["baseline_rec"]) > 0.0
    assert max_abs(g_bas["baseline_sen"]) > 0.0
