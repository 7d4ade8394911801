"""Loss-function tests against independent numpy golden computations
(reference model.py:571-577, 879-988)."""

import jax.numpy as jnp
import numpy as np
import pytest

from multimodalgame_tpu.game.losses import (calculate_loss_bas,
                                            calculate_loss_binary,
                                            get_rec_outp, loglikelihood,
                                            multistep_loss_bas,
                                            multistep_loss_binary, nll_loss,
                                            topk_accuracy)

EPS = 1e-8


def _np_reinforce(feats, probs, logs, scores, penalty):
    """Independent numpy computation of the single-step REINFORCE loss."""
    lpz = (feats * np.log(probs + EPS)
           + (1 - feats) * np.log(1 - probs + EPS)).sum(1)
    w = (logs - scores)[:, 0]
    if len(w) > 1:
        w = w / max(1.0, np.std(w, ddof=1))
    loss = np.mean(-w * lpz)
    neg = (np.log(probs + EPS) * probs).sum(1).mean() + \
          (np.log(1 - probs + EPS) * (1 - probs)).sum(1).mean()
    if penalty is not None:
        loss = loss + penalty * neg
    return loss, neg


def test_loglikelihood_and_nll():
    lp = jnp.log(jnp.asarray([[0.7, 0.2, 0.1], [0.1, 0.8, 0.1]]))
    t = jnp.asarray([0, 1])
    ll = loglikelihood(lp, t)
    np.testing.assert_allclose(np.asarray(ll)[:, 0],
                               [np.log(0.7), np.log(0.8)], rtol=1e-6)
    np.testing.assert_allclose(float(nll_loss(lp, t)),
                               -(np.log(0.7) + np.log(0.8)) / 2, rtol=1e-6)


def test_calculate_loss_binary_matches_numpy():
    rng = np.random.RandomState(0)
    B, K = 6, 4
    feats = (rng.rand(B, K) < 0.5).astype(np.float32)
    probs = rng.uniform(0.1, 0.9, (B, K)).astype(np.float32)
    logs = rng.randn(B, 1).astype(np.float32)
    scores = rng.randn(B, 1).astype(np.float32)
    for penalty in (None, 0.05):
        loss, neg = calculate_loss_binary(
            jnp.asarray(feats), jnp.asarray(probs), jnp.asarray(logs),
            jnp.asarray(scores), penalty)
        el, en = _np_reinforce(feats, probs, logs, scores, penalty)
        np.testing.assert_allclose(float(loss), el, rtol=1e-5)
        np.testing.assert_allclose(float(neg), en, rtol=1e-5)


def test_masked_loss_binary_equals_row_selection():
    """Masked single-step loss == unmasked loss on the selected rows
    (the reference's mapped_fn row-gather, model.py:941-945)."""
    rng = np.random.RandomState(1)
    B, K = 8, 5
    feats = (rng.rand(B, K) < 0.5).astype(np.float32)
    probs = rng.uniform(0.1, 0.9, (B, K)).astype(np.float32)
    logs = rng.randn(B, 1).astype(np.float32)
    scores = rng.randn(B, 1).astype(np.float32)
    mask = np.array([1, 1, 0, 1, 0, 1, 1, 0], np.float32)[:, None]
    sel = mask[:, 0].astype(bool)

    loss_m, neg_m = calculate_loss_binary(
        jnp.asarray(feats), jnp.asarray(probs), jnp.asarray(logs),
        jnp.asarray(scores), 0.01, jnp.asarray(mask))
    el, en = _np_reinforce(feats[sel], probs[sel], logs[sel], scores[sel],
                           0.01)
    np.testing.assert_allclose(float(loss_m), el, rtol=1e-5)
    np.testing.assert_allclose(float(neg_m), en, rtol=1e-5)


def test_zero_mask_step_contributes_zero():
    z = jnp.zeros((4, 3))
    loss, neg = calculate_loss_binary(z, z + 0.5, jnp.ones((4, 1)),
                                      jnp.zeros((4, 1)), 0.1,
                                      jnp.zeros((4, 1)))
    assert float(loss) == 0.0 and float(neg) == 0.0


def test_multistep_truncation_equivalence():
    """Running the full T steps with zero masks on the virtual-break tail
    must equal computing over only the executed steps — the core
    correctness claim of the mask-propagation design (SURVEY §7 hard
    part 1)."""
    rng = np.random.RandomState(2)
    T, B, K, n = 5, 6, 4, 3  # conversation virtually breaks after step 3
    feats = (rng.rand(T, B, K) < 0.5).astype(np.float32)
    probs = rng.uniform(0.1, 0.9, (T, B, K)).astype(np.float32)
    logs = rng.randn(B, 1).astype(np.float32)
    scores = rng.randn(T, B, 1).astype(np.float32)
    masks = np.zeros((T, B, 1), np.float32)
    masks[0] = 1
    masks[1, :4] = 1
    masks[2, :2] = 1
    # steps 3..4: all-zero masks (after the break)

    full, _ = multistep_loss_binary(
        jnp.asarray(feats), jnp.asarray(probs), jnp.asarray(logs),
        jnp.asarray(scores), jnp.asarray(masks), 0.02)
    trunc, _ = multistep_loss_binary(
        jnp.asarray(feats[:n]), jnp.asarray(probs[:n]), jnp.asarray(logs),
        jnp.asarray(scores[:n]), jnp.asarray(masks[:n]), 0.02)
    np.testing.assert_allclose(float(full), float(trunc), rtol=1e-6)

    full_b = multistep_loss_bas(jnp.asarray(scores), jnp.asarray(logs),
                                jnp.asarray(masks))
    trunc_b = multistep_loss_bas(jnp.asarray(scores[:n]), jnp.asarray(logs),
                                 jnp.asarray(masks[:n]))
    np.testing.assert_allclose(float(full_b), float(trunc_b), rtol=1e-6)


def test_multistep_unmasked_is_mean_over_steps():
    rng = np.random.RandomState(3)
    T, B, K = 3, 4, 2
    feats = (rng.rand(T, B, K) < 0.5).astype(np.float32)
    probs = rng.uniform(0.1, 0.9, (T, B, K)).astype(np.float32)
    logs = rng.randn(B, 1).astype(np.float32)
    scores = rng.randn(T, B, 1).astype(np.float32)
    loss, negents = multistep_loss_binary(
        jnp.asarray(feats), jnp.asarray(probs), jnp.asarray(logs),
        jnp.asarray(scores), None, None)
    per = [_np_reinforce(feats[t], probs[t], logs, scores[t], None)[0]
           for t in range(T)]
    np.testing.assert_allclose(float(loss), np.mean(per), rtol=1e-5)
    assert negents.shape == (T,)


def test_calculate_loss_bas():
    s = jnp.asarray([[1.0], [2.0]])
    l = jnp.asarray([[0.0], [4.0]])
    np.testing.assert_allclose(float(calculate_loss_bas(s, l)),
                               (1.0 + 4.0) / 2)
    m = jnp.asarray([[1.0], [0.0]])
    np.testing.assert_allclose(float(calculate_loss_bas(s, l, m)), 1.0)


def test_get_rec_outp_masked_selection():
    T, B, D = 3, 2, 4
    y = jnp.arange(T * B * D, dtype=jnp.float32).reshape(T, B, D)
    masks = jnp.zeros((T, B, 1)).at[1, 0, 0].set(1).at[2, 1, 0].set(1)
    outp, negent = get_rec_outp(y, masks)
    np.testing.assert_array_equal(np.asarray(outp[0]), np.asarray(y[1, 0]))
    np.testing.assert_array_equal(np.asarray(outp[1]), np.asarray(y[2, 1]))
    assert negent.shape == (T,)
    # Unmasked: last step (model.py:903-904).
    outp2, _ = get_rec_outp(y, None)
    np.testing.assert_array_equal(np.asarray(outp2), np.asarray(y[-1]))


def test_topk_accuracy_denominator_quirk():
    dist = jnp.asarray([[0.1, 0.9, 0.0], [0.8, 0.15, 0.1]])
    t = jnp.asarray([1, 2])
    # top-1: first correct, second wrong; denominator is the configured
    # batch size (4), not the actual rows (2) — model.py:667.
    np.testing.assert_allclose(float(topk_accuracy(dist, t, 1, 4)), 0.25)
    np.testing.assert_allclose(float(topk_accuracy(dist, t, 2, 2)), 0.5)


def test_topk_accuracy_clamps_k_to_class_count():
    """k > num classes behaves like the reference's argsort slice
    (model.py:1332-1338): all classes count as top-k, so every target
    hits — instead of lax.top_k's trace-time rejection."""
    dist = jnp.asarray(np.random.RandomState(0).randn(5, 3))
    target = jnp.asarray([0, 1, 2, 0, 1])
    acc = topk_accuracy(dist, target, k=6, denom=5)
    assert float(acc) == 1.0


def test_game_config_channel_width_invariant():
    """sender_out_dim == rec_w_dim (reference model.py:1756-1757) is
    enforced at GameConfig construction, not just in the CLI."""
    from multimodalgame_tpu.game.config import GameConfig

    with pytest.raises(ValueError, match="rec_w_dim"):
        GameConfig(sender_out_dim=64, rec_w_dim=50)
