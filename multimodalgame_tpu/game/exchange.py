"""The multi-step exchange engine: one ``lax.scan`` per conversation.

Parity target: reference ``exchange()`` (model.py:725-876) — the batched
Sender/Receiver conversation loop with stop-mask accumulation, baseline
scoring, optional message corruption, and early termination.

TPU-first design (SURVEY §5.7, §7 phase 2):

* The whole conversation compiles to **one** ``lax.scan`` over
  ``max_exchange`` steps. Fixed and adaptive settings are the *same*
  program; the reference's ``break_early`` (model.py:866-867) is replaced
  by mask propagation — compute always runs to ``max_exchange``, and the
  masked loss algebra (see game/masks.py) makes the result mathematically
  identical. ``n_steps`` reports how many steps the reference's Python
  loop would have executed so the eval/extraction drivers can reproduce
  its ragged-list semantics exactly.
* All Bernoulli sampling is ``jax.random`` fused into the scan — the
  reference round-trips every sample through host numpy
  (model.py:225-227, 418-420, 458-460), its main hot-loop cost.
* Every channel crossing carries an explicit ``stop_gradient``, mirroring
  the reference's ``Variable(x.data)`` re-wrapping (model.py:807-811,
  826-829, 836, 843): messages cross the channel as constants, which is
  what makes the four agents' autograd graphs independent.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from multimodalgame_tpu.game.agents import AgentModules
from multimodalgame_tpu.game.masks import corrupt_message
from multimodalgame_tpu.ops.sampling import (bernoulli_from_uniform,
                                             flipout_from_uniform, hard_round)

stop_grad = jax.lax.stop_gradient


class ExchangeOutputs(NamedTuple):
    """Stacked per-step conversation record (the reference's appended lists,
    model.py:852-863, as dense ``(T, B, ...)`` arrays)."""
    stop_masks: jnp.ndarray   # (T+1, B, 1); [0]=ones, [-1] forced zero
    stop_feats: jnp.ndarray   # (T, B, s_dim)
    stop_probs: jnp.ndarray   # (T, B, s_dim)
    sen_feats: jnp.ndarray    # (T, B, sender_out_dim) — post-corruption
    sen_probs: jnp.ndarray    # (T, B, sender_out_dim)
    rec_feats: jnp.ndarray    # (T, B, rec_w_dim) — post-flipout/ignore
    rec_probs: jnp.ndarray    # (T, B, rec_w_dim)
    y: jnp.ndarray            # (T, B, D*rec_out_dim)
    bs: jnp.ndarray           # (T, B, 1) sender-baseline scores (train)
    br: jnp.ndarray           # (T, B, 1) receiver-baseline scores (train)
    n_steps: jnp.ndarray      # () int32 — steps the reference's break_early
                              #   loop would execute (T when fixed_exchange)
    attn_scores: Optional[jnp.ndarray]  # (T, B, N) with visual attention


class _Step(NamedTuple):
    new_mask: jnp.ndarray
    s_feat: jnp.ndarray
    s_prob: jnp.ndarray
    sen_feat: jnp.ndarray
    sen_prob: jnp.ndarray
    rec_feat: jnp.ndarray
    rec_prob: jnp.ndarray
    y: jnp.ndarray
    bs: jnp.ndarray
    br: jnp.ndarray
    attn: Optional[jnp.ndarray]



def finalize_stop_masks(masks, fixed_exchange: bool):
    """Assemble the ``(T+1, B, 1)`` stop-mask chain and the reference's
    break-early step count from per-step cumulative masks ``(T, B, 1)``.

    Prepends the all-ones step-0 mask and forces the final mask to zero
    (model.py:870) so every example's y-mask selects a step. ``n_steps``
    is the number of steps the reference's Python loop would execute:
    step 0 always runs; step t+1 runs iff anyone is still active after t
    (model.py:866-867). Shared by the scan engine here and both fused
    Pallas paths (game/train.py, game/fast_train.py) so the convention
    cannot drift between them.
    """
    T, batch = masks.shape[0], masks.shape[1]
    stop_masks = jnp.concatenate(
        [jnp.ones((1, batch, 1), masks.dtype), masks], axis=0)
    stop_masks = stop_masks.at[-1].set(0.0)
    if fixed_exchange:
        n_steps = jnp.asarray(T, jnp.int32)
    else:
        alive = jnp.sum(masks, axis=(1, 2)) > 0  # (T,)
        n_steps = 1 + jnp.sum(alive[:-1].astype(jnp.int32))
    return stop_masks, n_steps

def exchange(modules: AgentModules, params: Dict[str, Any],
             data: jnp.ndarray, desc: jnp.ndarray, key: jax.Array,
             train: bool,
             desc_set_padded: Optional[jnp.ndarray] = None,
             desc_set_mask: Optional[jnp.ndarray] = None,
             data_context: Optional[jnp.ndarray] = None,
             corrupt_mask: Optional[jnp.ndarray] = None,
             score_baselines: bool = True) -> ExchangeOutputs:
    """Run a batched conversation.

    Args:
        modules: the four agent module definitions (carries the static
            :class:`GameConfig`).
        params: dict of the four parameter trees.
        data: image features ``(B, feat_dim)`` or ``(B, C, H, W)``.
        desc: class-description CBOW matrix ``(D, wv_dim)``.
        key: PRNG key for all message/stop sampling this conversation.
        train: static — training (sampled messages, baselines scored) vs
            eval (rounded messages, cumulative stop product,
            model.py:222-229, 414-429).
        desc_set_padded/desc_set_mask: padded word sets for description
            attention.
        data_context: extra ``fc`` features for attention context
            (model.py:127-136).
        corrupt_mask: optional ``(w_dim,)`` bit-flip mask applied to every
            sender message (eval-time channel fault injection,
            model.py:814-820).
        score_baselines: static — when False the value networks are not
            scored inside the scan (``bs``/``br`` return zeros). The fast
            training path recomputes both baselines batched over T in its
            phase B (game/fast_train.py), so scoring them sequentially
            here would be pure waste.
    """
    cfg = modules.cfg
    batch = data.shape[0]
    T = cfg.max_exchange

    def sen_apply(method, *a):
        return modules.sender.apply({"params": params["sender"]}, *a,
                                    method=method)

    def rec_apply(method, *a):
        return modules.receiver.apply({"params": params["receiver"]}, *a,
                                      method=method)

    sen_cache = sen_apply("precompute", data, data_context)
    rec_cache = rec_apply("precompute", desc, desc_set_padded, desc_set_mask)

    # The Receiver opens the conversation with a query of ``first_rec``s
    # (model.py:786-787; 0s by default). Carries follow the feature dtype
    # so f64 runs (the golden gradient-equality test) stay f64 throughout.
    fdtype = (data.dtype if jnp.issubdtype(data.dtype, jnp.floating)
              else jnp.float32)
    w0 = jnp.full((batch, cfg.rec_w_dim), cfg.first_rec, fdtype)
    h0 = jnp.zeros((batch, cfg.rec_hidden), fdtype)
    mask0 = jnp.ones((batch, 1), fdtype)
    sprod0 = jnp.ones((batch, cfg.rec_s_dim), fdtype)

    step_keys = jax.random.split(key, T * 5).reshape((T, 5) + key.shape)

    # Pre-draw every turn's uniforms in one vmapped PRNG invocation.
    # ``uniform`` doesn't depend on the probabilities, and vmapping the
    # same per-step keys produces bit-identical draws to calling inside
    # the scan — but one batched threefry instead of 3-5 latency-bound
    # hash chains per sequential turn.
    u_dtype = jnp.promote_types(jnp.float32, fdtype)

    def _draw(keys_t, dim):
        return jax.vmap(
            lambda k: jax.random.uniform(k, (batch, dim),
                                         dtype=u_dtype))(keys_t)

    uniforms: Dict[str, jnp.ndarray] = {}
    if train:
        uniforms["s"] = _draw(step_keys[:, 2], cfg.rec_s_dim)
        if cfg.use_binary:
            uniforms["z"] = _draw(step_keys[:, 0], cfg.sender_out_dim)
            uniforms["w"] = _draw(step_keys[:, 3], cfg.rec_w_dim)
    if cfg.use_binary and cfg.flipout_sen is not None and (
            train or cfg.flipout_dev):
        uniforms["fz"] = _draw(step_keys[:, 1], cfg.sender_out_dim)
    if cfg.use_binary and cfg.flipout_rec is not None and (
            train or cfg.flipout_dev):
        uniforms["fw"] = _draw(step_keys[:, 4], cfg.rec_w_dim)

    def body(carry, xs):
        h_z, w_prev, mask, sprod = carry
        u, t = xs

        # --- Sender turn (model.py:806-811) ---
        z_r = stop_grad(w_prev)
        sen_logits, h_x, attn = sen_apply("step", data, z_r, t, sen_cache)
        if cfg.use_binary:
            z_probs = jax.nn.sigmoid(sen_logits)
            if train:
                z_binary = bernoulli_from_uniform(u["z"], z_probs)
            else:
                z_binary = hard_round(z_probs)
            if cfg.flipout_sen is not None and (train or cfg.flipout_dev):
                z_binary = flipout_from_uniform(u["fz"], z_binary,
                                                cfg.flipout_sen)
        else:
            z_binary = sen_logits
            z_probs = jnp.zeros_like(sen_logits)
        z_binary = corrupt_message(z_binary, corrupt_mask)

        # --- Receiver turn (model.py:826-829) ---
        z_s = stop_grad(z_binary)
        h_z_new, s_logits, y, w_logits = rec_apply("step", z_s, h_z,
                                                   rec_cache)

        # STOP bit: sampled in training; in eval, inferred from the
        # (optionally cumulative) stop probability (model.py:414-429).
        s_prob = jax.nn.sigmoid(s_logits)
        if train:
            s_binary = bernoulli_from_uniform(u["s"], s_prob)
            sprod_new = sprod
        else:
            if cfg.s_prob_prod:
                # sprod starts at ones, so the t==0 step needs no
                # special case: 1.0 * x is exact (the torch oracle uses
                # the same unconditional multiply).
                sprod_new = sprod * s_prob
            else:
                sprod_new = s_prob
            s_binary = hard_round(sprod_new)

        # Receiver query back to the Sender (model.py:452-468).
        if cfg.use_binary:
            w_probs = jax.nn.sigmoid(w_logits)
            if train:
                w_feats = bernoulli_from_uniform(u["w"], w_probs)
            else:
                w_feats = hard_round(w_probs)
            if cfg.flipout_rec is not None and (train or cfg.flipout_dev):
                w_feats = flipout_from_uniform(u["fw"], w_feats,
                                               cfg.flipout_rec)
            if cfg.ignore_receiver:
                w_feats = jnp.zeros_like(w_feats)
        else:
            w_feats = w_logits
            w_probs = jnp.zeros_like(w_logits)

        # --- Baseline scoring, train only (model.py:831-843) ---
        if train and score_baselines:
            bs_t = modules.baseline_sen.apply(
                {"params": params["baseline_sen"]},
                stop_grad(h_x), z_r, None)
            br_t = modules.baseline_rec.apply(
                {"params": params["baseline_rec"]},
                None, z_s, stop_grad(h_z_new))
        else:
            bs_t = jnp.zeros((batch, 1), fdtype)
            br_t = jnp.zeros((batch, 1), fdtype)

        # Cumulative stop mask (model.py:852).
        new_mask = jnp.minimum(mask, s_binary)

        out = _Step(new_mask, s_binary, s_prob, z_binary, z_probs,
                    w_feats, w_probs, y, bs_t, br_t, attn)
        return (h_z_new, w_feats, new_mask, sprod_new), out

    init = (h0, w0, mask0, sprod0)
    _, outs = jax.lax.scan(body, init, (uniforms, jnp.arange(T)))

    stop_masks, n_steps = finalize_stop_masks(outs.new_mask,
                                              cfg.fixed_exchange)

    return ExchangeOutputs(
        stop_masks=stop_masks,
        stop_feats=outs.s_feat, stop_probs=outs.s_prob,
        sen_feats=outs.sen_feat, sen_probs=outs.sen_prob,
        rec_feats=outs.rec_feat, rec_probs=outs.rec_prob,
        y=outs.y, bs=outs.bs, br=outs.br,
        n_steps=n_steps, attn_scores=outs.attn)
