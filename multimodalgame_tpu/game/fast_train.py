"""Fast training path: sequential sampling, batched differentiation.

The conversation is inherently sequential *forward* (each query feeds the
next sender turn), but its gradient structure is not: every tensor
crossing between agents is a detached sample (SURVEY §7 hard part 2), so
the only true backward-through-time dependency is the Receiver's GRU
chain. The default path differentiates straight through the full
``lax.scan`` — T sequential steps of small-matmul head gradients. This
path restructures the same math:

1. **Phase A (sample)** — run the standard exchange under
   ``stop_gradient`` to obtain the sampled bit record (z, w, s) and the
   stop-mask chain. Contributes nothing to the backward graph.
2. **Phase B (recompute, differentiable)** — rebuild every
   loss-bearing quantity from the recorded bits with maximal batching:
   sender logits vmapped over all T turns (one ``(T*B, F)`` matmul
   instead of T small ones), a *GRU-only* scan for the hidden-state
   chain, all receiver heads and both baselines vmapped over T.

The losses (game/train.py:losses_from_exchange) see identical values —
the recomputed probabilities equal phase A's because they are the same
functions of the same inputs — but the backward pass now consists of a
handful of large batched matmuls plus a T-step BPTT of just the GRU cell.

Eligible for ALL game configurations (since the attention heads were
shown to batch over T as well — see supports_fast); the train-step
factories select it automatically for ``fast="auto"``.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from multimodalgame_tpu.game.agents import AgentModules
from multimodalgame_tpu.game.config import GameConfig
from multimodalgame_tpu.game.exchange import (ExchangeOutputs, exchange,
                                              finalize_stop_masks)
from multimodalgame_tpu.game.train import TrainMetrics, losses_from_exchange

stop_grad = jax.lax.stop_gradient


def supports_fast(cfg: GameConfig) -> bool:
    """All game configurations: even with visual/description attention the
    sender turn and every receiver head are pure functions of (detached
    query, hidden state), so they batch over T; only the GRU recurs."""
    return True


def _phase_a_pallas(modules: AgentModules, params, data, desc, key):
    """Phase A via the fused Pallas sampler (ops/pallas_exchange.py):
    one kernel launch for the whole sampled conversation, on-core PRNG
    seeded from the JAX key."""
    from multimodalgame_tpu.ops.pallas_exchange import fused_train_forward
    cfg = modules.cfg
    batch = data.shape[0]
    seed = jax.random.randint(key, (), 0, jnp.int32(2 ** 31 - 1))
    f = fused_train_forward(cfg, jax.tree_util.tree_map(stop_grad, params),
                            data, desc, seed)
    stop_masks, n_steps = finalize_stop_masks(f.masks, cfg.fixed_exchange)
    return ExchangeOutputs(
        stop_masks=stop_masks, stop_feats=f.stop_feats,
        stop_probs=f.stop_probs, sen_feats=f.sen_feats,
        sen_probs=f.sen_probs, rec_feats=f.rec_feats,
        rec_probs=f.rec_probs, y=f.y,
        bs=jnp.zeros_like(f.stop_feats), br=jnp.zeros_like(f.stop_feats),
        n_steps=n_steps, attn_scores=None)


def compute_losses_fast(modules: AgentModules, params: Dict[str, Any],
                        data: jnp.ndarray, target: jnp.ndarray,
                        desc: jnp.ndarray, key: jax.Array,
                        top_k: int, batch_denom: int,
                        sampler: str = "scan",
                        desc_set_padded=None, desc_set_mask=None,
                        data_context=None
                        ) -> Tuple[jnp.ndarray, TrainMetrics]:
    from multimodalgame_tpu.game.train import cast_floating

    cfg = modules.cfg
    T = cfg.max_exchange
    batch = data.shape[0]

    if cfg.compute_dtype == "bfloat16":
        assert sampler != "pallas", \
            "the pallas sampler is f32-only; use the scan sampler with bf16"
        (params, data, desc, desc_set_padded, desc_set_mask,
         data_context) = cast_floating(
            (params, data, desc, desc_set_padded, desc_set_mask,
             data_context), jnp.bfloat16)

    # ---- Phase A: sampled conversation, gradient-free ----
    if sampler == "pallas":
        assert desc_set_padded is None and data_context is None, \
            "the pallas sampler covers non-attention configs only"
        ex = _phase_a_pallas(modules, params, data, desc, key)
    else:
        frozen = jax.tree_util.tree_map(stop_grad, params)
        ex = exchange(modules, frozen, data, desc, key, train=True,
                      desc_set_padded=desc_set_padded,
                      desc_set_mask=desc_set_mask,
                      data_context=data_context,
                      score_baselines=False)
    z_bits = stop_grad(ex.sen_feats)    # (T, B, W) post corruption/flip
    w_bits = stop_grad(ex.rec_feats)    # (T, B, W) post flip/ignore
    s_bits = stop_grad(ex.stop_feats)   # (T, B, 1)

    # The query each sender turn actually saw (model.py:786-787, 803).
    # Dtypes follow the recorded bits so f64 runs stay f64 end to end.
    w_prev = jnp.concatenate(
        [jnp.full((1, batch, cfg.rec_w_dim), cfg.first_rec, w_bits.dtype),
         w_bits[:-1]], axis=0)

    # ---- Phase B: differentiable batched recompute ----
    def sen_apply(method, *a):
        return modules.sender.apply({"params": params["sender"]}, *a,
                                    method=method)

    def rec_apply(method, *a):
        return modules.receiver.apply({"params": params["receiver"]}, *a,
                                      method=method)

    sen_cache = sen_apply("precompute", data, data_context)
    rec_cache = rec_apply("precompute", desc, desc_set_padded,
                          desc_set_mask)

    # Sender turns: batched over T (data is closed over, so its projection
    # is computed once; the t==0 code-bias select and attention are
    # vmapped).
    z_logits, h_x, attn = jax.vmap(
        lambda w, t: sen_apply("step", data, w, t, sen_cache))(
        w_prev, jnp.arange(T))
    if cfg.use_binary:
        z_probs = jax.nn.sigmoid(z_logits)
    else:
        z_probs = jnp.zeros_like(z_logits)

    # GRU-only differentiable hidden chain over the recorded messages.
    h0 = jnp.zeros((batch, cfg.rec_hidden), z_bits.dtype)
    def gru_step(h, z):
        h2 = rec_apply("gru", z, h)
        return h2, h2
    _, h_stack = jax.lax.scan(gru_step, h0, z_bits)      # (T, B, R)

    # All heads batched over T.
    s_logits, y, w_logits = jax.vmap(
        lambda h: rec_apply("heads", h, rec_cache))(h_stack)
    s_probs = jax.nn.sigmoid(s_logits)
    if cfg.use_binary:
        w_probs = jax.nn.sigmoid(w_logits)
    else:
        w_probs = jnp.zeros_like(w_logits)

    # Baselines batched over T (inputs detached, model.py:831-843).
    bs = jax.vmap(lambda hx, w: modules.baseline_sen.apply(
        {"params": params["baseline_sen"]}, stop_grad(hx), w, None))(
        h_x, w_prev)
    br = jax.vmap(lambda z, h: modules.baseline_rec.apply(
        {"params": params["baseline_rec"]}, None, z, stop_grad(h)))(
        z_bits, h_stack)

    ex_out = ExchangeOutputs(
        stop_masks=ex.stop_masks, stop_feats=s_bits, stop_probs=s_probs,
        sen_feats=z_bits, sen_probs=z_probs, rec_feats=w_bits,
        rec_probs=w_probs, y=y, bs=bs, br=br, n_steps=ex.n_steps,
        attn_scores=attn)
    if cfg.compute_dtype == "bfloat16":
        ex_out = cast_floating(ex_out, jnp.float32)
    return losses_from_exchange(cfg, ex_out, target, top_k, batch_denom)
