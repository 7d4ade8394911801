"""Fused four-optimizer training step.

The reference runs one forward ``exchange`` per batch and then four
*separate* backward/clip/step updates — receiver, sender, and the two
baselines (model.py:1307-1330). Because every tensor crossing between the
agents is detached (sampled messages, detached rewards/baselines — see
game/exchange.py), the gradient of the *summed* loss is block-diagonal
across the four parameter trees, so one ``jax.value_and_grad`` over the sum
yields exactly the per-loss gradients the reference computes. Each agent
keeps its own optax chain with ``clip_by_global_norm(1.0)`` (the reference's
per-model ``clip_grad_norm(max_norm=1.)``).

Optimizer parity (model.py:1110-1137): SGD / Adam / RMSprop at a shared
learning rate, with torch's hyperparameter conventions — RMSprop
``alpha=0.99`` and ``eps`` added *outside* the sqrt.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from multimodalgame_tpu.game.agents import AgentModules
from multimodalgame_tpu.game.config import GameConfig
from multimodalgame_tpu.game.exchange import (ExchangeOutputs, exchange,
                                              finalize_stop_masks)
from multimodalgame_tpu.game.losses import (get_rec_outp, loglikelihood,
                                            multistep_loss_bas,
                                            multistep_loss_binary, nll_loss,
                                            topk_accuracy)
from multimodalgame_tpu.game.masks import assemble_loss_masks

AGENT_NAMES = ("sender", "receiver", "baseline_sen", "baseline_rec")

stop_grad = jax.lax.stop_gradient


def build_optimizer(cfg: GameConfig) -> optax.GradientTransformation:
    """Per-agent optimizer chain: clip-by-global-norm(1.0) then the
    configured update rule (reference model.py:1110-1137, 1307-1330)."""
    lr = cfg.learning_rate
    if cfg.optim_type == "SGD":
        tx = optax.sgd(lr)
    elif cfg.optim_type == "Adam":
        tx = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    elif cfg.optim_type == "RMSprop":
        # torch.optim.RMSprop semantics: v <- 0.99 v + 0.01 g^2;
        # update = g / (sqrt(v) + eps).
        tx = optax.rmsprop(lr, decay=0.99, eps=1e-8, eps_in_sqrt=False)
    else:
        raise NotImplementedError(cfg.optim_type)
    return optax.chain(optax.clip_by_global_norm(1.0), tx)


def init_opt_states(cfg: GameConfig, params: Dict[str, Any]
                    ) -> Dict[str, Any]:
    tx = build_optimizer(cfg)
    return {name: tx.init(params[name]) for name in AGENT_NAMES}


class TrainMetrics(NamedTuple):
    """Everything the driver's interval logging needs
    (model.py:1341-1542)."""
    loss_rec: jnp.ndarray
    loss_sen: jnp.ndarray
    nll_loss: jnp.ndarray
    loss_binary_rec: jnp.ndarray
    loss_binary_s: jnp.ndarray
    loss_bas_rec: jnp.ndarray
    loss_bas_sen: jnp.ndarray
    ent_binary_sen: jnp.ndarray   # (T,)  per-step negentropies
    ent_binary_rec: jnp.ndarray   # (T-1,) (empty when max_exchange == 1)
    ent_y_rec: jnp.ndarray        # (T,)
    accuracy: jnp.ndarray
    dist: jnp.ndarray             # (B, D) log-softmax scores
    argmax: jnp.ndarray           # (B,)
    exchange: ExchangeOutputs


def cast_floating(tree, dtype):
    """Cast every floating leaf of ``tree`` to ``dtype`` (ints, bools,
    and PRNG keys pass through). Differentiable: grads of f32 params
    taken through a bf16 cast come back f32 — the standard
    mixed-precision recipe."""
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x, tree)


def compute_losses(modules: AgentModules, params: Dict[str, Any],
                   data: jnp.ndarray, target: jnp.ndarray,
                   desc: jnp.ndarray, key: jax.Array,
                   desc_set_padded: Optional[jnp.ndarray],
                   desc_set_mask: Optional[jnp.ndarray],
                   data_context: Optional[jnp.ndarray],
                   top_k: int, batch_denom: int
                   ) -> Tuple[jnp.ndarray, TrainMetrics]:
    """One training forward pass: exchange + all loss terms
    (the per-batch body of the reference run(), model.py:1229-1305).

    With ``cfg.compute_dtype="bfloat16"`` the conversation runs in bf16
    (params/inputs cast at entry) while the loss algebra — advantage
    normalization, entropies, masked averaging — stays f32 (record cast
    back before loss assembly).
    """
    cfg = modules.cfg
    if cfg.compute_dtype == "bfloat16":
        params, data, desc, desc_set_padded, desc_set_mask, data_context = \
            cast_floating((params, data, desc, desc_set_padded,
                           desc_set_mask, data_context), jnp.bfloat16)
    ex = exchange(modules, params, data, desc, key, train=True,
                  desc_set_padded=desc_set_padded,
                  desc_set_mask=desc_set_mask, data_context=data_context)
    if cfg.compute_dtype == "bfloat16":
        ex = cast_floating(ex, jnp.float32)
    return losses_from_exchange(cfg, ex, target, top_k, batch_denom)


def losses_from_exchange(cfg, ex: ExchangeOutputs, target: jnp.ndarray,
                         top_k: int, batch_denom: int
                         ) -> Tuple[jnp.ndarray, TrainMetrics]:
    """Loss assembly from a (differentiable) conversation record — shared
    by the reference scan path and the fast recompute path
    (game/fast_train.py)."""
    T = cfg.max_exchange

    masks = None if cfg.fixed_exchange else assemble_loss_masks(ex.stop_masks)

    outp, ent_y = get_rec_outp(ex.y, None if masks is None else masks.y)
    dist = jax.nn.log_softmax(outp, axis=-1)
    argmax = jnp.argmax(dist, axis=-1)

    nll = nll_loss(dist, target)
    logs = stop_grad(loglikelihood(dist, target))  # reward (model.py:1274)

    zero = jnp.zeros(())
    loss_binary_s = zero
    loss_binary_rec = zero
    loss_binary_sen = zero
    loss_bas_rec = zero
    loss_bas_sen = zero
    ent_s = jnp.zeros((T,))
    ent_rec = jnp.zeros((max(T - 1, 0),))
    ent_sen = jnp.zeros((T,))

    if cfg.use_binary:
        if not cfg.fixed_exchange:
            loss_binary_s, ent_s = multistep_loss_binary(
                ex.stop_feats, ex.stop_probs, logs, ex.br,
                masks.binary_s, cfg.entropy_s)
        if T > 1:
            # The receiver has no z-loss if we stop after the first sender
            # message (model.py:1284-1289).
            loss_binary_rec, ent_rec = multistep_loss_binary(
                ex.rec_feats[:-1], ex.rec_probs[:-1], logs, ex.br[:-1],
                None if masks is None else masks.binary_rec,
                cfg.entropy_rec)
        loss_binary_sen, ent_sen = multistep_loss_binary(
            ex.sen_feats, ex.sen_probs, logs, ex.bs,
            None if masks is None else masks.binary_sen, cfg.entropy_sen)
        loss_bas_rec = multistep_loss_bas(
            ex.br, logs, None if masks is None else masks.bas_rec)
        loss_bas_sen = multistep_loss_bas(
            ex.bs, logs, None if masks is None else masks.bas_sen)

    loss_rec = nll
    if cfg.use_binary:
        loss_rec = loss_rec + loss_binary_rec
        if not cfg.fixed_exchange:
            loss_rec = loss_rec + loss_binary_s
    loss_sen = loss_binary_sen

    total = loss_rec + loss_sen + loss_bas_rec + loss_bas_sen

    accuracy = topk_accuracy(dist, target, top_k, batch_denom)
    metrics = TrainMetrics(
        loss_rec=loss_rec, loss_sen=loss_sen, nll_loss=nll,
        loss_binary_rec=loss_binary_rec, loss_binary_s=loss_binary_s,
        loss_bas_rec=loss_bas_rec, loss_bas_sen=loss_bas_sen,
        ent_binary_sen=ent_sen, ent_binary_rec=ent_rec, ent_y_rec=ent_y,
        accuracy=accuracy, dist=dist, argmax=argmax, exchange=ex)
    return total, metrics


def _loss_fn_for(modules: AgentModules, fast: Any):
    """Select the loss computation: the fast batched-recompute path
    (game/fast_train.py, all configs) or the reference scan path.
    ``fast`` is True/False/"auto"/"pallas" ("pallas" additionally runs
    the sampling phase as one fused kernel — TPU only, non-attention
    configs)."""
    from multimodalgame_tpu.game.fast_train import (compute_losses_fast,
                                                    supports_fast)
    sampler = "pallas" if fast == "pallas" else "scan"
    use_fast = (supports_fast(modules.cfg) if fast == "auto" else bool(fast))

    def loss_fn(p, data, target, desc, key, desc_set_padded,
                desc_set_mask, data_context, top_k, batch_denom):
        if use_fast:
            return compute_losses_fast(modules, p, data, target, desc,
                                       key, top_k, batch_denom,
                                       sampler=sampler,
                                       desc_set_padded=desc_set_padded,
                                       desc_set_mask=desc_set_mask,
                                       data_context=data_context)
        return compute_losses(modules, p, data, target, desc, key,
                              desc_set_padded, desc_set_mask, data_context,
                              top_k, batch_denom)

    return loss_fn


def make_train_step(modules: AgentModules, top_k: int, batch_denom: int,
                    fast: Any = "auto"):
    """Build the jitted train step.

    Returns ``step(params, opt_states, data, target, desc, key,
    desc_set_padded=None, desc_set_mask=None, data_context=None)
    -> (params, opt_states, TrainMetrics)``.

    Parameter and optimizer-state buffers are donated, so updates happen
    in place on device. ``fast`` selects the batched-gradient path
    (default "auto": on for every config — fast_train.supports_fast).
    """
    cfg = modules.cfg
    tx = build_optimizer(cfg)
    loss_fn = _loss_fn_for(modules, fast)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_states, data, target, desc, key,
             desc_set_padded=None, desc_set_mask=None, data_context=None):
        grads, metrics = jax.grad(
            lambda p: loss_fn(
                p, data, target, desc, key, desc_set_padded,
                desc_set_mask, data_context, top_k, batch_denom),
            has_aux=True)(params)

        # With a continuous channel only the receiver trains; the reference
        # skips the other three optimizer steps entirely (model.py:1313-1330).
        update_names = AGENT_NAMES if cfg.use_binary else ("receiver",)
        new_params, new_opts = apply_agent_updates(
            tx, update_names, grads, params, opt_states)
        return new_params, new_opts, metrics

    return step


class ScanMetrics(NamedTuple):
    """Lean per-step scalars returned by the fused multi-step trainer."""
    loss_rec: jnp.ndarray      # (K,)
    loss_sen: jnp.ndarray      # (K,)
    nll_loss: jnp.ndarray      # (K,)
    loss_bas_rec: jnp.ndarray  # (K,)
    loss_bas_sen: jnp.ndarray  # (K,)
    accuracy: jnp.ndarray      # (K,)


def _opt_state_codec(state, params):
    """Build (to_flat, from_flat) converters that ravel every
    param-structured slot of an optax state (RMSprop ``nu``, Adam
    ``mu``/``nu``) into one vector, leaving scalar slots (``count``) and
    empty states untouched. Structure-only — safe to call on tracers."""
    from jax.flatten_util import ravel_pytree
    tdef = jax.tree_util.tree_structure(params)

    def is_match(x):
        return jax.tree_util.tree_structure(x) == tdef

    leaves, sdef = jax.tree_util.tree_flatten(state, is_leaf=is_match)
    matched = [is_match(leaf) for leaf in leaves]
    unravels = [ravel_pytree(leaf)[1] if m else None
                for leaf, m in zip(leaves, matched)]

    def to_flat(s):
        ls = jax.tree_util.tree_flatten(s, is_leaf=is_match)[0]
        return sdef.unflatten([
            ravel_pytree(leaf)[0] if m else leaf
            for leaf, m in zip(ls, matched)])

    def from_flat(fs):
        ls = jax.tree_util.tree_leaves(fs)
        return sdef.unflatten([
            u(leaf) if m else leaf
            for leaf, u, m in zip(ls, unravels, matched)])

    return to_flat, from_flat



def apply_agent_updates(tx, update_names, grads, params, opt_states):
    """One optimizer step per trained agent: the reference's four separate
    clip(1.0)/step calls (model.py:1307-1330) as per-agent optax chains.
    Shared by every trainer factory so the update rule cannot drift
    between the single-step, multistep, and indexed paths."""
    new_params = dict(params)
    new_opts = dict(opt_states)
    for name in update_names:
        updates, new_opts[name] = tx.update(
            grads[name], opt_states[name], params[name])
        new_params[name] = optax.apply_updates(params[name], updates)
    return new_params, new_opts


def _flat_carry(params, opt_states, update_names):
    """Ravel each trainable agent's parameter tree (and the
    param-structured slots of its optimizer state) into one vector.

    Updating an agent as a single contiguous vector turns the per-step
    optimizer work into ~6 large elementwise/reduce ops instead of ~6 ops
    × every leaf — the tiny-kernel latency (not FLOPs) is what dominates
    the update cost at this model size. Numerics are identical except for
    the float reassociation inside ``clip_by_global_norm``'s sum of
    squares (one fused reduction instead of a per-leaf partial-sum tree).

    Returns ``(flat_params, flat_opts, rebuild, unflatten)`` where
    ``rebuild(flat_params)`` reconstitutes the full params dict for the
    loss and ``unflatten(flat_params, flat_opts)`` converts the carry back
    to the external tree layout.
    """
    from jax.flatten_util import ravel_pytree

    flat_p = {}
    flat_s = {}
    unravel = {}
    codecs = {}
    for name in update_names:
        flat_p[name], unravel[name] = ravel_pytree(params[name])
        codecs[name] = _opt_state_codec(opt_states[name], params[name])
        flat_s[name] = codecs[name][0](opt_states[name])
    static = {n: params[n] for n in params if n not in update_names}

    def rebuild(fp):
        full = dict(static)
        for name in update_names:
            full[name] = unravel[name](fp[name])
        return full

    def unflatten(fp, fs):
        out_p = dict(static)
        out_s = dict(opt_states)
        for name in update_names:
            out_p[name] = unravel[name](fp[name])
            out_s[name] = codecs[name][1](fs[name])
        return out_p, out_s

    return flat_p, flat_s, rebuild, unflatten


def make_multistep_train_step(modules: AgentModules, top_k: int,
                              batch_denom: int, fast: Any = "auto",
                              flat: bool = True):
    """Device-side training loop: one compiled program runs K optimizer
    updates via ``lax.scan`` over K staged batches.

    This is the TPU-native throughput path: per-update host dispatch cost
    (round-trips through the runtime, ~ms under a remote tunnel) is
    amortized over the whole chunk, leaving pure device time per step.
    The reference's loop pays a host round-trip *per sample draw*
    (SURVEY §3.1); the single-step path pays one per update; this path
    pays one per K updates.

    ``flat=True`` (default) carries each agent's parameters/optimizer
    state through the scan as one raveled vector (see ``_flat_carry``) —
    same math, far fewer tiny kernels per update. The external tree API
    is unchanged (conversion happens once per chunk).

    Returns ``chunk(params, opt_states, data (K,B,...), target (K,B),
    desc, keys (K,key), desc_set_padded=None, desc_set_mask=None,
    data_context=None (K,B,C)) -> (params, opt_states, ScanMetrics)``.
    """
    cfg = modules.cfg
    tx = build_optimizer(cfg)
    update_names = AGENT_NAMES if cfg.use_binary else ("receiver",)
    loss_fn = _loss_fn_for(modules, fast)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def chunk(params, opt_states, data, target, desc, keys,
              desc_set_padded=None, desc_set_mask=None, data_context=None):
        if flat:
            flat_p, flat_s, rebuild, unflatten = _flat_carry(
                params, opt_states, update_names)
        else:
            flat_p, flat_s = params, opt_states
            rebuild = lambda p: p  # noqa: E731
            unflatten = lambda p, s: (p, s)  # noqa: E731

        def body(carry, xs):
            params, opt_states = carry
            b_data, b_target, key, b_ctx = xs
            grads, m = jax.grad(
                lambda p: loss_fn(rebuild(p), b_data, b_target, desc, key,
                                  desc_set_padded, desc_set_mask, b_ctx,
                                  top_k, batch_denom),
                has_aux=True)(params)
            new_params, new_opts = apply_agent_updates(
                tx, update_names, grads, params, opt_states)
            out = ScanMetrics(m.loss_rec, m.loss_sen, m.nll_loss,
                              m.loss_bas_rec, m.loss_bas_sen, m.accuracy)
            return (new_params, new_opts), out

        xs = (data, target, keys, data_context)
        (p, o), metrics = jax.lax.scan(body, (flat_p, flat_s), xs)
        p, o = unflatten(p, o)
        return p, o, metrics

    return chunk


def make_train_step_indexed(modules: AgentModules, top_k: int,
                            batch_denom: int, fast: Any = "auto",
                            transform=None, context_fn=None):
    """Single full-metrics train step over a *device-resident* dataset
    (data/device_dataset.py): the batch is gathered on device from the
    staged feature array by a ``(B,)`` index row, so no per-step H2D
    transfer ever happens (the tunnel moves ~30 MB/s; the gather is free).

    Returns ``step(params, opt_states, feats, targets, idx, desc, key,
    step0=None, feats_context=None, desc_set_padded=None,
    desc_set_mask=None) -> (params, opt_states, TrainMetrics)``.

    With ``step0`` (a global step index), the step's PRNG key derives
    inside the program as ``fold_in(key, step0)`` — the same per-step
    formula as :func:`make_multistep_train_step_indexed`, so a boundary
    step dispatched alone uses exactly the key a chunk covering that
    step would, and the trajectory is invariant to how the driver
    partitions steps into dispatches. ``step0=None`` keeps the caller's
    key untouched (legacy/eval-style explicit key handling).

    ``transform`` (optional, static) maps the gathered batch before the
    game — e.g. the CIFAR path stages uint8 pixels and normalizes on
    device, fused into the step (game/driver.py). ``context_fn``
    (optional, static) derives the attention fc context from the
    transformed batch when no separate context array is staged — the
    CIFAR fc context is the same flattened pixels (model.py:1195-1206),
    so staging a second copy would double the HBM footprint for data the
    step can reshape for free.
    """
    cfg = modules.cfg
    tx = build_optimizer(cfg)
    update_names = AGENT_NAMES if cfg.use_binary else ("receiver",)
    loss_fn = _loss_fn_for(modules, fast)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_states, feats, targets, idx, desc, key,
             step0=None, feats_context=None, desc_set_padded=None,
             desc_set_mask=None):
        if step0 is not None:
            key = jax.random.fold_in(key, step0)
        data = feats[idx]
        if transform is not None:
            data = transform(data)
        target = targets[idx]
        ctx = feats_context[idx] if feats_context is not None else None
        if ctx is None and context_fn is not None:
            ctx = context_fn(data)
        grads, metrics = jax.grad(
            lambda p: loss_fn(p, data, target, desc, key, desc_set_padded,
                              desc_set_mask, ctx, top_k, batch_denom),
            has_aux=True)(params)
        new_params, new_opts = apply_agent_updates(
            tx, update_names, grads, params, opt_states)
        return new_params, new_opts, metrics

    return step


def make_multistep_train_step_indexed(modules: AgentModules, top_k: int,
                                      batch_denom: int, fast: Any = "auto",
                                      flat: bool = True, transform=None,
                                      context_fn=None):
    """Device-side K-step training loop over a device-resident dataset.

    Like :func:`make_multistep_train_step`, but each scan step gathers its
    batch from the staged ``(N, ...)`` feature array via a ``(K, B)`` index
    plan, and the K per-step PRNG keys are derived on device as
    ``fold_in(key, step0 + i)`` — indexed by GLOBAL step, not by position
    within the dispatch, so the sampled trajectory is invariant to how a
    run is partitioned into chunks (512+487 == 999 == 1 boundary + 998),
    a resumed run replays the exact per-step streams, and the driver
    reuses ONE device-resident base key for every dispatch (zero
    host-side key ops in the hot loop — each eager ``split`` is a tunnel
    round trip on this hardware). One host dispatch and zero H2D data
    traffic per K optimizer updates — this is the CLI training driver's
    hot path (game/driver.py).

    Returns ``chunk(params, opt_states, feats, targets, idx (K, B), desc,
    key, step0=0, feats_context=None, desc_set_padded=None,
    desc_set_mask=None) -> (params, opt_states, ScanMetrics)``. The jit
    specializes on the chunk length K (the driver bounds the set of
    distinct K values — see game/driver.py chunk planning).
    """
    cfg = modules.cfg
    tx = build_optimizer(cfg)
    update_names = AGENT_NAMES if cfg.use_binary else ("receiver",)
    loss_fn = _loss_fn_for(modules, fast)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def chunk(params, opt_states, feats, targets, idx, desc, key,
              step0=0, feats_context=None, desc_set_padded=None,
              desc_set_mask=None):
        steps = (jnp.asarray(step0, jnp.int32)
                 + jnp.arange(idx.shape[0], dtype=jnp.int32))
        keys = jax.vmap(lambda s: jax.random.fold_in(key, s))(steps)
        if flat:
            flat_p, flat_s, rebuild, unflatten = _flat_carry(
                params, opt_states, update_names)
        else:
            flat_p, flat_s = params, opt_states
            rebuild = lambda p: p  # noqa: E731
            unflatten = lambda p, s: (p, s)  # noqa: E731

        def body(carry, xs):
            params, opt_states = carry
            b_idx, b_key = xs
            data = feats[b_idx]
            if transform is not None:
                data = transform(data)
            target = targets[b_idx]
            ctx = (feats_context[b_idx]
                   if feats_context is not None else None)
            if ctx is None and context_fn is not None:
                ctx = context_fn(data)
            grads, m = jax.grad(
                lambda p: loss_fn(rebuild(p), data, target, desc, b_key,
                                  desc_set_padded, desc_set_mask, ctx,
                                  top_k, batch_denom),
                has_aux=True)(params)
            new_params, new_opts = apply_agent_updates(
                tx, update_names, grads, params, opt_states)
            out = ScanMetrics(m.loss_rec, m.loss_sen, m.nll_loss,
                              m.loss_bas_rec, m.loss_bas_sen, m.accuracy)
            return (new_params, new_opts), out

        (p, o), metrics = jax.lax.scan(body, (flat_p, flat_s),
                                       (idx, keys))
        p, o = unflatten(p, o)
        return p, o, metrics

    return chunk


def make_eval_exchange(modules: AgentModules, use_pallas: bool = False):
    """Build the jitted eval-mode exchange used by eval_dev, extraction,
    and the train loop's sample dumps (rounded messages, cumulative stop
    product — model.py:640, 1463-1465).

    ``use_pallas=True`` routes eligible configs through the fused
    whole-conversation Pallas kernel (ops/pallas_exchange.py) — identical
    outputs, single kernel launch. Ineligible configs silently use the
    lax.scan path.
    """
    cfg = modules.cfg
    pallas_ok = False
    if use_pallas:
        from multimodalgame_tpu.ops.pallas_exchange import supports_config
        pallas_ok = supports_config(cfg)

    @functools.partial(jax.jit, static_argnames=("use_corrupt",))
    def run(params, data, desc, key, desc_set_padded=None,
            desc_set_mask=None, data_context=None, corrupt_mask=None,
            use_corrupt=False):
        # Mosaic can't lower the kernel's cross-class reductions below a
        # full 8-sublane tile; small batches silently use the scan path.
        if (pallas_ok and data.shape[0] >= 8
                and desc_set_padded is None and data_context is None):
            from multimodalgame_tpu.ops.pallas_exchange import (
                fused_eval_exchange)
            f = fused_eval_exchange(
                cfg, params, data, desc,
                corrupt_mask=corrupt_mask if use_corrupt else None)
            batch = data.shape[0]
            stop_masks, n_steps = finalize_stop_masks(f.masks,
                                                      cfg.fixed_exchange)
            zeros = jnp.zeros((cfg.max_exchange, batch, 1), jnp.float32)
            return ExchangeOutputs(
                stop_masks=stop_masks, stop_feats=f.stop_feats,
                stop_probs=f.stop_probs, sen_feats=f.sen_feats,
                sen_probs=f.sen_probs, rec_feats=f.rec_feats,
                rec_probs=f.rec_probs, y=f.y, bs=zeros, br=zeros,
                n_steps=n_steps, attn_scores=None)
        return exchange(modules, params, data, desc, key, train=False,
                        desc_set_padded=desc_set_padded,
                        desc_set_mask=desc_set_mask,
                        data_context=data_context,
                        corrupt_mask=corrupt_mask if use_corrupt else None)

    return run
