"""Population training: N independent games in one compiled program.

A TPU-native capability with no reference counterpart: the reference
trains one (Sender, Receiver, 2×Baseline) quadruple per process
(model.py:1001-1592); sweeping seeds or learning rates means N serial
runs. Here the whole population trains simultaneously — parameters carry
a leading ``(N, ...)`` member axis and the per-step (gradient + four
clipped optimizer updates) is ``jax.vmap``-ed over it, so every small
matmul in the game becomes an ``N``-wide batched op. At the canonical
scale one v5e chip is latency- (not FLOP-) bound, so a 16-member
population costs far less than 16× a single game (see PERFORMANCE.md).

Semantics: members share the data stream (same batches in the same
order — the reference's seeded shuffle is a property of the dataset
epoch, not the model) but differ in parameter init seeds, per-step
sampling keys, and optionally per-member learning-rate scales.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from multimodalgame_tpu.game.agents import AgentModules, init_params
from multimodalgame_tpu.game.train import (AGENT_NAMES, ScanMetrics,
                                           _loss_fn_for, _opt_state_codec,
                                           build_optimizer, init_opt_states)


def init_population(modules: AgentModules, key: jax.Array, n: int,
                    num_classes: int, max_words: int = 3) -> Dict[str, Any]:
    """Stacked parameter trees for ``n`` members: leaf shapes ``(n, ...)``.
    Member ``i`` equals ``init_params(modules, split(key, n)[i], ...)``."""
    keys = jax.random.split(key, n)
    return jax.vmap(
        lambda k: init_params(modules, k, num_classes=num_classes,
                              max_words=max_words))(keys)


def init_population_opt_states(cfg, pop_params: Dict[str, Any]
                               ) -> Dict[str, Any]:
    """Per-member optimizer states, stacked like the parameters."""
    return jax.vmap(lambda p: init_opt_states(cfg, p))(pop_params)


def member_params(pop_params: Dict[str, Any], i: int) -> Dict[str, Any]:
    """Extract member ``i``'s parameter trees (e.g. to checkpoint the
    sweep winner in the standard single-game layout)."""
    return jax.tree_util.tree_map(lambda x: x[i], pop_params)


def split_population_keys(key: jax.Array, k: int, n: int) -> jax.Array:
    """``(K, N)`` per-step per-member sampling keys."""
    return jax.random.split(key, k * n).reshape(k, n, -1)


def make_population_train_step(modules: AgentModules, top_k: int,
                               batch_denom: int, fast: Any = "auto",
                               flat: bool = False):
    """Build the jitted population chunk trainer.

    Returns ``chunk(pop_params, pop_opts, data (K,B,...), target (K,B),
    desc, keys (K,N,keydim), lr_scale=None (N,))
    -> (pop_params, pop_opts, ScanMetrics with (K, N) leaves)``.

    ``lr_scale`` multiplies each member's updates (the learning rate
    enters every supported rule — SGD/Adam/RMSprop — as a final linear
    scale), turning the seed sweep into a joint seed × learning-rate
    sweep at zero extra compute.

    ``flat=True`` carries each trained agent's population parameters
    (and the param-structured optimizer slots) through the scan as one
    ``(N, P)`` matrix instead of N-stacked trees — the single-game
    flat-carry trick (game/train.py:_flat_carry) lifted over the member
    axis. Measured SLOWER on TPU than the stacked default (median 821
    vs 885 game-steps/s at N=16, interleaved A/B in both orders — see
    PERFORMANCE.md round 4): unlike the single-game case, the member
    axis already batches every optimizer leaf into an ``(N, leaf)`` op
    under ``vmap``, so raveling buys no kernel-count reduction and pays
    reshape/concat traffic every step (plus a ~10x longer compile).
    Kept as a validated, equality-tested alternative (the Pallas-kernel
    precedent); numerics differ only by the float reassociation inside
    ``clip_by_global_norm``'s sum of squares. The external stacked-tree
    API is unchanged (conversion happens once per chunk), and the
    member axis stays the leading axis of every carried array, so
    population sharding (``shard_population``) still needs zero
    collectives.
    """
    cfg = modules.cfg
    tx = build_optimizer(cfg)
    update_names = AGENT_NAMES if cfg.use_binary else ("receiver",)
    loss_fn = _loss_fn_for(modules, fast)

    def member_update(params, opt_states, data, target, desc, key, scale,
                      desc_set_padded, desc_set_mask, data_context):
        grads, m = jax.grad(
            lambda p: loss_fn(p, data, target, desc, key,
                              desc_set_padded, desc_set_mask,
                              data_context, top_k, batch_denom),
            has_aux=True)(params)
        new_params = dict(params)
        new_opts = dict(opt_states)
        for name in update_names:
            updates, new_opts[name] = tx.update(
                grads[name], opt_states[name], params[name])
            updates = jax.tree_util.tree_map(lambda u: u * scale, updates)
            new_params[name] = optax.apply_updates(params[name], updates)
        out = ScanMetrics(m.loss_rec, m.loss_sen, m.nll_loss,
                          m.loss_bas_rec, m.loss_bas_sen, m.accuracy)
        return new_params, new_opts, out

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def chunk(pop_params, pop_opts, data, target, desc, keys,
              lr_scale: Optional[jnp.ndarray] = None,
              desc_set_padded=None, desc_set_mask=None,
              data_context=None):
        n = keys.shape[1]
        scale = (jnp.ones((n,), jnp.float32) if lr_scale is None
                 else jnp.asarray(lr_scale, jnp.float32))

        if flat:
            return _flat_chunk(pop_params, pop_opts, data, target, desc,
                               keys, scale, desc_set_padded, desc_set_mask,
                               data_context)

        def body(carry, xs):
            pp, po = carry
            b_data, b_target, b_keys, b_ctx = xs
            npp, npo, m = jax.vmap(
                member_update,
                in_axes=(0, 0, None, None, None, 0, 0, None, None,
                         None))(
                pp, po, b_data, b_target, desc, b_keys, scale,
                desc_set_padded, desc_set_mask, b_ctx)
            return (npp, npo), m

        (pp, po), metrics = jax.lax.scan(
            body, (pop_params, pop_opts),
            (data, target, keys, data_context))
        return pp, po, metrics

    def _flat_chunk(pop_params, pop_opts, data, target, desc, keys, scale,
                    desc_set_padded, desc_set_mask, data_context):
        from jax.flatten_util import ravel_pytree

        # Codecs are structure-only, built from member-0 slices (every
        # member shares the tree layout); safe on tracers.
        member0_p = jax.tree_util.tree_map(lambda x: x[0], pop_params)
        unravel, codecs, flat_p, flat_s = {}, {}, {}, {}
        for name in update_names:
            _, unravel[name] = ravel_pytree(member0_p[name])
            flat_p[name] = jax.vmap(lambda p: ravel_pytree(p)[0])(
                pop_params[name])
            member0_s = jax.tree_util.tree_map(lambda x: x[0],
                                               pop_opts[name])
            codecs[name] = _opt_state_codec(member0_s, member0_p[name])
            flat_s[name] = jax.vmap(codecs[name][0])(pop_opts[name])
        static = {n: pop_params[n] for n in pop_params
                  if n not in update_names}

        def member_update_flat(fp, fs, static_m, data, target, desc, key,
                               scale, desc_set_padded, desc_set_mask,
                               data_context):
            def loss(fpv):
                full = dict(static_m)
                for name in update_names:
                    full[name] = unravel[name](fpv[name])
                return loss_fn(full, data, target, desc, key,
                               desc_set_padded, desc_set_mask,
                               data_context, top_k, batch_denom)

            grads, m = jax.grad(loss, has_aux=True)(fp)
            new_fp, new_fs = dict(fp), dict(fs)
            for name in update_names:
                updates, new_fs[name] = tx.update(
                    grads[name], fs[name], fp[name])
                new_fp[name] = optax.apply_updates(
                    fp[name], updates * scale)
            out = ScanMetrics(m.loss_rec, m.loss_sen, m.nll_loss,
                              m.loss_bas_rec, m.loss_bas_sen, m.accuracy)
            return new_fp, new_fs, out

        def body(carry, xs):
            fp, fs = carry
            b_data, b_target, b_keys, b_ctx = xs
            nfp, nfs, m = jax.vmap(
                member_update_flat,
                in_axes=(0, 0, 0, None, None, None, 0, 0, None, None,
                         None))(
                fp, fs, static, b_data, b_target, desc, b_keys, scale,
                desc_set_padded, desc_set_mask, b_ctx)
            return (nfp, nfs), m

        (fp, fs), metrics = jax.lax.scan(
            body, (flat_p, flat_s), (data, target, keys, data_context))

        out_p = dict(static)
        out_s = dict(pop_opts)
        for name in update_names:
            out_p[name] = jax.vmap(unravel[name])(fp[name])
            out_s[name] = jax.vmap(codecs[name][1])(fs[name])
        return out_p, out_s, metrics

    return chunk


def shard_population(pop_tree, mesh):
    """Shard the leading member axis across the mesh.

    Members are independent, so population parallelism is the cheapest
    possible scale-out: each device trains its own member shard with
    ZERO collectives (the batch, descriptions, and step keys' K axis are
    replicated; only the member axis is split). The jitted population
    chunk needs no changes — computation follows the argument shardings
    and the XLA SPMD partitioner splits the vmapped member axis. With 8
    devices a 128-member sweep runs at the per-device cost of 16.

    Use with ``parallel.mesh.make_mesh`` and ``replicate`` for the
    shared inputs; the mesh size must divide the member count (enforced
    by the sweep driver, sweep.py).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    from multimodalgame_tpu.parallel.mesh import BATCH_AXIS
    return jax.device_put(pop_tree, NamedSharding(mesh, P(BATCH_AXIS)))


def shard_population_keys(keys, mesh):
    """Place ``(K, N, keydim)`` step keys with the member axis sharded."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from multimodalgame_tpu.parallel.mesh import BATCH_AXIS
    return jax.device_put(keys, NamedSharding(mesh, P(None, BATCH_AXIS)))


def make_population_eval(modules: AgentModules, top_k: int):
    """Jitted per-member dev accuracy on one batch: returns ``(N,)``
    top-k correct counts (eval-mode exchange, masked prediction
    selection — the same math as eval.py per member)."""
    from multimodalgame_tpu.game.exchange import exchange
    from multimodalgame_tpu.game.losses import get_rec_outp
    from multimodalgame_tpu.game.masks import assemble_loss_masks
    cfg = modules.cfg

    def member_correct(params, data, target, desc, key,
                       desc_set_padded, desc_set_mask, data_context):
        ex = exchange(modules, params, data, desc, key, train=False,
                      desc_set_padded=desc_set_padded,
                      desc_set_mask=desc_set_mask,
                      data_context=data_context)
        masks = (None if cfg.fixed_exchange
                 else assemble_loss_masks(ex.stop_masks))
        outp, _ = get_rec_outp(ex.y, None if masks is None else masks.y)
        dist = jax.nn.log_softmax(outp, axis=-1)
        # Rank counting, k clamped to the class count (same semantics
        # and rationale as losses.topk_accuracy: no TopK custom-call, so
        # the member-sharded eval stays collective-free).
        tscore = jnp.take_along_axis(dist, target[:, None], axis=-1)
        rank = jnp.sum(dist > tscore, axis=-1)
        hit = rank < min(top_k, dist.shape[-1])
        return jnp.sum(hit.astype(jnp.int32))

    @jax.jit
    def batch_correct(pop_params, data, target, desc, keys,
                      desc_set_padded=None, desc_set_mask=None,
                      data_context=None):
        return jax.vmap(member_correct,
                        in_axes=(0, None, None, None, 0, None, None,
                                 None))(
            pop_params, data, target, desc, keys, desc_set_padded,
            desc_set_mask, data_context)

    return batch_correct
