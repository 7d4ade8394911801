"""Data-parallel scale-out over a ``jax.sharding.Mesh``.

The reference is strictly single-process / single-device (SURVEY §2
parallelism note: no torch.distributed/NCCL anywhere); scale-out is a new
first-class capability of this framework. The strategy that fits this
model family is **data parallelism over episode batches**: parameters and
descriptions replicated, image batches and targets sharded on the batch
axis, with XLA's SPMD partitioner inserting the gradient all-reduce
(``psum`` over ICI) automatically from the sharding annotations — the
canonical JAX recipe (annotate shardings; let XLA place collectives).

The batch-global reductions inside the loss (masked advantage std over
the whole batch, mask-sum denominators, ``n_steps``) become cross-device
collectives under the same mechanism, so sharded results are numerically
identical to single-device execution (verified in
tests/test_parallel.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multimodalgame_tpu.game.agents import AgentModules
from multimodalgame_tpu.game.train import (_loss_fn_for,
                                           apply_agent_updates,
                                           build_optimizer)


BATCH_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[list] = None) -> Mesh:
    """A 1-D mesh over the batch axis (ICI within a slice)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} devices are available")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (BATCH_AXIS,))


def _put(tree, sharding):
    """Whole-tree ``device_put`` (batched transfers) on single-process
    meshes; per-leaf :func:`distributed.put_global` on meshes spanning
    processes (each process materializes its addressable shards from its
    local copy of the same host value)."""
    if sharding.is_fully_addressable:
        return jax.device_put(tree, sharding)
    from multimodalgame_tpu.parallel.distributed import put_global
    return jax.tree_util.tree_map(lambda x: put_global(x, sharding), tree)


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated on the mesh."""
    return _put(tree, NamedSharding(mesh, P()))


def shard_batch(tree, mesh: Mesh):
    """Shard every leaf's leading (batch) axis across the mesh."""
    return _put(tree, NamedSharding(mesh, P(BATCH_AXIS)))


def axis_placer(mesh: Mesh, axis: int = -1):
    """Placement function sharding ``axis`` over the mesh's *data* axis
    when its length divides that axis's extent, replicating otherwise
    (ragged tails — e.g. a truncated final dev batch). The shared helper
    behind the driver's batch-index rows, the serving batch axis, and the
    dryrun sweeps.

    The divisibility gate uses the data-axis extent, NOT ``mesh.size``:
    on a 2-D ``(data, model)`` mesh a batch only has to divide the data
    axis (matching ``driver.resolve_mesh``'s validation) — gating on the
    full device count would silently replicate every batch row on any
    config where ``batch % (data*model) != 0`` (advisor round-3 #1)."""
    rep = NamedSharding(mesh, P())
    n_data = mesh.shape[BATCH_AXIS]

    def place(x):
        if x is None:
            return x
        ndim = np.ndim(x)
        ax = axis % ndim
        if np.shape(x)[ax] % n_data:
            return _put(x, rep)
        spec = [None] * ndim
        spec[ax] = BATCH_AXIS
        return _put(x, NamedSharding(mesh, P(*spec)))

    return place


def make_sharded_train_step(modules: AgentModules, top_k: int,
                            batch_denom: int, mesh: Mesh,
                            fast="auto"):
    """Data-parallel variant of ``game.train.make_train_step``.

    Same signature and semantics. Callers place inputs with
    :func:`replicate` (params, optimizer state, descriptions, key) and
    :func:`shard_batch` (data, target, data_context); jit follows the
    argument shardings and XLA inserts the psum gradient all-reduce. The
    batch size must divide the mesh size.
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
        update_names = (("sender", "receiver", "baseline_sen",
                         "baseline_rec") if cfg.use_binary
                        else ("receiver",))
        new_params, new_opts = apply_agent_updates(
            tx, update_names, grads, params, opt_states)
        return new_params, new_opts, metrics

    return step
