"""Multi-host (multi-process) data parallelism over DCN + ICI.

Single-process scale-out (parallel/mesh.py) covers one TPU slice; this
module extends the same data-parallel strategy across *processes* — the
multi-host topology where each host drives its local chips and gradient
all-reduce crosses hosts over DCN. The recipe is unchanged JAX SPMD:
``jax.distributed.initialize`` first, then a global mesh over
``jax.devices()`` (every chip in the job), params replicated, batches
sharded; XLA routes within-slice collective hops over ICI and cross-host
hops over DCN automatically for a 1-D data axis.

The reference has no distributed code at all (SURVEY §5.8); this is the
scale-out axis the north star adds. Launch pattern (one process per
host):

    python -c "
    from multimodalgame_tpu.parallel import distributed
    distributed.initialize('host0:8476', num_processes=N, process_id=i)
    ..."

Testable without hardware: ``dryrun_multihost`` runs one full
data-parallel training step with each process holding only its local
shard of the batch; tests/test_distributed.py launches 2 CPU processes
(2 virtual devices each, gloo collectives) and checks both agree with
the single-process result.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def initialize(coordinator_address: str, num_processes: int,
               process_id: int,
               local_device_ids: Optional[list] = None) -> None:
    """``jax.distributed.initialize`` with the CPU-backend fallback wired
    (gloo collectives) so multi-process runs work on any machine."""
    import jax

    # Required for CPU cross-process collectives; ignored by TPU jobs
    # (their collectives ride ICI/DCN through the TPU runtime).
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id,
                               local_device_ids=local_device_ids)


def global_mesh():
    """1-D data mesh over every device in the job (all processes)."""
    import jax
    from multimodalgame_tpu.parallel.mesh import make_mesh

    return make_mesh(devices=jax.devices())


def put_global(x, sharding):
    """``jax.device_put`` that also works when ``sharding`` spans
    processes, PROVIDED every process holds the same full host value —
    true throughout this framework (each process loads the same dataset
    files, draws the same seeds, and computes the same shuffle plans), so
    no cross-process data distribution is ever needed: each process just
    materializes its own addressable shards by slicing its local copy."""
    import jax

    if getattr(sharding, "is_fully_addressable", True):
        return jax.device_put(x, sharding)
    arr = np.asarray(x)
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])


def host_view(x) -> np.ndarray:
    """``np.asarray`` for possibly-cross-process ``jax.Array``s.

    Replicated global arrays read from the local shard (every device
    holds the full value — zero communication); sharded ones all-gather
    (a collective: every process must call this on the same arrays in
    the same order, which holds because all processes execute the same
    driver loop). Single-process arrays pass straight through."""
    import jax

    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        if x.sharding.is_fully_replicated:
            return np.asarray(x.addressable_data(0))
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def prefetch_host_async(xs) -> None:
    """Start device->host copies NOW for arrays a later
    :func:`host_view_many` / ``jax.device_get`` will materialize.

    ``copy_to_host_async`` caches its in-flight future on the array, so
    issuing it at event-ENQUEUE time (the moment a deferred log payload,
    dev payload, accuracy backlog entry, or checkpoint snapshot is
    created) lets the transfer ride under the next window's compute and
    dispatch; by flush time the future has usually resolved and the
    materializing call pays ~zero tunnel wait instead of a round trip
    plus transfer per flush (PERFORMANCE.md round-5 cadence
    decomposition). Non-fully-addressable arrays are skipped: their
    flush path is either a collective gather (must stay at flush, every
    process in the same order) or reads ``addressable_data(0)``, whose
    fresh wrapper object would not see a future cached here."""
    import jax

    for x in xs:
        if isinstance(x, jax.Array) and x.is_fully_addressable:
            x.copy_to_host_async()


def host_view_many(xs) -> list:
    """:func:`host_view` over a sequence, pipelined.

    One blocking device->host read costs ~a full tunnel round trip
    *regardless of size* (utils/device_pack.py), so N serial
    ``host_view`` calls cost N round trips. This variant issues every
    copy before materializing any (``jax.device_get`` starts
    ``copy_to_host_async`` on all leaves first — the same trick as
    checkpoint ``_to_host``), so N arrays cost ~one round trip. Arrays
    that genuinely need a cross-process collective gather (sharded,
    non-addressable, not locally coverable) fall back to per-array
    :func:`host_view`, preserving its same-order-on-every-process
    contract."""
    import jax

    prepared = []      # (slot, leaf-for-device_get) — pipelined path
    out = [None] * len(xs)
    for i, x in enumerate(xs):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            if x.sharding.is_fully_replicated:
                prepared.append((i, x.addressable_data(0)))
            else:
                out[i] = host_view(x)  # collective gather (rare path)
        else:
            prepared.append((i, x))
    fetched = jax.device_get([leaf for _, leaf in prepared])
    for (i, _), val in zip(prepared, fetched):
        out[i] = np.asarray(val)
    return out


def reassemble_local(x) -> "np.ndarray | None":
    """Rebuild a cross-process array's full host value from this
    process's *addressable* shards alone — no communication.

    Coverage holds whenever every distinct shard is present on some
    local device, which is true for every placement the drivers
    produce: DP/population state is replicated; ``make_mesh_2d`` lays
    the model axis innermost, so Megatron shards (replicated over the
    cross-process data axis) all land on each process. Returns ``None``
    when local shards don't cover the value (a model axis genuinely
    spanning processes) — the caller must then gather collectively
    (:func:`host_view`), with every process participating."""
    out = np.empty(x.shape, x.dtype)
    mask = np.zeros(x.shape, bool)
    for sh in x.addressable_shards:
        out[sh.index] = np.asarray(sh.data)
        mask[sh.index] = True
    return out if mask.all() else None


def covers_locally(x) -> bool:
    """Index-only version of :func:`reassemble_local`'s coverage check
    (no shard data fetched) — lets callers decide *whether* a collective
    gather will be needed before touching any data."""
    mask = np.zeros(x.shape, bool)
    for sh in x.addressable_shards:
        mask[sh.index] = True
    return bool(mask.all())


def replicate_global(tree, mesh):
    """Replicate host values onto a (possibly multi-process) mesh.

    Every process must pass the same value — true by construction here
    since parameter init is a deterministic function of the PRNG key.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sh, np.asarray(x)), tree)


def shard_batch_global(tree, mesh):
    """Assemble global batch arrays from per-process local shards.

    Each process passes only ITS rows (its local slice of the global
    batch); the result is a global array sharded over the data axis whose
    per-device pieces live where their process put them.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from multimodalgame_tpu.parallel.mesh import BATCH_AXIS

    sh = NamedSharding(mesh, P(BATCH_AXIS))
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sh, np.asarray(x)), tree)


def _dryrun_setup():
    """The shared tiny config + deterministic batch builder behind
    :func:`dryrun_multihost` and :func:`dryrun_reference` (same seeds so
    the multi-process run is checkable against an in-process mesh)."""
    from multimodalgame_tpu.game.agents import AgentModules
    from multimodalgame_tpu.game.config import GameConfig

    cfg = GameConfig(
        img_feat="avgpool_512", img_feat_dim=512, img_h_dim=32,
        sender_out_dim=32, rec_w_dim=32, rec_hidden=16, wv_dim=100,
        max_exchange=3, fixed_exchange=False,
        entropy_s=0.08, entropy_sen=0.01, entropy_rec=0.01,
        learning_rate=1e-4, optim_type="RMSprop")
    num_classes = 5

    def batch_of(n: int):
        rng = np.random.RandomState(0)
        return (rng.randn(n, 512).astype(np.float32),
                rng.randint(0, num_classes, size=n),
                rng.randn(num_classes, 100).astype(np.float32))

    return cfg, AgentModules(cfg), num_classes, batch_of


def dryrun_reference(global_devices: int) -> dict:
    """The dryrun step computed in ONE process on a ``global_devices``
    mesh with the same seeds/global batch — what the multi-process run
    must reproduce (requires that many local devices)."""
    import jax

    from multimodalgame_tpu.game.agents import init_params
    from multimodalgame_tpu.game.train import init_opt_states
    from multimodalgame_tpu.parallel.mesh import (make_mesh,
                                                  make_sharded_train_step,
                                                  replicate, shard_batch)

    cfg, modules, num_classes, batch_of = _dryrun_setup()
    batch = 2 * global_devices
    mesh = make_mesh(global_devices)
    data, target, desc = batch_of(batch)
    params = replicate(init_params(modules, jax.random.PRNGKey(0),
                                   num_classes=num_classes), mesh)
    opts = replicate(init_opt_states(cfg, jax.device_get(params)), mesh)
    step = make_sharded_train_step(modules, top_k=3, batch_denom=batch,
                                   mesh=mesh)
    _, _, m = step(params, opts, shard_batch(data, mesh),
                   shard_batch(target, mesh), replicate(desc, mesh),
                   replicate(jax.random.PRNGKey(1), mesh))
    return {"loss_rec": float(m.loss_rec), "loss_sen": float(m.loss_sen),
            "accuracy": float(m.accuracy)}


def dryrun_multihost(coordinator_address: str, num_processes: int,
                     process_id: int) -> dict:
    """One full data-parallel training step across processes.

    Each process stages only its local slice of a deterministic global
    batch, runs the fused four-optimizer step over the global mesh, and
    returns the (replicated) metrics — which every process can check
    against a locally-computed single-device reference because the batch
    is reconstructible from the seed.
    """
    initialize(coordinator_address, num_processes, process_id)

    import jax

    from multimodalgame_tpu.game.agents import init_params
    from multimodalgame_tpu.game.train import init_opt_states
    from multimodalgame_tpu.parallel.mesh import make_sharded_train_step

    cfg, modules, num_classes, batch_of = _dryrun_setup()
    n_devices = jax.device_count()
    per_device = 2
    batch = per_device * n_devices

    mesh = global_mesh()
    params = init_params(modules, jax.random.PRNGKey(0),
                         num_classes=num_classes)
    opt_states = init_opt_states(cfg, params)

    # Deterministic global batch; every process slices out its rows.
    data, target, desc = batch_of(batch)

    rows_per_proc = batch // num_processes
    lo = process_id * rows_per_proc
    hi = lo + rows_per_proc

    g_params = replicate_global(params, mesh)
    g_opts = replicate_global(opt_states, mesh)
    g_desc = replicate_global(desc, mesh)
    g_key = replicate_global(
        np.asarray(jax.random.PRNGKey(1)), mesh)
    g_data, g_target = shard_batch_global(
        (data[lo:hi], target[lo:hi]), mesh)

    step = make_sharded_train_step(modules, top_k=3, batch_denom=batch,
                                   mesh=mesh)
    _, _, metrics = step(g_params, g_opts, g_data, g_target, g_desc, g_key)
    out = {
        "process_id": process_id,
        "num_processes": num_processes,
        "global_devices": n_devices,
        "loss_rec": float(metrics.loss_rec),
        "loss_sen": float(metrics.loss_sen),
        "accuracy": float(metrics.accuracy),
    }
    assert np.isfinite(out["loss_rec"]) and np.isfinite(out["loss_sen"])

    if n_devices >= 4:
        # Multi-host TENSOR parallelism (round 4): the same step on a
        # 2-D (data, model) global mesh with Megatron-placed params
        # (placement via put_global; XLA derives the row-parallel psum
        # across the model axis exactly as single-process). Same seeds
        # and global batch, so checkable against the same reference.
        from jax.sharding import NamedSharding, PartitionSpec as P
        from multimodalgame_tpu.parallel.tensor import (
            make_mesh_2d, shard_params_tp, tp_param_specs,
            place_opt_states_tp)

        mesh2 = make_mesh_2d(n_devices // 2, 2)
        specs = tp_param_specs(params, 2)
        tp_params = shard_params_tp(params, mesh2, specs)
        tp_opts = place_opt_states_tp(opt_states, mesh2, specs)
        g2_desc = replicate_global(desc, mesh2)
        g2_key = replicate_global(np.asarray(jax.random.PRNGKey(1)), mesh2)
        g2_data, g2_target = jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                NamedSharding(mesh2, P("data")), np.asarray(x)),
            (data[lo:hi], target[lo:hi]))
        step2 = make_sharded_train_step(modules, top_k=3,
                                        batch_denom=batch, mesh=mesh2)
        tp_params, tp_opts, m2 = step2(tp_params, tp_opts, g2_data,
                                       g2_target, g2_desc, g2_key)
        out.update(tp_loss_rec=float(m2.loss_rec),
                   tp_loss_sen=float(m2.loss_sen),
                   tp_accuracy=float(m2.accuracy))

        # The checkpoint path reassembles cross-process Megatron shards
        # (utils/checkpoint.py); round-trip one save/load here so the
        # driver artifact covers it (process 0 writes, all build).
        import tempfile
        from multimodalgame_tpu.utils.checkpoint import (load_checkpoint,
                                                         save_checkpoint)
        ckpt = os.path.join(tempfile.gettempdir(),
                            "mmg_dryrun_tp_ckpt_%d" % os.getppid())
        save_checkpoint(ckpt, dict(step=1, best_dev_acc=0.0), tp_params,
                        tp_opts)
        if process_id == 0:
            # reassemble_local, NOT host_view: only process 0 runs this
            # block, so it must not dispatch a collective (the (·, 2)
            # mesh keeps every model shard on each process, so local
            # reassembly always covers).
            def _full(x):
                if isinstance(x, jax.Array) and not x.is_fully_addressable:
                    local = reassemble_local(x)
                    assert local is not None
                    return local
                return np.asarray(x)

            _, loaded, _ = load_checkpoint(ckpt, params, opt_states)
            for (pa, a), (_, b) in zip(
                    jax.tree_util.tree_leaves_with_path(loaded),
                    jax.tree_util.tree_leaves_with_path(
                        jax.tree_util.tree_map(_full, tp_params))):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7,
                    err_msg="tp ckpt " + jax.tree_util.keystr(pa))
            os.remove(ckpt)
            out["tp_ckpt_roundtrip"] = True

        # Model axis genuinely SPANNING processes: on a (1, n_devices)
        # mesh each process's local shards cover only part of every
        # Megatron leaf, so building the checkpoint payload takes the
        # collective gather (host_view) — the all-process payload
        # contract in save_checkpoint is what keeps the job from
        # deadlocking on it. Placement is value-preserving, so the
        # written payload must equal the original host trees.
        from multimodalgame_tpu.parallel.tensor import MODEL_AXIS
        mesh_span = make_mesh_2d(1, n_devices)
        specs_s = tp_param_specs(params, n_devices)
        span_params = shard_params_tp(params, mesh_span, specs_s)
        span_opts = place_opt_states_tp(opt_states, mesh_span, specs_s)
        sharded = [x for x in jax.tree_util.tree_leaves(span_params)
                   if isinstance(x, jax.Array)
                   and not x.is_fully_addressable
                   and not x.sharding.is_fully_replicated]
        # Prove the leg exercises the collective path, not local
        # reassembly: at least one Megatron shard set must NOT be
        # locally coverable (model extent > local device count).
        assert mesh_span.shape[MODEL_AXIS] == n_devices
        assert sharded and not all(covers_locally(x) for x in sharded)
        ckpt_s = os.path.join(tempfile.gettempdir(),
                              "mmg_dryrun_span_ckpt_%d" % os.getppid())
        save_checkpoint(ckpt_s, dict(step=2, best_dev_acc=0.0),
                        span_params, span_opts)
        if process_id == 0:
            _, loaded, lopts = load_checkpoint(ckpt_s, params, opt_states)
            for got, want in ((loaded, params), (lopts, opt_states)):
                for (pa, va), (_, vb) in zip(
                        jax.tree_util.tree_leaves_with_path(got),
                        jax.tree_util.tree_leaves_with_path(want)):
                    np.testing.assert_allclose(
                        np.asarray(va), np.asarray(vb), rtol=1e-6,
                        atol=1e-7,
                        err_msg="span ckpt " + jax.tree_util.keystr(pa))
            os.remove(ckpt_s)
            out["span_ckpt_roundtrip"] = True
    return out


def _main() -> None:
    """Subprocess worker for the 2-process CPU test (and a manual
    multi-host smoke entry): prints the dryrun metrics as one JSON line."""
    import argparse
    import json

    p = argparse.ArgumentParser()
    p.add_argument("--coordinator", required=True)
    p.add_argument("--num-processes", type=int, required=True)
    p.add_argument("--process-id", type=int, required=True)
    args = p.parse_args()
    out = dryrun_multihost(args.coordinator, args.num_processes,
                           args.process_id)
    print(json.dumps(out))


if __name__ == "__main__":
    _main()
