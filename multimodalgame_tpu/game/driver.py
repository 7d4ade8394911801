"""Chunked device-side training driver — the product path for the
benchmark throughput.

The legacy loop in train.py reproduces the reference's per-batch host
loop (model.py:1218-1330): one jit dispatch per optimizer update plus a
host sync to read the accuracy. Behind the axon tunnel each round trip is
~30 ms, capping it near ~30 steps/s no matter how fast the chip is. This
driver removes every per-step host interaction:

* the whole dataset lives in HBM (data/device_dataset.py) — batches are
  device-side gathers driven by a host-computed ``(K, B)`` index plan;
* steps between host-visible boundaries (log/dev/checkpoint cadences,
  reference model.py:1341-1584) run as compiled K-step chunks
  (game/train.py:make_multistep_train_step_indexed): 512-step pieces
  plus ONE exact-length remainder (bounded compilation cache,
  make_piece_planner) — a canonical 999-step window is 2 dispatches.
  Per-step PRNG keys derive inside the programs as fold_in(base, step)
  by GLOBAL step, so the trajectory is invariant to the partition and
  the hot loop does zero host-side key ops;
* a boundary step runs with full metrics and everything its log window
  prints — losses, entropies, argmax, both sparkline conversation dumps —
  is packed into ONE flat vector on device (game/logpack.py) and fetched
  with a single transfer;
* dev evaluation is one compiled sweep over the staged dev set
  (game/fast_eval.py) returning one packed statistics vector;
* periodic checkpoints snapshot params/optimizer state ON DEVICE at the
  save step and defer the host fetch + file write to the next
  host-visible event (same step-ordered event queue as the log/dev
  payloads, same commit contract as the async orbax backend: on disk by
  the next event and before the driver returns — a crash in between
  loses at most that one save, the previous file survives). The fetch
  itself pipelines the leaf transfers (utils/device_pack.fetch_tree)
  instead of paying one blocking round trip per leaf. ``MMG_SYNC_SAVE=1``
  restores synchronous writes.

Log-artifact parity with the legacy driver (and hence with the reference's
``run()``) is pinned by tests/test_driver.py; the two drivers differ only
in their PRNG schedule (documented in PARITY.md) and host-sync pattern.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from multimodalgame_tpu.data.device_dataset import DeviceDataset
from multimodalgame_tpu.game.fast_eval import run_device_dev_eval
from multimodalgame_tpu.parallel.distributed import (host_view,
                                                     host_view_many,
                                                     prefetch_host_async)
from multimodalgame_tpu.game.logpack import LogPacker
from multimodalgame_tpu.game.train import (make_multistep_train_step_indexed,
                                           make_train_step_indexed)
from multimodalgame_tpu.utils.checkpoint import (save_checkpoint,
                                                 wait_for_checkpoints)
from multimodalgame_tpu.utils.profiling import StepTimer

# Chunk sizes are drawn from this fixed set so the number of distinct
# compiled programs is bounded by its length, not by the flag values.
# Max 512: 1024- and 2048-step chunks were A/B-measured and REJECTED —
# under the real dispatch-overlap protocol larger chunks are ~5% slower
# (coarser planning/execution pipelining; PERFORMANCE.md "Tried and
# rejected" records the order-controlled measurements).
_POW2 = (512, 256, 128, 64, 32, 16, 8, 4, 2, 1)

# RECURRING sub-512 chunk remainders dispatch as ONE exact-length
# program instead of a power-of-two decomposition (999-step log windows
# cost 2 dispatches — 512+487 — not 8). Safe since round 5: per-step
# keys are indexed by GLOBAL step inside the program (game/train.py),
# so the partition cannot change the trajectory — the planner is a pure
# performance knob. A length's FIRST occurrence still decomposes into
# _POW2 pieces: a fresh TPU compile is ~40-90 s through the tunnel,
# orders of magnitude above the handful of dispatches an exact program
# saves, so one-off tails (end of training, odd max_steps) must never
# trigger one; cadence-window remainders recur hundreds of times and
# amortize theirs from the second window on. (The first cut admitted
# first-seen lengths and every arbitrary-horizon run paid a surprise
# mid-run compile — caught by the round-5 cadence decomposition.) The
# cap bounds distinct compiled lengths for pathological cadences.
_EXACT_CAP = 16

# The reference's torchvision Scale size for CIFAR images
# (utils/package_data.py:171-178 / model.py:1195-1206).
CIFAR_IMAGE_SIZE = 227


def decompose_chunks(k: int) -> list:
    """Greedy power-of-two decomposition of a chunk of ``k`` steps."""
    out = []
    for p in _POW2:
        while k >= p:
            out.append(p)
            k -= p
    return out


def make_piece_planner(cap: int = _EXACT_CAP):
    """Returns ``plan(k) -> [piece sizes]``: 512-step pieces plus one
    exact-length remainder for remainder lengths that RECUR. A length's
    first occurrence decomposes into _POW2 pieces (already compiled —
    never pay a fresh compile for a one-off tail); from its second
    occurrence it dispatches as one exact-length program, amortizing
    one compile over the hundreds of identical cadence windows a real
    run produces. At most ``cap`` distinct exact lengths are admitted;
    beyond that, remainders stay _POW2."""
    seen = set()
    admitted = set()

    def plan(k: int) -> list:
        pieces = []
        while k >= 512:
            pieces.append(512)
            k -= 512
        if k:
            if k in admitted or (k in seen and len(admitted) < cap):
                admitted.add(k)
                pieces.append(k)
            else:
                seen.add(k)
                pieces.extend(decompose_chunks(k))
        return pieces

    return plan


def resolve_mesh(flags, batch_fields=("batch_size", "batch_size_dev")):
    """Build the mesh requested by ``-mesh`` (0/1 = off, N > 1 = first N
    devices, -1 = all devices), validating divisibility of the
    ``batch_fields`` the caller actually shards (eval-only runs pass just
    ``batch_size_dev``). With ``-mesh_model M`` (M > 1) the N devices
    form a 2-D ``(data=N/M, model=M)`` grid instead — batches shard over
    the data axis only, so the batch fields must divide N/M. Returns a
    ``jax.sharding.Mesh`` or ``None``."""
    n = int(getattr(flags, "mesh", 0) or 0)
    m = int(getattr(flags, "mesh_model", 0) or 0)
    if n == -1:
        n = len(jax.devices())
    if m > 1 and n <= 1:
        raise ValueError(
            "-mesh_model requires -mesh to resolve to more than one "
            "device (the device set the model axis splits)")
    if n <= 1:
        return None
    n_data = n
    if m > 1:
        if n % m:
            raise ValueError(
                f"-mesh_model {m} does not divide the -mesh size {n}")
        n_data = n // m
    for fname in batch_fields:
        b = getattr(flags, fname)
        if b % n_data:
            raise ValueError(
                f"-{fname} {b} is not divisible by the data-axis size "
                f"{n_data} (-mesh {n}"
                + (f" / -mesh_model {m})" if m > 1 else ")"))
    if m > 1:
        from multimodalgame_tpu.parallel.tensor import make_mesh_2d
        return make_mesh_2d(n_data, m)
    from multimodalgame_tpu.parallel.mesh import make_mesh
    return make_mesh(n)


def run_fast(flags, modules, params, opt_states, desc_train, desc_dev,
             flogger, logger, eval_exchange, step: int = 0,
             best_dev_acc: float = 0.0,
             max_steps: Optional[int] = None) -> dict:
    """Train with the chunked device-side schedule; returns the same
    summary dict as the legacy loop in train.py.

    With ``-mesh N`` the same compiled programs run data-parallel over an
    N-device mesh: the staged dataset, parameters, optimizer state, and
    descriptions are replicated; each step's batch *index row* is sharded
    on the batch axis, so the device-side gather, the conversation, and
    the per-example loss terms are sharded too, and XLA's SPMD
    partitioner turns the batch-global loss reductions and the gradient
    sum into psums over ICI (jit follows the argument shardings — no
    separate mesh program). Results are numerically identical to
    single-device execution up to psum reassociation
    (tests/test_mesh_driver.py).
    """
    cfg = modules.cfg
    ctx_key = flags.data_context if flags.attn_extra_context else None
    transform = None
    context_fn = None
    if flags.images == "cifar":
        # Raw pixels staged as resized uint8 (lossless, 1/4 the f32 HBM
        # footprint); the Scale(227)+Normalize(.5,.5) float math runs on
        # device fused into the train step (VERDICT round-2 #9). The
        # attn_extra_context fc context is the SAME flattened pixels
        # (model.py:1195-1206 yields fc = avgpool = flat pixels), so it
        # derives on device from the transformed batch instead of
        # staging a second copy (VERDICT round-3 #8).
        train_ds = DeviceDataset.from_cifar(
            image_size=CIFAR_IMAGE_SIZE)
        flat_feat = flags.img_feat != "layer4_2"

        def transform(x):
            x = (jnp.asarray(x, jnp.float32) / 255.0 - 0.5) / 0.5
            return x.reshape(x.shape[0], -1) if flat_feat else x

        if flags.attn_extra_context:
            # (ctx_key stays set: the dev split is an HDF5 file whose
            # context column stages normally in dev_ds below.)
            def context_fn(data):
                return data.reshape(data.shape[0], -1)
    else:
        train_ds = DeviceDataset.from_hdf5(flags.train_file,
                                           flags.img_feat,
                                           map_labels=desc_train.map_labels,
                                           context_key=ctx_key)
    dev_ds = DeviceDataset.from_hdf5(flags.dev_file, flags.img_feat,
                                     map_labels=desc_dev.map_labels,
                                     context_key=ctx_key)

    desc_j = jnp.asarray(desc_train.desc)
    padded_j = (jnp.asarray(desc_train.desc_set_padded)
                if cfg.desc_attn else None)
    pmask_j = (jnp.asarray(desc_train.desc_set_mask)
               if cfg.desc_attn else None)

    mesh = resolve_mesh(flags)
    put_key = lambda k: k  # noqa: E731 — identity off-mesh
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from multimodalgame_tpu.parallel.mesh import axis_placer, replicate
        rep = NamedSharding(mesh, P())
        if jax.process_count() > 1:
            # Multi-process job: PRNG keys are derived identically on
            # every host (same seed, same split schedule) and must enter
            # the global programs as replicated global arrays.
            from multimodalgame_tpu.parallel.distributed import put_global
            put_key = lambda k: put_global(np.asarray(k), rep)  # noqa: E731
        if len(mesh.axis_names) > 1:
            # 2-D (data, model): Megatron-shard the sender MLP and
            # baselines over the model axis (parallel/tensor.py); the
            # data-parallel placement below is otherwise unchanged.
            from multimodalgame_tpu.parallel.tensor import (
                MODEL_AXIS, class_axis_placer, place_opt_states_tp,
                shard_params_tp, tp_param_specs)
            flogger.Log(
                "Mesh: {} devices = {} data x {} model ({})".format(
                    mesh.size, mesh.shape["data"], mesh.shape[MODEL_AXIS],
                    jax.devices()[0].platform))
            specs = tp_param_specs(params, mesh.shape[MODEL_AXIS])
            params = shard_params_tp(params, mesh, specs)
            opt_states = place_opt_states_tp(opt_states, mesh, specs)
            # Receiver prediction head: class-axis sharding via the
            # description inputs (parallel/tensor.py class_axis_placer).
            place_desc = class_axis_placer(mesh)
        else:
            flogger.Log("Data-parallel mesh: {} devices ({})".format(
                mesh.size, jax.devices()[0].platform))
            params = replicate(params, mesh)
            opt_states = replicate(opt_states, mesh)
            place_desc = lambda x: replicate(x, mesh)  # noqa: E731
        desc_j = place_desc(desc_j)
        if padded_j is not None:
            padded_j = place_desc(padded_j)
            pmask_j = place_desc(pmask_j)
        train_ds.place(rep)
        dev_ds.place(rep)
        # Batch-index rows shard on their trailing (batch) axis; ragged
        # tails replicate.
        put_rows = axis_placer(mesh, axis=-1)
    else:
        put_rows = jnp.asarray

    full_step = make_train_step_indexed(modules, flags.top_k_train,
                                        flags.batch_size,
                                        transform=transform,
                                        context_fn=context_fn)
    chunk_step = make_multistep_train_step_indexed(modules,
                                                   flags.top_k_train,
                                                   flags.batch_size,
                                                   transform=transform,
                                                   context_fn=context_fn)
    packer = LogPacker(cfg, flags.batch_size, flags.exchange_samples)

    L = flags.log_interval
    D = flags.log_dev

    def is_log(t):
        return t % L == 0

    def is_dev(t):
        return t % D == 0

    def is_save(t):
        return t >= flags.save_after and t % flags.save_interval == 0

    # One base key for the whole run, placed once; every training step's
    # key derives INSIDE the compiled programs as fold_in(base, step) —
    # indexed by global step, so the trajectory is invariant to chunk
    # partitioning, boundary/chunk splits, and resume, and the hot loop
    # performs zero host-side key operations (each eager key op is a
    # tunnel dispatch on this hardware). Boundary-only auxiliary streams
    # (the eval-mode exchange dump, the dev sweep) fold tags 1 and 2
    # onto the step key — distinct from every training stream by
    # construction.
    base_key = jax.random.PRNGKey(flags.random_seed + 1)
    base_g = put_key(base_key)
    plan_pieces = make_piece_planner()
    # Boundary-only auxiliary streams (eval-mode exchange dump tag 1,
    # dev sweep tag 2) derive fold_in(fold_in(base, step), tag) in ONE
    # jitted call — two eager fold_ins were two tunnel dispatches per
    # cadence event. The result is device-resident (and, multi-process,
    # replicated-global like base_g), so no put_key either.
    derive_key = jax.jit(lambda base, t, tag: jax.random.fold_in(
        jax.random.fold_in(base, t), tag))
    # Enqueue-time device->host prefetch of deferred-event payloads
    # (A/B knob: MMG_NO_PREFETCH=1 restores fetch-at-flush — see
    # PERFORMANCE.md round-5 cadence decomposition). Read per run so
    # one measurement process can interleave both arms.
    prefetch = (prefetch_host_async
                if os.environ.get("MMG_NO_PREFETCH") != "1"
                else (lambda xs: None))
    batch_accuracy = []   # host floats, one per optimizer step, in order
    pending_acc = []      # device accuracy arrays not yet fetched
    pending = []          # deferred host-visible events, in step order:
                          #   ("log", payload-tuple) | ("dev", dev-tuple)
    dev_accuracy = []
    timer = StepTimer()
    state = {"steps_timed": 0}
    done = False

    def flush_acc(extras=()):
        # One pipelined transfer for the whole backlog (~10 chunk
        # accuracy arrays per canonical log window): serial host_view
        # calls paid a full tunnel round trip EACH, which alone
        # accounted for most of the cadence-on gap (PERFORMANCE.md
        # round-5 cadence decomposition). Each flush site passes the
        # device arrays its own event needs (log payload, dev payloads)
        # as ``extras`` so the whole event costs ONE round trip, not
        # two; their host copies are returned in order.
        if not pending_acc and not extras:
            return []
        vals = host_view_many(list(pending_acc) + list(extras))
        n = len(pending_acc)
        for a in vals[:n]:
            batch_accuracy.extend(
                a.astype(np.float64).reshape(-1).tolist())
        pending_acc.clear()
        return vals[n:]

    def queued_acc_count():
        c = len(batch_accuracy)
        for a in pending_acc:
            shape = np.shape(a)
            c += int(np.prod(shape)) if shape else 1
        return c

    def log_window(t, i_batch, host, epoch, acc_end):
        """Emit the interval-log block from the unpacked payload via the
        shared formatter (train.py:emit_log_window — same code path as
        the legacy loop, so the log format cannot drift). ``acc_end`` is
        the accuracy-list position as of the boundary step, so a
        deferred flush averages exactly the window the reference
        would have."""
        from multimodalgame_tpu.train import emit_log_window
        window = batch_accuracy[max(0, acc_end - flags.log_interval):
                                acc_end]
        avg_batch_acc = float(np.asarray(window).mean())
        emit_log_window(flags, flogger, logger, epoch, t, i_batch,
                        avg_batch_acc, host)

    def flush_payload(ev):
        """Fetch and print one deferred log-boundary payload.

        The boundary step's packed payload is NOT fetched when computed —
        chunks for the following window are dispatched first, so the
        ~one-RTT device->host transfer overlaps their compute, and the
        payload is materialized here, right before the next host-visible
        event (next log window, dev eval, checkpoint, epoch line, or
        training end). Log lines appear in exactly the same order and
        with exactly the same content as immediate fetching."""
        payload, t, i_b, ep, tgt, acc_end = ev
        # The fetch below is the sync: close the running train span
        # only after it returns, so timed spans cover real device work,
        # then reopen it.
        (host_payload,) = flush_acc((payload,))
        host = packer.unpack(host_payload)
        if state["steps_timed"]:
            timer.stop(steps=state["steps_timed"])
            state["steps_timed"] = 0
            timer.start()
        host["target"] = tgt
        log_window(t, i_b, host, ep, acc_end)

    def emit_dev_lines(t, i_batch, epoch, dev_acc, extra):
        dev_accuracy.append(dev_acc)
        logger.log(key="Development Accuracy", val=dev_acc, step=t)
        logger.log(key="Conversation Length (avg)",
                   val=extra["conversation_lengths_mean"], step=t)
        logger.log(key="Conversation Length (std)",
                   val=extra["conversation_lengths_std"], step=t)
        logger.log(key="Hamming Receiver (avg)",
                   val=extra["hamming_rec_mean"], step=t)
        logger.log(key="Hamming Sender (avg)",
                   val=extra["hamming_sen_mean"], step=t)
        flogger.Log("Epoch: {} Step: {} Batch: {} Development Accuracy: {}"
                    .format(epoch, t, i_batch, dev_acc))
        flogger.Log("Epoch: {} Step: {} Batch: {} Conversation Length "
                    "(avg/std): {}/{}".format(
                        epoch, t, i_batch,
                        extra["conversation_lengths_mean"],
                        extra["conversation_lengths_std"]))
        flogger.Log("Epoch: {} Step: {} Batch: {} Mean Hamming Distance "
                    "(R/S): {}/{}".format(
                        epoch, t, i_batch, extra["hamming_rec_mean"],
                        extra["hamming_sen_mean"]))

    # Device-side snapshot (fresh buffers — donation-proof) of the trees
    # a deferred best-checkpoint may need; tiny at this model scale.
    snap = jax.jit(
        lambda t: jax.tree_util.tree_map(lambda x: x + 0, t))

    def flush_dev(ev):
        """Materialize a deferred dev-eval (the payload fetch rode under
        subsequent training dispatch — VERDICT round-2 #5) and run the
        best-checkpoint logic against the snapshot taken at the dev
        step."""
        nonlocal best_dev_acc
        payloads, finish, t, i_batch, epoch, snapshot = ev
        dev_acc, extra = finish(flush_acc(tuple(payloads)))
        if state["steps_timed"]:
            timer.stop(steps=state["steps_timed"])
            state["steps_timed"] = 0
            timer.start()
        emit_dev_lines(t, i_batch, epoch, dev_acc, extra)
        if t >= flags.save_after and dev_acc > best_dev_acc:
            best_dev_acc = dev_acc
            flogger.Log("Checkpointing with best Development "
                        "Accuracy: {}".format(best_dev_acc))
            snap_params, snap_opts = snapshot
            save_checkpoint(flags.checkpoint + "_best",
                            dict(step=t, best_dev_acc=best_dev_acc),
                            snap_params, snap_opts,
                            fmt=flags.ckpt_format)

    def dev_dispatch(t, i_batch, epoch):
        """Launch the dev sweep and defer its fetch. The eval programs
        enqueue against the CURRENT param buffers before any later chunk
        donates them (already-enqueued executions keep their references);
        a device-side snapshot preserves the trees for the deferred
        best-checkpoint decision."""
        sub = derive_key(base_g, np.int32(t), np.int32(2))
        # The payloads ride in the event so the deferred flush can fold
        # their fetch into the accuracy-backlog round trip.
        payloads, finish = run_device_dev_eval(
            flags, modules, params, desc_dev, dev_ds, epoch, sub,
            row_placer=put_rows, sync=False)
        snapshot = (snap((params, opt_states))
                    if t >= flags.save_after else (None, None))
        pending.append(("dev", (payloads, finish, t, i_batch, epoch,
                                snapshot)))
        # Payloads only — the snapshot is fetched just when this dev
        # eval turns out best; prefetching it every time would spend
        # tunnel bandwidth on mostly-discarded state.
        prefetch(payloads)

    def flush_save(ev):
        """Materialize a deferred periodic checkpoint. The device-side
        snapshot was taken at the save step; the fetch + file write ride
        here — overlapping the training dispatched since — with the same
        commit contract as the async orbax backend: the file is on disk
        by the next host-visible event and before the driver returns.
        ``best_dev_acc`` is exact because events flush in step order, so
        every dev result at or before the save step has already landed."""
        t, snapshot = ev
        flush_acc()
        if state["steps_timed"]:
            timer.stop(steps=state["steps_timed"])
            state["steps_timed"] = 0
        else:
            timer.cancel()
        flogger.Log("Checkpointing.")
        snap_params, snap_opts = snapshot
        save_checkpoint(flags.checkpoint,
                        dict(step=t, best_dev_acc=best_dev_acc),
                        snap_params, snap_opts, fmt=flags.ckpt_format)
        timer.start()

    def flush_events():
        """Flush deferred host-visible events (log windows, dev evals,
        periodic checkpoints) in step order — called before emitting any
        new host-visible line so log content and order match immediate
        processing exactly."""
        while pending:
            kind, ev = pending.pop(0)
            if kind == "log":
                flush_payload(ev)
            elif kind == "dev":
                flush_dev(ev)
            else:
                flush_save(ev)

    # --- Cross-epoch batch stream (VERDICT round-2 #5) ---------------
    # Chunks are bounded by host-visible cadences (log/dev/save) and
    # max_steps ONLY — not by epoch ends. The per-epoch shuffle plans
    # (reference seed-11+epoch semantics) are buffered and consumed
    # contiguously; "Starting epoch" lines are emitted when the stream
    # first dispatches that epoch's steps, so log line order is
    # unchanged. Epochs count 0..max_epoch-1 regardless of a resumed
    # step, exactly like the reference's run() (model.py:1190).
    plan_buf = np.zeros((0, flags.batch_size), np.int32)
    tag_epoch = np.zeros((0,), np.int32)   # epoch of each buffered row
    tag_batch = np.zeros((0,), np.int32)   # i_batch within that epoch
    next_epoch = 0        # next epoch to plan
    started_epoch = -1    # highest epoch whose Starting line printed

    def refill(need):
        nonlocal plan_buf, tag_epoch, tag_batch, next_epoch
        while plan_buf.shape[0] < need and next_epoch < flags.max_epoch:
            plan = train_ds.epoch_indices(next_epoch, flags.shuffle_train,
                                          flags.batch_size)
            if plan.shape[0] == 0:
                next_epoch = flags.max_epoch  # dataset < one batch
                break
            plan_buf = np.concatenate([plan_buf, plan], axis=0)
            tag_epoch = np.concatenate(
                [tag_epoch, np.full(plan.shape[0], next_epoch, np.int32)])
            tag_batch = np.concatenate(
                [tag_batch, np.arange(plan.shape[0], dtype=np.int32)])
            next_epoch += 1

    def consume(k):
        nonlocal plan_buf, tag_epoch, tag_batch
        rows, plan_buf = plan_buf[:k], plan_buf[k:]
        eps, tag_epoch = tag_epoch[:k], tag_epoch[k:]
        ibs, tag_batch = tag_batch[:k], tag_batch[k:]
        return rows, eps, ibs

    def enter_epochs(upto):
        """Emit Starting-epoch (and per-epoch timing) lines for every
        epoch the stream is about to dispatch into. Any deferred event
        flushes first so its lines stay before the epoch banner — the
        same order the per-epoch loop produced."""
        nonlocal started_epoch
        while started_epoch < upto:
            started_epoch += 1
            flush_events()
            if started_epoch > 0 and timer.count:
                flogger.Log("Epoch {} step timing: {}".format(
                    started_epoch - 1, timer.summary()))
                timer.reset()
            flogger.Log("Starting epoch: {}".format(started_epoch))
            if not timer.running:
                timer.start()

    while not done:
        t = step
        if max_steps is not None and t >= max_steps:
            break
        refill(1)
        if plan_buf.shape[0] == 0:
            # Epochs exhausted. A dataset smaller than one batch yields
            # zero steps but the legacy loop still prints every epoch's
            # Starting banner — keep line-for-line parity.
            enter_epochs(flags.max_epoch - 1)
            break
        if is_log(t):
            rows, eps, ibs = consume(1)
            row_np, ev_epoch, ev_batch = rows[0], int(eps[0]), int(ibs[0])
            enter_epochs(ev_epoch)
            # The previous window's payload prints before this one's is
            # queued (order parity).
            flush_events()
            # Full-metrics boundary step; the payload fetch is deferred
            # so it overlaps the next window's compute.
            row = put_rows(row_np)  # placed once, shared by both programs
            params, opt_states, m = full_step(
                params, opt_states, train_ds.feats, train_ds.targets,
                row, desc_j, base_g, np.int32(t),
                feats_context=train_ds.context,
                desc_set_padded=padded_j, desc_set_mask=pmask_j)
            ex_eval = None
            if flags.exchange_samples > 0:
                # Re-run eval-mode exchange on the same batch for the
                # inferred-conversation dump (model.py:1463-1465).
                sub2 = derive_key(base_g, np.int32(t), np.int32(1))
                data = jnp.take(train_ds.feats, row, axis=0)
                if transform is not None:
                    data = transform(data)
                kwargs = {}
                if train_ds.context is not None:
                    kwargs["data_context"] = jnp.take(
                        train_ds.context, row, axis=0)
                elif context_fn is not None:
                    kwargs["data_context"] = context_fn(data)
                ex_eval = eval_exchange(params, data, desc_j,
                                        sub2,
                                        desc_set_padded=padded_j,
                                        desc_set_mask=pmask_j, **kwargs)
            payload = packer.pack(m, ex_eval)
            pending_acc.append(m.accuracy)
            pending.append(("log", (payload, t, ev_batch, ev_epoch,
                                    train_ds.targets_host[row_np],
                                    queued_acc_count())))
            # The transfers ride under the next window's compute; the
            # deferred flush then materializes resolved futures instead
            # of paying a round trip.
            prefetch([payload, m.accuracy])
            state["steps_timed"] += 1
            did = 1
        else:
            # Chunk every step up to (exclusive) the next log boundary;
            # break at the first dev/checkpoint action so it fires at
            # the right step. Epoch ends do NOT break chunks.
            next_log = (t // L + 1) * L
            limit = next_log - 1
            if max_steps is not None:
                limit = min(limit, max_steps - 1)
            # First dev/save boundary in [t, limit], closed-form (a
            # linear scan here is O(interval) Python per chunk — at
            # sparse cadences that dominated wall time outright).
            chunk_last = limit
            nd = ((t + D - 1) // D) * D                    # is_dev
            if nd <= limit:
                chunk_last = nd
            s0 = max(t, flags.save_after)                  # is_save
            ns = ((s0 + flags.save_interval - 1)
                  // flags.save_interval) * flags.save_interval
            if ns <= limit:
                chunk_last = min(chunk_last, ns)
            k = chunk_last - t + 1
            refill(k)
            k = min(k, plan_buf.shape[0])
            rows, eps, ibs = consume(k)
            ev_epoch, ev_batch = int(eps[-1]), int(ibs[-1])
            enter_epochs(ev_epoch)
            off = 0
            for size in plan_pieces(k):
                params, opt_states, sm = chunk_step(
                    params, opt_states, train_ds.feats,
                    train_ds.targets, put_rows(rows[off:off + size]),
                    desc_j, base_g, np.int32(t + off),
                    feats_context=train_ds.context,
                    desc_set_padded=padded_j, desc_set_mask=pmask_j)
                pending_acc.append(sm.accuracy)
                prefetch([sm.accuracy])
                off += size
            state["steps_timed"] += k
            did = k

        t_done = t + did - 1
        if is_dev(t_done):
            # Print any deferred earlier events first (log order), then
            # dispatch the dev sweep WITHOUT fetching — the payload
            # transfer overlaps the next window's training dispatch.
            flush_events()
            dev_dispatch(t_done, ev_batch, ev_epoch)
        if is_save(t_done):
            # Periodic checkpoint: snapshot on device (fresh buffers —
            # later chunks donate the live ones) and defer the fetch +
            # write to the next host-visible event, where it overlaps
            # the training dispatched in between. MMG_SYNC_SAVE=1
            # restores the synchronous write (measurement/debug knob).
            save_snapshot = snap((params, opt_states))
            # This snapshot WILL be written — start its device->host
            # transfer now so save_checkpoint's fetch at the flush point
            # finds resolved futures.
            prefetch_host_async(
                jax.tree_util.tree_leaves(save_snapshot))
            pending.append(("save", (t_done, save_snapshot)))
            if (os.environ.get("MMG_SYNC_SAVE") == "1"
                    or sum(1 for k, _ in pending if k == "save") > 8):
                # The cap bounds snapshot HBM when no log/dev event ever
                # intervenes (pathological cadences).
                flush_events()
        step = t_done + 1
        if max_steps is not None and step >= max_steps:
            done = True

    flush_events()
    flush_acc()  # the final sync — close the trailing timed span on it
    if state["steps_timed"]:
        timer.stop(steps=state["steps_timed"])
        state["steps_timed"] = 0
    if timer.count:
        flogger.Log("Final step timing: {}".format(timer.summary()))
        timer.reset()
    wait_for_checkpoints()  # commit any in-flight async orbax save
    return dict(step=step, best_dev_acc=best_dev_acc, params=params,
                opt_states=opt_states, batch_accuracy=batch_accuracy,
                metrics=logger.history)
