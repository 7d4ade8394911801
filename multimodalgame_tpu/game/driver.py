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
  (game/train.py:make_multistep_train_step_indexed), K decomposed into
  powers of two to bound the number of compilations;
* a boundary step runs with full metrics and everything its log window
  prints — losses, entropies, argmax, both sparkline conversation dumps —
  is packed into ONE flat vector on device (game/logpack.py) and fetched
  with a single transfer;
* dev evaluation is one compiled sweep over the staged dev set
  (game/fast_eval.py) returning one packed statistics vector.

Log-artifact parity with the legacy driver (and hence with the reference's
``run()``) is pinned by tests/test_driver.py; the two drivers differ only
in their PRNG schedule (documented in PARITY.md) and host-sync pattern.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from multimodalgame_tpu.data.device_dataset import DeviceDataset
from multimodalgame_tpu.game.fast_eval import run_device_dev_eval
from multimodalgame_tpu.game.logpack import LogPacker
from multimodalgame_tpu.game.train import (make_multistep_train_step_indexed,
                                           make_train_step_indexed)
from multimodalgame_tpu.utils.checkpoint import save_checkpoint
from multimodalgame_tpu.utils.profiling import StepTimer

# Chunk sizes are drawn from this fixed set so the number of distinct
# compiled programs is bounded by its length, not by the flag values.
_POW2 = (512, 256, 128, 64, 32, 16, 8, 4, 2, 1)


def decompose_chunks(k: int) -> list:
    """Greedy power-of-two decomposition of a chunk of ``k`` steps."""
    out = []
    for p in _POW2:
        while k >= p:
            out.append(p)
            k -= p
    return out


def resolve_mesh(flags):
    """Build the data-parallel mesh requested by ``-mesh`` (0/1 = off,
    N > 1 = first N devices, -1 = all devices), validating batch
    divisibility. Returns a ``jax.sharding.Mesh`` or ``None``."""
    n = int(getattr(flags, "mesh", 0) or 0)
    if n == -1:
        n = len(jax.devices())
    if n <= 1:
        return None
    from multimodalgame_tpu.parallel.mesh import make_mesh
    for fname in ("batch_size", "batch_size_dev"):
        b = getattr(flags, fname)
        if b % n:
            raise ValueError(
                f"-{fname} {b} is not divisible by the -mesh size {n}")
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
    train_ds = DeviceDataset.from_hdf5(flags.train_file, flags.img_feat,
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
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from multimodalgame_tpu.parallel.mesh import BATCH_AXIS
        rep = NamedSharding(mesh, P())
        n_mesh = mesh.size
        flogger.Log("Data-parallel mesh: {} devices ({})".format(
            n_mesh, jax.devices()[0].platform))
        params = jax.device_put(params, rep)
        opt_states = jax.device_put(opt_states, rep)
        desc_j = jax.device_put(desc_j, rep)
        if padded_j is not None:
            padded_j = jax.device_put(padded_j, rep)
            pmask_j = jax.device_put(pmask_j, rep)
        train_ds.place(rep)
        dev_ds.place(rep)

        def put_rows(rows):
            rows = np.asarray(rows)
            if rows.shape[-1] % n_mesh:   # ragged tail: replicate
                return jax.device_put(rows, rep)
            spec = P(*([None] * (rows.ndim - 1) + [BATCH_AXIS]))
            return jax.device_put(rows, NamedSharding(mesh, spec))
    else:
        put_rows = jnp.asarray

    full_step = make_train_step_indexed(modules, flags.top_k_train,
                                        flags.batch_size)
    chunk_step = make_multistep_train_step_indexed(modules,
                                                   flags.top_k_train,
                                                   flags.batch_size)
    packer = LogPacker(cfg, flags.batch_size, flags.exchange_samples)

    L = flags.log_interval
    D = flags.log_dev

    def is_log(t):
        return t % L == 0

    def is_dev(t):
        return t % D == 0

    def is_save(t):
        return t >= flags.save_after and t % flags.save_interval == 0

    key = jax.random.PRNGKey(flags.random_seed + 1)
    batch_accuracy = []   # host floats, one per optimizer step, in order
    pending_acc = []      # device accuracy arrays not yet fetched
    pending_log = []      # at most one deferred log-boundary payload
    dev_accuracy = []
    timer = StepTimer()
    state = {"steps_timed": 0}
    epoch = 0
    done = False

    def flush_acc():
        for a in pending_acc:
            batch_accuracy.extend(
                np.asarray(a, dtype=np.float64).reshape(-1).tolist())
        pending_acc.clear()

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

    def flush_log():
        """Fetch and print the deferred log-boundary payload.

        The boundary step's packed payload is NOT fetched when computed —
        chunks for the following window are dispatched first, so the
        ~one-RTT device->host transfer overlaps their compute, and the
        payload is materialized here, right before the next host-visible
        event (next log window, dev eval, checkpoint, epoch line, or
        training end). Log lines appear in exactly the same order and
        with exactly the same content as immediate fetching."""
        if not pending_log:
            return
        payload, t, i_b, ep, tgt, acc_end = pending_log.pop()
        # The fetches below are the sync: close the running train span
        # only after they return, so timed spans cover real device work,
        # then reopen it.
        flush_acc()
        host = packer.unpack(np.asarray(payload))
        if state["steps_timed"]:
            timer.stop(steps=state["steps_timed"])
            state["steps_timed"] = 0
            timer.start()
        host["target"] = tgt
        log_window(t, i_b, host, ep, acc_end)

    def dev_block(t, i_batch, epoch):
        nonlocal best_dev_acc, key
        key, sub = jax.random.split(key)
        dev_acc, extra = run_device_dev_eval(
            flags, modules, params, desc_dev, dev_ds, epoch, sub,
            row_placer=put_rows)
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
        if t >= flags.save_after and dev_acc > best_dev_acc:
            best_dev_acc = dev_acc
            flogger.Log("Checkpointing with best Development "
                        "Accuracy: {}".format(best_dev_acc))
            save_checkpoint(flags.checkpoint + "_best",
                            dict(step=t, best_dev_acc=best_dev_acc),
                            params, opt_states)

    while epoch < flags.max_epoch and not done:
        flogger.Log("Starting epoch: {}".format(epoch))
        idx_plan = train_ds.epoch_indices(epoch, flags.shuffle_train,
                                          flags.batch_size)
        nb = idx_plan.shape[0]
        i = 0
        if not timer.running:
            timer.start()
        while i < nb:
            t = step
            if max_steps is not None and t >= max_steps:
                done = True
                break
            if is_log(t):
                # The previous window's payload prints before this one's
                # is queued (order parity).
                flush_log()
                # Full-metrics boundary step; the payload fetch is
                # deferred so it overlaps the next window's compute.
                key, sub = jax.random.split(key)
                params, opt_states, m = full_step(
                    params, opt_states, train_ds.feats, train_ds.targets,
                    put_rows(idx_plan[i]), desc_j, sub,
                    feats_context=train_ds.context,
                    desc_set_padded=padded_j, desc_set_mask=pmask_j)
                ex_eval = None
                if flags.exchange_samples > 0:
                    # Re-run eval-mode exchange on the same batch for the
                    # inferred-conversation dump (model.py:1463-1465).
                    key, sub2 = jax.random.split(key)
                    row = put_rows(idx_plan[i])
                    data = jnp.take(train_ds.feats, row, axis=0)
                    kwargs = {}
                    if train_ds.context is not None:
                        kwargs["data_context"] = jnp.take(
                            train_ds.context, row, axis=0)
                    ex_eval = eval_exchange(params, data, desc_j, sub2,
                                            desc_set_padded=padded_j,
                                            desc_set_mask=pmask_j, **kwargs)
                payload = packer.pack(m, ex_eval)
                pending_acc.append(m.accuracy)
                pending_log.append(
                    (payload, t, i, epoch,
                     train_ds.targets_host[idx_plan[i]],
                     queued_acc_count()))
                state["steps_timed"] += 1
                did = 1
            else:
                # Chunk every step up to (exclusive) the next log boundary;
                # break at the first dev/checkpoint action so host-side
                # state is current when it fires.
                next_log = (t // L + 1) * L
                limit = next_log - 1
                limit = min(limit, step + (nb - i) - 1)
                if max_steps is not None:
                    limit = min(limit, max_steps - 1)
                chunk_last = limit
                for v in range(t, limit + 1):
                    if is_dev(v) or is_save(v):
                        chunk_last = v
                        break
                k = chunk_last - t + 1
                off = 0
                for size in decompose_chunks(k):
                    rows = idx_plan[i + off:i + off + size]
                    key, sub = jax.random.split(key)
                    params, opt_states, sm = chunk_step(
                        params, opt_states, train_ds.feats,
                        train_ds.targets, put_rows(rows), desc_j, sub,
                        feats_context=train_ds.context,
                        desc_set_padded=padded_j, desc_set_mask=pmask_j)
                    pending_acc.append(sm.accuracy)
                    off += size
                state["steps_timed"] += k
                did = k

            t_done = t + did - 1
            if is_dev(t_done) or is_save(t_done):
                # Host-side work: print any deferred window first (log
                # order), sync, and close the running train span so
                # dev-eval/checkpoint time never counts as step time.
                flush_log()
                flush_acc()
                if state["steps_timed"]:
                    timer.stop(steps=state["steps_timed"])
                    state["steps_timed"] = 0
                else:
                    timer.cancel()
                if is_dev(t_done):
                    dev_block(t_done, i + did - 1, epoch)
                if is_save(t_done):
                    flogger.Log("Checkpointing.")
                    save_checkpoint(flags.checkpoint,
                                    dict(step=t_done,
                                         best_dev_acc=best_dev_acc),
                                    params, opt_states)
                timer.start()
            step = t_done + 1
            i += did
            if max_steps is not None and step >= max_steps:
                done = True
                break

        # No forced device sync at the epoch boundary: pending
        # accuracies/steps flush at the next natural host-visible event
        # (log window, dev eval, checkpoint, or training end) — a
        # per-epoch sync would cost one tunnel RTT per 46-step epoch.
        # flush_log only syncs when a window payload is actually pending
        # (and must, to keep its lines before the next "Starting epoch").
        flush_log()
        if timer.count:
            # Summarize the spans that real syncs closed this epoch. A
            # span still running at the boundary is attributed to the
            # epoch whose sync eventually closes it — per-step cost is
            # unaffected; only the per-epoch grouping of the summary
            # lines shifts.
            flogger.Log("Epoch {} step timing: {}".format(
                epoch, timer.summary()))
            timer.reset()
        epoch += 1

    flush_log()
    flush_acc()  # the final sync — close the trailing timed span on it
    if state["steps_timed"]:
        timer.stop(steps=state["steps_timed"])
        state["steps_timed"] = 0
    if timer.count:
        flogger.Log("Final step timing: {}".format(timer.summary()))
        timer.reset()
    return dict(step=step, best_dev_acc=best_dev_acc, params=params,
                opt_states=opt_states, batch_accuracy=batch_accuracy,
                metrics=logger.history)
