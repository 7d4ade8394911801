"""Population sweep driver: train N games at once, report per-member dev
accuracy, checkpoint the winner.

A TPU-native extension with no reference counterpart (the reference runs
one game per process; sweeping seeds means N serial ``run()`` invocations,
model.py:1001-1592). Here the whole population trains in one compiled
program per chunk (parallel/population.py) — at the canonical scale a
16-member sweep costs ~2-3× one game's wall time, not 16× (PERFORMANCE.md).

CLI (reference-style flags plus the sweep extensions)::

    python -m multimodalgame_tpu.sweep -model_type Adaptive \
        -train_file ... -dev_file ... -descr_train ... -descr_dev ... \
        -population 16 [-lr_scales 0.5,1,2] [-max_epoch 50]

Prints one JSON line per member (seed index, lr scale, best dev top-k)
and a final summary line; saves the winner's parameters in the standard
single-game checkpoint layout at ``<checkpoint>_best``.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from multimodalgame_tpu.config import Flags
from multimodalgame_tpu.data.descriptions import load_descriptions
from multimodalgame_tpu.data.device_dataset import DeviceDataset
from multimodalgame_tpu.game.agents import AgentModules
from multimodalgame_tpu.game.config import GameConfig
from multimodalgame_tpu.game.driver import decompose_chunks
from multimodalgame_tpu.parallel.population import (
    init_population, init_population_opt_states, make_population_eval,
    make_population_train_step, member_params, split_population_keys)
from multimodalgame_tpu.utils.checkpoint import (save_checkpoint,
                                                 wait_for_checkpoints)
from multimodalgame_tpu.utils.logging import FileLogger


def parse_lr_scales(spec: Optional[str], n: int) -> Optional[np.ndarray]:
    """``"0.5,1,2"`` -> ``(n,)`` multipliers, cycled to the population."""
    if not spec:
        return None
    vals = [float(v) for v in spec.split(",") if v.strip()]
    return np.asarray([vals[i % len(vals)] for i in range(n)], np.float32)


def run_sweep(flags: Flags, max_steps: Optional[int] = None,
              eval_every: Optional[int] = None) -> dict:
    """Train the population; returns the summary dict (per-member dev
    accuracies, winner index, timings)."""
    if flags.log_file:
        os.makedirs(os.path.dirname(flags.log_file) or ".", exist_ok=True)
    flogger = FileLogger(flags.log_file)
    n = flags.population
    # A population of one trains through the driver's flat-carry chunk
    # path: the member vmap axis disables the raveled-vector carry and
    # costs ~2x at N=1 for nothing (PERFORMANCE.md round-3; VERDICT
    # round-3 #6). Outputs, logging, and the winner-checkpoint layout
    # are identical to the population path.
    flat1 = (n == 1)
    cfg = GameConfig.from_flags(flags)
    lr_scale = parse_lr_scales(flags.lr_scales, n)
    if flat1 and lr_scale is not None and float(lr_scale[0]) != 1.0:
        # The learning rate enters every supported rule (SGD/Adam/
        # RMSprop) as a final linear scale of the updates, so folding
        # the member's lr multiplier into the configured rate is exactly
        # the population trainer's per-member update scaling.
        import dataclasses
        cfg = dataclasses.replace(
            cfg, learning_rate=cfg.learning_rate * float(lr_scale[0]))
    modules = AgentModules(cfg)

    desc_train = load_descriptions(flags.descr_train, flags.wv_type,
                                   flags.wv_dim,
                                   glove_path=flags.glove_path)
    desc_dev = load_descriptions(flags.descr_dev, flags.wv_type,
                                 flags.wv_dim, glove_path=flags.glove_path)

    ctx_key = flags.data_context if flags.attn_extra_context else None
    train_ds = DeviceDataset.from_hdf5(flags.train_file, flags.img_feat,
                                       map_labels=desc_train.map_labels,
                                       context_key=ctx_key)
    dev_ds = DeviceDataset.from_hdf5(flags.dev_file, flags.img_feat,
                                     map_labels=desc_dev.map_labels,
                                     context_key=ctx_key)
    desc_j = jnp.asarray(desc_train.desc)
    desc_dev_j = jnp.asarray(desc_dev.desc)
    padded_j = (jnp.asarray(desc_train.desc_set_padded)
                if cfg.desc_attn else None)
    pmask_j = (jnp.asarray(desc_train.desc_set_mask)
               if cfg.desc_attn else None)
    dpadded_j = (jnp.asarray(desc_dev.desc_set_padded)
                 if cfg.desc_attn else None)
    dpmask_j = (jnp.asarray(desc_dev.desc_set_mask)
                if cfg.desc_attn else None)

    if flat1:
        # Same member-0 weights as init_population would draw (it inits
        # member i from split(key, n)[i]).
        from multimodalgame_tpu.game.agents import init_params
        from multimodalgame_tpu.game.train import init_opt_states
        k0 = jax.random.split(jax.random.PRNGKey(flags.random_seed), 1)[0]
        pop_params = init_params(modules, k0,
                                 num_classes=desc_train.num_classes,
                                 max_words=max(desc_train.desc_set_lens))
        pop_opts = init_opt_states(cfg, pop_params)
    else:
        pop_params = init_population(modules, jax.random.PRNGKey(
            flags.random_seed), n, num_classes=desc_train.num_classes,
            max_words=max(desc_train.desc_set_lens))
        pop_opts = init_population_opt_states(cfg, pop_params)

    # Multi-chip: shard the member axis over the device mesh (zero
    # collectives — members are independent); shared inputs replicate.
    mesh = None
    # Largest mesh whose size divides the member count (members shard
    # evenly); a non-divisible population falls back to a smaller divisor
    # mesh rather than silently training everything on one device.
    n_dev = next((d for d in range(jax.device_count(), 1, -1)
                  if n % d == 0), 1)
    if n_dev > 1:
        if n_dev < jax.device_count():
            flogger.Log(
                "Population {} not divisible by {} devices; sharding "
                "over a {}-device mesh instead".format(
                    n, jax.device_count(), n_dev))
        from multimodalgame_tpu.parallel.mesh import make_mesh, replicate
        from multimodalgame_tpu.parallel.population import (
            shard_population, shard_population_keys)
        mesh = make_mesh(n_dev)
        pop_params = shard_population(pop_params, mesh)
        pop_opts = shard_population(pop_opts, mesh)
        desc_j = replicate(desc_j, mesh)
        if padded_j is not None:
            padded_j = replicate(padded_j, mesh)
            pmask_j = replicate(pmask_j, mesh)
        place_keys = lambda k: shard_population_keys(k, mesh)  # noqa: E731
    else:
        place_keys = lambda k: k  # noqa: E731
    if flat1:
        from multimodalgame_tpu.game.train import (
            make_multistep_train_step_indexed)
        chunk = make_multistep_train_step_indexed(
            modules, flags.top_k_train, flags.batch_size)
    else:
        chunk = make_population_train_step(modules, flags.top_k_train,
                                           flags.batch_size)
    batch_eval = make_population_eval(modules, flags.top_k_dev)
    lr_j = None if lr_scale is None else jnp.asarray(lr_scale)

    def dev_accuracy(key) -> np.ndarray:
        idx = dev_ds.epoch_indices(0, False, flags.batch_size_dev,
                                   truncate_final_batch=True)
        if dev_ds.size == 0:
            raise ValueError("dev set is empty — nothing to evaluate")
        correct = np.zeros((n,), np.int64)
        total = 0
        # The N=1 flat path evaluates through the same population
        # program with a unit member axis (eval is cadenced, not hot).
        pop_view = (jax.tree_util.tree_map(lambda x: x[None], pop_params)
                    if flat1 else pop_params)
        for row in idx:
            row = row[row >= 0]
            key, sub = jax.random.split(key)
            row_j = jnp.asarray(row)  # staged once, used by all gathers
            data = jnp.take(dev_ds.feats, row_j, axis=0)
            target = jnp.take(dev_ds.targets, row_j, axis=0)
            ctx = (jnp.take(dev_ds.context, row_j, axis=0)
                   if dev_ds.context is not None else None)
            c = batch_eval(pop_view, data, target, desc_dev_j,
                           jax.random.split(sub, n),
                           desc_set_padded=dpadded_j,
                           desc_set_mask=dpmask_j, data_context=ctx)
            correct += np.asarray(c, np.int64)
            total += len(row)
        return correct / float(total)

    flogger.Log("Population sweep: {} members, {} steps/epoch, flags: {}"
                .format(n, train_ds.size // flags.batch_size,
                        json.dumps({"population": n,
                                    "lr_scales": flags.lr_scales,
                                    "model_type": flags.model_type})))

    key = jax.random.PRNGKey(flags.random_seed + 1)
    best = np.zeros((n,), np.float64)
    step = 0
    epoch = 0
    t0 = time.perf_counter()
    eval_cadence = eval_every or flags.log_dev
    done = False

    # Chunks span epoch boundaries: epoch index plans (reference-parity
    # shuffles) are buffered and consumed contiguously, so chunk sizes
    # come from a tiny fixed set (powers of two up to the eval cadence)
    # regardless of the per-epoch step count — each distinct size is a
    # separate compile, and short epochs would otherwise fragment every
    # window into many small one-off programs.
    plan_buf = np.zeros((0, flags.batch_size), dtype=np.int64)

    def refill(buf, needed):
        nonlocal epoch
        while buf.shape[0] < needed and epoch < flags.max_epoch:
            nxt = train_ds.epoch_indices(epoch, flags.shuffle_train,
                                         flags.batch_size)
            if nxt.shape[0] == 0:
                # dataset smaller than one batch: no epoch can ever
                # yield a step (and the empty plan is shaped (0,))
                break
            buf = np.concatenate([buf, nxt], axis=0)
            epoch += 1
        return buf

    accs = None   # last dev sweep, valid only if params unchanged since
    while not done:
        until_eval = eval_cadence - (step % eval_cadence)
        k = until_eval
        if max_steps is not None:
            k = min(k, max_steps - step)
        plan_buf = refill(plan_buf, k)
        k = min(k, plan_buf.shape[0])
        if k <= 0:
            break  # max_steps reached or epochs exhausted
        for size in decompose_chunks(k):
            rows = jnp.asarray(plan_buf[:size])
            plan_buf = plan_buf[size:]
            key, sub = jax.random.split(key)
            if flat1:
                # The driver's indexed hot path: the gather happens
                # inside the compiled chunk, keys derive on device.
                pop_params, pop_opts, sm = chunk(
                    pop_params, pop_opts, train_ds.feats,
                    train_ds.targets, rows, desc_j, sub,
                    feats_context=train_ds.context,
                    desc_set_padded=padded_j, desc_set_mask=pmask_j)
                step += size
                continue
            data = jnp.take(train_ds.feats, rows.reshape(-1),
                            axis=0).reshape(
                (size, flags.batch_size) + train_ds.feats.shape[1:])
            target = jnp.take(train_ds.targets, rows.reshape(-1),
                              axis=0).reshape(size, flags.batch_size)
            ctx = None
            if train_ds.context is not None:
                ctx = jnp.take(
                    train_ds.context, rows.reshape(-1),
                    axis=0).reshape(
                    (size, flags.batch_size)
                    + train_ds.context.shape[1:])
            pop_params, pop_opts, sm = chunk(
                pop_params, pop_opts, data, target, desc_j,
                place_keys(split_population_keys(sub, size, n)), lr_j,
                desc_set_padded=padded_j, desc_set_mask=pmask_j,
                data_context=ctx)
            step += size
        accs = None
        if step % eval_cadence == 0 or (max_steps is not None
                                        and step >= max_steps):
            key, sub = jax.random.split(key)
            accs = dev_accuracy(sub)
            best = np.maximum(best, accs)
            flogger.Log("Step: {} per-member dev acc: {}".format(
                step, np.array2string(accs, precision=3)))
        if max_steps is not None and step >= max_steps:
            done = True

    # Final per-member sweep — reusing the in-loop result when training
    # ended exactly on an eval boundary (eval is deterministic given the
    # params; re-running it would double the final-eval cost for the
    # same numbers — advisor round-2 #4).
    if accs is None:
        key, sub = jax.random.split(key)
        accs = dev_accuracy(sub)
        best = np.maximum(best, accs)
    elapsed = time.perf_counter() - t0

    members = []
    for i in range(n):
        members.append({
            "member": i,
            "lr_scale": float(lr_scale[i]) if lr_scale is not None else 1.0,
            "final_dev_acc": float(accs[i]),
            "best_dev_acc": float(best[i]),
        })
        print(json.dumps(members[-1]))
    # Winner = best dev accuracy over training (the driver/reference
    # best-checkpoint criterion, model.py:1569-1576). The saved
    # parameters are the member's FINAL state (the population trains as
    # one stacked program; per-member best-state snapshots would need a
    # device-side copy per eval), so the metadata records both
    # accuracies (advisor round-2 #2).
    winner = int(np.argmax(best))

    # Winner checkpoint carries the member's LIVE optimizer state (like
    # the training driver's best-checkpoints) so resuming continues the
    # trajectory instead of restarting RMSprop/Adam accumulators.
    if flat1:
        win_params = jax.device_get(pop_params)
        win_opts = jax.device_get(pop_opts)
    else:
        win_params = jax.device_get(member_params(pop_params, winner))
        win_opts = jax.device_get(member_params(pop_opts, winner))
    save_checkpoint(flags.checkpoint + "_best",
                    dict(step=step, best_dev_acc=float(best[winner]),
                         final_dev_acc=float(accs[winner])),
                    win_params, win_opts, fmt=flags.ckpt_format)

    summary = {
        "population": n,
        "steps": step,
        "winner": winner,
        "winner_best_dev_acc": float(best[winner]),
        "winner_final_dev_acc": float(accs[winner]),
        "wall_seconds": round(elapsed, 3),
        "steps_per_sec_total": round(step * n / elapsed, 1),
        "checkpoint": flags.checkpoint + "_best",
    }
    print(json.dumps(summary))
    flogger.Log("Sweep summary: " + json.dumps(summary))
    summary["members"] = members
    wait_for_checkpoints()  # commit any in-flight async orbax save
    return summary


def main(argv=None) -> None:
    from multimodalgame_tpu.config import flags_from_argv
    flags = flags_from_argv(sys.argv[1:] if argv is None else argv)
    run_sweep(flags)


if __name__ == "__main__":
    main()
