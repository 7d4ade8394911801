"""Training driver — the reference's ``run()`` (model.py:1001-1592).

Flow parity: flag dump -> four-model construction (+ parameter-count
logging) -> description loading -> optimizers -> optional checkpoint
resume -> ``eval_only`` / ``binary_only`` branches -> epoch loop over HDF5
batches with interval logging (losses, per-step entropies, sparkline
message dumps for train *and* a re-run eval-mode exchange), periodic dev
evaluation with best-checkpointing, and periodic checkpointing.

The per-batch hot path is a single fused jitted train step
(game/train.py); everything in this module is host-side orchestration.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from multimodalgame_tpu.config import Flags
from multimodalgame_tpu.data.descriptions import DescriptionPack, load_descriptions
from multimodalgame_tpu.data.hdf5_loader import load_hdf5, prefetch
from multimodalgame_tpu.eval import eval_dev
from multimodalgame_tpu.extract import extract_binary
from multimodalgame_tpu.game.agents import AgentModules, init_params, param_count
from multimodalgame_tpu.game.config import GameConfig
from multimodalgame_tpu.game.train import (init_opt_states, make_eval_exchange,
                                           make_train_step)
from multimodalgame_tpu.utils.checkpoint import (load_checkpoint,
                                                 recover_orbax,
                                                 save_checkpoint,
                                                 wait_for_checkpoints)
from multimodalgame_tpu.utils.logging import FileLogger, VisdomLogger
from multimodalgame_tpu.utils.profiling import StepTimer
from multimodalgame_tpu.utils.sparks import bin_to_alpha, sparks


def format_exchange_log(tag: str, sen_probs, sen_feats, rec_probs, rec_feats,
                        s_probs, s_masks_post, n_steps: int,
                        num_samples: int, use_alpha: bool) -> str:
    """Render sampled conversations as sparkline dumps
    (reference model.py:1411-1518).

    ``s_masks_post`` is the per-step post-step mask array ``(T, B, 1)``
    (the reference's ``s_masks[1:]``).
    """
    log = tag
    for i_sample in range(num_samples):
        prev_sen = np.zeros(sen_feats.shape[-1])
        prev_rec = np.zeros(rec_feats.shape[-1])
        for i_exchange in range(n_steps):
            sen_probs_i = list(np.asarray(sen_probs[i_exchange][i_sample],
                                          dtype=float))
            sen_spark = sparks([1] + sen_probs_i)[1:]
            rec_probs_i = list(np.asarray(rec_probs[i_exchange][i_sample],
                                          dtype=float))
            rec_spark = sparks([1] + rec_probs_i)[1:]
            s_probs_i = list(np.asarray(s_probs[i_exchange][i_sample],
                                        dtype=float))
            s_spark = sparks([1] + s_probs_i)[1:]

            sen_binary = np.asarray(sen_feats[i_exchange][i_sample])
            sen_hamming = float(np.abs(prev_sen - sen_binary).sum())
            prev_sen = sen_binary
            rec_binary = np.asarray(rec_feats[i_exchange][i_sample])
            rec_hamming = float(np.abs(prev_rec - rec_binary).sum())
            prev_rec = rec_binary

            sen_msg = "".join(str(int(b)) for b in sen_binary)
            rec_msg = "".join(str(int(b)) for b in rec_binary)
            if use_alpha:
                sen_msg = bin_to_alpha(sen_msg)
                rec_msg = bin_to_alpha(rec_msg)
            if i_exchange == 0:
                log += "\n{:>3}".format(i_sample)
            else:
                log += "\n   "
            log += "        {}".format(sen_spark)
            log += "           {}    {}".format(s_spark, rec_spark)
            log += "\n    {:>3} S: {} {:4}".format(
                i_exchange, sen_msg, sen_hamming)
            log += "    s={} R: {} {:4}".format(
                int(s_masks_post[i_exchange][i_sample][0]), rec_msg,
                rec_hamming)
    log += "\n"
    return log


def emit_log_window(flags: Flags, flogger, logger, epoch: int, step: int,
                    i_batch: int, avg_batch_acc: float, host: dict) -> None:
    """Emit one interval-log block (reference model.py:1341-1542) — the
    SINGLE formatter behind both training loops (the legacy per-batch
    loop below and the chunked driver, game/driver.py), so the log format
    can never drift between them.

    ``host`` holds host-side values: ``loss_sen``, ``nll_loss``,
    ``loss_binary_rec``, ``loss_binary_s``, ``loss_bas_sen``,
    ``loss_bas_rec``, ``target``, ``argmax``, ``n_steps``,
    ``ent_binary_sen``, ``ent_binary_rec``, ``ent_y_rec`` and, when
    ``exchange_samples > 0``, the ``train_*`` / ``eval_*`` conversation
    dump arrays (probs/feats/stop arrays + ``eval_n_steps``).
    """
    prefix = "Epoch: {} Step: {} Batch: {} ".format(epoch, step, i_batch)
    flogger.Log(prefix + "Training Accuracy: {}".format(avg_batch_acc))
    flogger.Log(prefix + "Loss Sender: {}".format(
        float(host["loss_sen"])))
    flogger.Log(prefix + "Loss Receiver (Y): {}".format(
        float(host["nll_loss"])))
    if flags.use_binary:
        flogger.Log(prefix + "Loss Receiver (Z): {}".format(
            float(host["loss_binary_rec"])))
        if not flags.fixed_exchange:
            flogger.Log(prefix + "Loss Receiver (S): {}".format(
                float(host["loss_binary_s"])))
        flogger.Log(prefix + "Loss Baseline (S): {}".format(
            float(host["loss_bas_sen"])))
        flogger.Log(prefix + "Loss Baseline (R): {}".format(
            float(host["loss_bas_rec"])))

    flogger.Log("Predictions: {}".format(
        np.stack([np.asarray(host["target"]),
                  np.asarray(host["argmax"]).astype(np.int64)], 0)))

    n_train = int(host["n_steps"])
    if flags.use_binary:
        ent_sen = np.asarray(host["ent_binary_sen"])[:n_train]
        if len(ent_sen) > 0:
            log_ent = "Entropy Sender Binary"
            for i, ent in enumerate(ent_sen):
                log_ent += "\n{}. {}".format(i, -float(ent))
            flogger.Log(log_ent + "\n")
        ent_rec = np.asarray(host["ent_binary_rec"])[:max(n_train - 1, 0)]
        if len(ent_rec) > 0:
            log_ent = "Entropy Receiver Binary"
            for i, ent in enumerate(ent_rec):
                log_ent += "\n{}. {}".format(i, -float(ent))
            flogger.Log(log_ent + "\n")
    ent_y = np.asarray(host["ent_y_rec"])[:n_train]
    if len(ent_y) > 0:
        log_ent = "Entropy Receiver Predictions"
        for i, ent in enumerate(ent_y):
            log_ent += "\n{}. {}".format(i, -float(ent))
        flogger.Log(log_ent + "\n")

    # Sampled + inferred conversation dumps (model.py:1411-1518).
    if flags.exchange_samples > 0:
        flogger.Log(format_exchange_log(
            "Train:", host["train_sen_probs"], host["train_sen_feats"],
            host["train_rec_probs"], host["train_rec_feats"],
            host["train_stop_probs"], host["train_stop_masks_post"],
            n_train, flags.exchange_samples, flags.use_alpha))
        flogger.Log(format_exchange_log(
            "Eval:", host["eval_sen_probs"], host["eval_sen_feats"],
            host["eval_rec_probs"], host["eval_rec_feats"],
            host["eval_stop_probs"], host["eval_stop_masks_post"],
            int(host["eval_n_steps"]), flags.exchange_samples,
            flags.use_alpha))

    logger.log(key="Loss Sender", val=float(host["loss_sen"]), step=step)
    logger.log(key="Loss Receiver (Y)", val=float(host["nll_loss"]),
               step=step)
    if flags.use_binary:
        logger.log(key="Loss Receiver (Z)",
                   val=float(host["loss_binary_rec"]), step=step)
        if not flags.fixed_exchange:
            logger.log(key="Loss Receiver (S)",
                       val=float(host["loss_binary_s"]), step=step)
        logger.log(key="Loss Baseline (S)",
                   val=float(host["loss_bas_sen"]), step=step)
        logger.log(key="Loss Baseline (R)",
                   val=float(host["loss_bas_rec"]), step=step)
    logger.log(key="Training Accuracy", val=avg_batch_acc, step=step)


def _load_desc_pack(flags: Flags, descr_path: str) -> DescriptionPack:
    return load_descriptions(descr_path, flags.wv_type, flags.wv_dim,
                             glove_path=flags.glove_path)


def run(flags: Flags, max_steps: Optional[int] = None) -> dict:
    """Train (or eval/extract, per flags). Returns a summary dict."""
    # Multi-host: join the job before anything touches devices. Every
    # process runs this same driver code (they must — the SPMD programs
    # need all processes to dispatch the same computations in the same
    # order); process 0 owns the shared artifacts (checkpoint writes are
    # gated inside utils/checkpoint.py), the others write their
    # host-side logs to per-process paths.
    nproc = int(getattr(flags, "num_processes", 1) or 1)
    if nproc > 1:
        # Validate BEFORE joining the job — a bad flag must fail fast,
        # not hang on the coordinator handshake.
        if not flags.coordinator:
            raise ValueError(
                "-num_processes > 1 requires -coordinator host:port")
        if int(getattr(flags, "mesh", 0) or 0) in (0, 1):
            raise ValueError(
                "-num_processes > 1 requires -mesh (e.g. -mesh -1 for "
                "every device in the job)")
        # (-mesh_model composes with -num_processes: tensor placement
        # goes through put_global and checkpointing reassembles or
        # collectively gathers model shards — see parallel/tensor.py and
        # utils/checkpoint.py; pinned by tests/test_multihost_driver.py.)
        # is_initialized, NOT process_count(): querying the process count
        # initializes the local backend, after which joining the job is
        # impossible.
        if not jax.distributed.is_initialized():
            from multimodalgame_tpu.parallel.distributed import initialize
            initialize(flags.coordinator, nproc, flags.process_id)
        if jax.process_index() != 0:
            suffix = ".p%d" % jax.process_index()
            for attr in ("log_file", "json_file", "eval_csv_file",
                         "conf_mat"):
                setattr(flags, attr, getattr(flags, attr) + suffix)
    # The first Log() appends to flags.log_file — create its directory
    # up front so a fresh checkout with the default -log_path ./logs
    # doesn't die on FileNotFoundError before training starts.
    if flags.log_file:
        os.makedirs(os.path.dirname(flags.log_file) or ".", exist_ok=True)
    flogger = FileLogger(flags.log_file)
    logger = VisdomLogger(env=flags.env,
                          experiment_name=flags.experiment_name,
                          enabled=flags.visdom)

    # Debug mode: the reference arms numpy fp exceptions
    # (model.py:1806-1807); the device-side analog is NaN checking on
    # every jitted computation.
    if flags.debug:
        jax.config.update("jax_debug_nans", True)

    flogger.Log("Flag Values:\n" +
                json.dumps(flags.flag_values_dict(), indent=4,
                           sort_keys=True))
    if not os.path.exists(flags.json_file):
        os.makedirs(os.path.dirname(flags.json_file) or ".", exist_ok=True)
        with open(flags.json_file, "w") as f:
            f.write(json.dumps(flags.flag_values_dict(), indent=4,
                               sort_keys=True))

    cfg = GameConfig.from_flags(flags)
    modules = AgentModules(cfg)

    uses_fast_driver = flags.fast_driver
    uses_device_eval = (flags.fast_driver and flags.images == "mammal"
                        and os.environ.get("MMG_USE_PALLAS_EVAL") != "1")
    wants_mesh = (int(getattr(flags, "mesh", 0) or 0) not in (0, 1)
                  or int(getattr(flags, "mesh_model", 0) or 0) > 1)
    if wants_mesh and not (
            (uses_fast_driver and not flags.eval_only
             and not flags.binary_only)
            or (flags.eval_only and uses_device_eval)):
        raise ValueError(
            "-mesh/-mesh_model parallelism is implemented for the chunked "
            "training driver (-fast_driver) and the device-sweep "
            "-eval_only path; drop -mesh or use the fast driver")

    # Descriptions (model.py:1066-1108). ``fake`` keeps the CSV structure
    # but substitutes deterministic random word vectors.
    if flags.wv_type == "none":
        raise NotImplementedError("wv_type=none has no prediction targets")
    desc_train = _load_desc_pack(flags, flags.descr_train)
    desc_dev = _load_desc_pack(flags, flags.descr_dev)

    params = init_params(modules, jax.random.PRNGKey(flags.random_seed),
                         num_classes=desc_train.num_classes,
                         max_words=max(desc_train.desc_set_lens))
    # Architecture + parameter-count logging in the reference's order
    # (model.py:1025-1064).
    for name in ("sender", "baseline_sen", "receiver", "baseline_rec"):
        flogger.Log("Architecture: {}".format(getattr(modules, name)))
        flogger.Log("Total Parameters: {}".format(param_count(params[name])))

    opt_states = init_opt_states(cfg, params)

    epoch = 0
    step = 0
    best_dev_acc = 0.0

    # Repair any crash-interrupted orbax staging swap BEFORE the resume
    # decision: the mid-swap crash window leaves nothing at
    # flags.checkpoint itself, so an exists()-gated resume would skip
    # the load and the next save would sweep the only committed copy as
    # stale staging (recover_orbax self-gates to process 0).
    recover_orbax(flags.checkpoint)
    recover_orbax(flags.checkpoint + "_best")
    multiproc = nproc > 1 and jax.process_count() > 1
    resume = os.path.exists(flags.checkpoint)
    ckpt_is_dir = os.path.isdir(flags.checkpoint)
    if multiproc:
        # The checkpoint lives on process 0's host (it owns the shared
        # artifacts); its existence/format verdict must be the GLOBAL
        # one. A per-process exists() silently diverges the job on
        # restart: process 0 resumes at step N while the others init
        # fresh at step 0 — mismatched dispatch schedules (collective
        # hangs) or, where they align, "replicated" arrays whose
        # per-process shards hold different values.
        from jax.experimental import multihost_utils
        resume, ckpt_is_dir = (
            bool(v) for v in multihost_utils.broadcast_one_to_all(
                np.asarray([resume, ckpt_is_dir])))
    if resume:
        # Resuming adopts the checkpoint's on-disk format (either
        # direction) so the next periodic save doesn't collide with the
        # existing artifact (save_checkpoint fails fast on a mismatch).
        if ckpt_is_dir and flags.ckpt_format != "orbax":
            flags.ckpt_format = "orbax"
            flogger.Log("Checkpoint is an orbax directory; using "
                        "-ckpt_format orbax for this run")
        elif not ckpt_is_dir and flags.ckpt_format != "msgpack":
            flags.ckpt_format = "msgpack"
            flogger.Log("Checkpoint is a msgpack file; using "
                        "-ckpt_format msgpack for this run")
        flogger.Log("Loading from: " + flags.checkpoint)
        if not multiproc or jax.process_index() == 0:
            data, params, opt_states = load_checkpoint(
                flags.checkpoint, params, opt_states)
            step = int(data["step"])
            best_dev_acc = float(data["best_dev_acc"])
        if multiproc:
            # Every process must carry process 0's exact state: step and
            # best_dev_acc drive the chunk/log/dev/save schedules (a
            # divergent "new best" verdict would desynchronize the
            # collective checkpoint-payload gathers), and put_global
            # assumes identical per-process values for replicated
            # leaves. best_dev_acc rides as raw f64 bytes — a float32
            # broadcast could round it across a later >= comparison.
            from jax.experimental import multihost_utils
            payload = (np.int32(step),
                       np.frombuffer(np.float64(best_dev_acc).tobytes(),
                                     np.uint8).copy(),
                       params, opt_states)
            payload = multihost_utils.broadcast_one_to_all(payload)
            step = int(payload[0])
            best_dev_acc = float(np.frombuffer(
                np.asarray(payload[1], np.uint8).tobytes(), np.float64)[0])
            params, opt_states = payload[2], payload[3]
        flogger.Log("Loaded at step: {} and best dev acc: {}".format(
            step, best_dev_acc))

    # Fused Pallas eval kernel: opt-in via MMG_USE_PALLAS_EVAL=1 (only
    # affects eligible configs; see ops/pallas_exchange.py).
    eval_exchange = make_eval_exchange(
        modules, use_pallas=os.environ.get("MMG_USE_PALLAS_EVAL") == "1")

    # Alternatives to training (model.py:1165-1187).
    if flags.eval_only:
        if not os.path.exists(flags.checkpoint):
            raise Exception("Must provide valid checkpoint.")
        if uses_device_eval:
            # One-program device sweep (game/fast_eval.py) — same
            # statistics as the host loop (pinned by test_driver.py),
            # two transfers instead of ~8 per batch. -nofast_driver
            # selects the host path; so does the MMG_USE_PALLAS_EVAL
            # opt-in (the fused kernel runs through eval.py's
            # eval_exchange, which the device sweep doesn't use).
            from multimodalgame_tpu.data.device_dataset import DeviceDataset
            from multimodalgame_tpu.game.driver import resolve_mesh
            from multimodalgame_tpu.game.fast_eval import run_device_dev_eval
            ctx_key = (flags.data_context if flags.attn_extra_context
                       else None)
            dev_ds = DeviceDataset.from_hdf5(
                flags.dev_file, flags.img_feat,
                map_labels=desc_dev.map_labels, context_key=ctx_key)
            row_placer = None
            # Only the dev batch shards here; the training batch_size is
            # irrelevant to an eval-only run.
            mesh = resolve_mesh(flags, batch_fields=("batch_size_dev",))
            if mesh is not None:
                # Sharded eval: params/dataset replicated (or, under
                # -mesh_model, the sender/baseline leaves Megatron-
                # sharded over the model axis — same placement policy as
                # the training driver), batch-index rows sharded — the
                # training driver's -mesh recipe on the dev sweep alone.
                from multimodalgame_tpu.parallel.mesh import (axis_placer,
                                                              replicate)
                if len(mesh.axis_names) > 1:
                    from multimodalgame_tpu.parallel.tensor import (
                        MODEL_AXIS, shard_params_tp)
                    flogger.Log(
                        "Mesh: {} devices = {} data x {} model ({})"
                        .format(mesh.size, mesh.shape["data"],
                                mesh.shape[MODEL_AXIS],
                                jax.devices()[0].platform))
                    params = shard_params_tp(params, mesh)
                else:
                    flogger.Log(
                        "Data-parallel mesh: {} devices ({})".format(
                            mesh.size, jax.devices()[0].platform))
                    params = replicate(params, mesh)
                dev_ds.place(jax.sharding.NamedSharding(
                    mesh, jax.sharding.PartitionSpec()))
                row_placer = axis_placer(mesh, axis=-1)
            dev_acc, extra = run_device_dev_eval(
                flags, modules, params, desc_dev, dev_ds, epoch,
                jax.random.PRNGKey(0), row_placer=row_placer)
        else:
            dev_acc, extra = eval_dev(
                flags, modules, params, eval_exchange, flags.dev_file,
                flags.batch_size_dev, epoch, flags.shuffle_dev,
                flags.top_k_dev, desc_dev)
        flogger.Log("Dev Accuracy: " + str(dev_acc))
        with open(flags.eval_csv_file, "w") as f:
            f.write("checkpoint,eval_file,topk,step,best_dev_acc,eval_acc,"
                    "convlen_mean,convlen_std\n")
            f.write("{},{},{},{},{},{},{},{}\n".format(
                flags.checkpoint, flags.dev_file, flags.top_k_dev,
                step, best_dev_acc, dev_acc,
                extra["conversation_lengths_mean"],
                extra["conversation_lengths_std"]))
        return dict(dev_acc=dev_acc, extra=extra)
    elif flags.binary_only:
        if not os.path.exists(flags.checkpoint):
            raise Exception("Must provide valid checkpoint.")
        path = extract_binary(flags, modules, params, eval_exchange,
                              flags.dev_file, flags.batch_size_dev, epoch,
                              flags.shuffle_dev, desc_dev)
        return dict(binary_output=path)

    # The chunked device-side driver (game/driver.py) is the product hot
    # path: dataset staged in HBM (CIFAR: resized uint8 pixels,
    # normalized on device, with the attn fc context derived on device
    # from the same staged pixels), whole log windows compiled as one
    # program, one host transfer per log boundary. The legacy per-batch
    # loop below remains for -nofast_driver only.
    if uses_fast_driver:
        from multimodalgame_tpu.game.driver import run_fast
        summary = run_fast(flags, modules, params, opt_states, desc_train,
                           desc_dev, flogger, logger, eval_exchange,
                           step=step, best_dev_acc=best_dev_acc,
                           max_steps=max_steps)
        flogger.Log("Finished training.")
        return summary

    train_step = make_train_step(modules, flags.top_k_train,
                                 flags.batch_size)

    desc_j = jnp.asarray(desc_train.desc)
    padded_j = (jnp.asarray(desc_train.desc_set_padded)
                if cfg.desc_attn else None)
    pmask_j = (jnp.asarray(desc_train.desc_set_mask)
               if cfg.desc_attn else None)

    key = jax.random.PRNGKey(flags.random_seed + 1)
    batch_accuracy = []
    dev_accuracy = []
    done = False
    timer = StepTimer()
    steps_in_span = 0
    n_acc_host = 0  # prefix of batch_accuracy already converted to float

    def flush_accuracy():
        """Convert pending device accuracy scalars in one D2H transfer."""
        nonlocal n_acc_host
        if n_acc_host < len(batch_accuracy):
            vals = jax.device_get(batch_accuracy[n_acc_host:])
            batch_accuracy[n_acc_host:] = [float(v) for v in vals]
            n_acc_host = len(batch_accuracy)

    while epoch < flags.max_epoch and not done:
        flogger.Log("Starting epoch: {}".format(epoch))

        if flags.images == "mammal":
            dataloader = prefetch(load_hdf5(
                flags.train_file, flags.batch_size, epoch,
                flags.shuffle_train, map_labels=desc_train.map_labels),
                to_device=True)
        elif flags.images == "cifar":
            from multimodalgame_tpu.data.cifar import load_cifar
            dataloader = load_cifar(flags.batch_size, epoch)
        else:
            raise NotImplementedError

        for i_batch, batch in enumerate(dataloader):
            target = jnp.asarray(batch["target"])
            data = jnp.asarray(batch[flags.img_feat])
            kwargs = {}
            if flags.attn_extra_context:
                kwargs["data_context"] = jnp.asarray(
                    batch[flags.data_context])

            key, sub = jax.random.split(key)
            # One timer span per sync interval, like the chunked driver:
            # start at the first dispatch after a sync, stop at the log
            # window's forcing fetch. Timing each async dispatch alone
            # would report dispatch cost, not step cost — and forcing a
            # per-step scalar fetch to "fix" that would serialize host
            # and device.
            if not timer.running:
                timer.start()
                steps_in_span = 0
            params, opt_states, m = train_step(
                params, opt_states, data, target, desc_j, sub,
                desc_set_padded=padded_j, desc_set_mask=pmask_j,
                **kwargs)
            steps_in_span += 1

            # Device scalar now, host float at the next sync point.
            batch_accuracy.append(m.accuracy)

            if step % flags.log_interval == 0:
                # Batch all log-window metric fetches into one D2H
                # transfer; the bulky per-turn exchange arrays transfer
                # only when the sparkline dump consumes them.
                ex = m.exchange
                host = dict(
                    loss_sen=m.loss_sen, nll_loss=m.nll_loss,
                    loss_binary_rec=m.loss_binary_rec,
                    loss_binary_s=m.loss_binary_s,
                    loss_bas_sen=m.loss_bas_sen,
                    loss_bas_rec=m.loss_bas_rec,
                    target=target, argmax=m.argmax,
                    n_steps=ex.n_steps,
                    ent_binary_sen=m.ent_binary_sen,
                    ent_binary_rec=m.ent_binary_rec,
                    ent_y_rec=m.ent_y_rec)
                if flags.exchange_samples > 0:
                    host.update(
                        train_sen_probs=ex.sen_probs,
                        train_sen_feats=ex.sen_feats,
                        train_rec_probs=ex.rec_probs,
                        train_rec_feats=ex.rec_feats,
                        train_stop_probs=ex.stop_probs,
                        train_stop_masks_post=ex.stop_masks[1:])
                    # Re-run eval-mode exchange on the same batch for the
                    # inferred-conversation dump (model.py:1463-1465).
                    key, sub = jax.random.split(key)
                    ev = eval_exchange(params, data, desc_j, sub,
                                       desc_set_padded=padded_j,
                                       desc_set_mask=pmask_j, **kwargs)
                    host.update(
                        eval_sen_probs=ev.sen_probs,
                        eval_sen_feats=ev.sen_feats,
                        eval_rec_probs=ev.rec_probs,
                        eval_rec_feats=ev.rec_feats,
                        eval_stop_probs=ev.stop_probs,
                        eval_stop_masks_post=ev.stop_masks[1:],
                        eval_n_steps=ev.n_steps)
                host = jax.device_get(host)  # the sync point
                timer.stop(steps=steps_in_span)
                flush_accuracy()
                avg_batch_acc = float(np.array(
                    batch_accuracy[-flags.log_interval:]).mean())
                emit_log_window(flags, flogger, logger, epoch, step,
                                i_batch, avg_batch_acc, host)

            # Periodic dev evaluation + best checkpoint (model.py:1544-1576).
            if step % flags.log_dev == 0:
                dev_acc, extra = eval_dev(
                    flags, modules, params, eval_exchange, flags.dev_file,
                    flags.batch_size_dev, epoch, flags.shuffle_dev,
                    flags.top_k_dev, desc_dev)
                dev_accuracy.append(dev_acc)
                logger.log(key="Development Accuracy", val=dev_acc,
                           step=step)
                logger.log(key="Conversation Length (avg)",
                           val=extra["conversation_lengths_mean"], step=step)
                logger.log(key="Conversation Length (std)",
                           val=extra["conversation_lengths_std"], step=step)
                logger.log(key="Hamming Receiver (avg)",
                           val=extra["hamming_rec_mean"], step=step)
                logger.log(key="Hamming Sender (avg)",
                           val=extra["hamming_sen_mean"], step=step)
                flogger.Log(
                    "Epoch: {} Step: {} Batch: {} Development Accuracy: {}"
                    .format(epoch, step, i_batch, dev_accuracy[-1]))
                flogger.Log(
                    "Epoch: {} Step: {} Batch: {} Conversation Length "
                    "(avg/std): {}/{}".format(
                        epoch, step, i_batch,
                        extra["conversation_lengths_mean"],
                        extra["conversation_lengths_std"]))
                flogger.Log(
                    "Epoch: {} Step: {} Batch: {} Mean Hamming Distance "
                    "(R/S): {}/{}".format(
                        epoch, step, i_batch, extra["hamming_rec_mean"],
                        extra["hamming_sen_mean"]))
                if step >= flags.save_after and dev_acc > best_dev_acc:
                    best_dev_acc = dev_acc
                    flogger.Log("Checkpointing with best Development "
                                "Accuracy: {}".format(best_dev_acc))
                    save_checkpoint(flags.checkpoint + "_best",
                                    dict(step=step,
                                         best_dev_acc=best_dev_acc),
                                    params, opt_states,
                                    fmt=flags.ckpt_format)

            # Periodic checkpoint (model.py:1578-1584).
            if step >= flags.save_after and step % flags.save_interval == 0:
                flogger.Log("Checkpointing.")
                save_checkpoint(flags.checkpoint,
                                dict(step=step, best_dev_acc=best_dev_acc),
                                params, opt_states,
                                fmt=flags.ckpt_format)

            step += 1
            if max_steps is not None and step >= max_steps:
                done = True
                # Close the abandoned prefetch generator so its worker
                # thread (and any staged device buffers) are reaped now
                # rather than at GC time.
                if hasattr(dataloader, "close"):
                    dataloader.close()
                break

        # Close an open span with a real sync (the accuracy flush forces
        # every dispatched step) so epoch timing is complete even when
        # log windows are sparser than epochs.
        if timer.running:
            flush_accuracy()
            timer.stop(steps=steps_in_span)
        if timer.count:
            flogger.Log("Epoch {} step timing: {}".format(
                epoch, timer.summary()))
            timer.reset()
        epoch += 1

    flogger.Log("Finished training.")
    flush_accuracy()
    wait_for_checkpoints()  # commit any in-flight async orbax save
    return dict(step=step, best_dev_acc=best_dev_acc, params=params,
                opt_states=opt_states,
                batch_accuracy=batch_accuracy, metrics=logger.history)
