"""Device-side development evaluation: the whole dev sweep in one program.

The host evaluator (eval.py) reproduces the reference's per-batch loop
(model.py:580-722) with numpy statistics — which costs ~8 device reads per
dev batch. On a tunnel-attached TPU (~30 ms/read) a 60-batch dev sweep
spends ~15 s in round trips for ~10 ms of compute. Here the entire sweep —
eval-mode exchange, masked prediction selection, top-k hits, conversation
lengths, inter-step Hamming means — runs as one jitted ``lax.scan`` over
the staged dev set (data/device_dataset.py) and returns one packed vector
(utils/device_pack.py): two transfers total (full batches + ragged tail).

Numbers match eval.py's host computation exactly: the per-batch statistics
use the same ``n_steps``-sliced semantics (the reference's break_early
ragged lists), reproduced with step masks; the ragged final batch runs as
its own (smaller-shape) program so padding can never perturb batch
statistics. Statistics parity with eval.py is pinned by
tests/test_driver.py::test_fast_dev_eval_matches_host_eval.

Two documented limits of that exactness: (a) exactly-tied class scores
(possible only with bit-equal description rows) may break ties
differently than the host argsort; (b) with ``-flipout_dev`` corruption
the per-batch PRNG keys derive as ``split(key, nb)`` in one program
rather than the host loop's sequential split chain — same distribution,
different draws (the same documented PRNG-schedule deviation as the
chunked driver, PARITY.md).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multimodalgame_tpu.data.device_dataset import DeviceDataset
from multimodalgame_tpu.game.agents import AgentModules
from multimodalgame_tpu.game.exchange import exchange
from multimodalgame_tpu.utils.device_pack import PackSpec


def _fields(nb: int, batch: int):
    return PackSpec([
        ("hits", (nb,)), ("pred", (nb, batch)), ("conv_len", (nb, batch)),
        ("mh_sen", (nb,)), ("mh_rec", (nb,)),
    ])


def _get_evaluator(modules: AgentModules, top_k: int):
    cache = getattr(modules, "_dev_eval_cache", None)
    if cache is None:
        cache = modules._dev_eval_cache = {}
    if top_k in cache:
        return cache[top_k]
    cfg = modules.cfg

    @jax.jit
    def evaluate(params, feats, targets, idx, desc, key,
                 feats_context=None, desc_set_padded=None,
                 desc_set_mask=None, corrupt_mask=None):
        T = cfg.max_exchange
        nb = idx.shape[0]
        keys = jax.random.split(key, nb)

        def body(_, xs):
            b_idx, k = xs
            data = feats[b_idx]
            target = targets[b_idx]
            ctx = feats_context[b_idx] if feats_context is not None else None
            ex = exchange(modules, params, data, desc, k, train=False,
                          desc_set_padded=desc_set_padded,
                          desc_set_mask=desc_set_mask, data_context=ctx,
                          corrupt_mask=corrupt_mask)
            n = ex.n_steps
            live = (jnp.arange(T) < n).astype(jnp.float32)       # (T,)

            # Masked prediction selection over the n executed steps
            # (model.py:648-654; host analog eval.py:100-108).
            if cfg.fixed_exchange:
                outp = ex.y[-1]
            else:
                mprime = (ex.stop_masks
                          * (jnp.arange(T + 1) < n)[:, None, None])
                y_masks = (jnp.minimum(1.0 - mprime[1:], mprime[:-1])
                           * live[:, None, None])
                outp = jnp.sum(ex.y * y_masks, axis=0)
            dist = jax.nn.log_softmax(outp, axis=-1)
            # Rank counting, k clamped to the class count like the
            # host/reference argsort slice (same as losses.topk_accuracy:
            # identical membership on tie-free scores, no TopK
            # custom-call — partitionable on a sharded batch). Exactly
            # tied scores require bit-equal class scores (e.g. duplicate
            # description rows).
            tscore = jnp.take_along_axis(dist, target[:, None], axis=-1)
            rank = jnp.sum(dist > tscore, axis=-1)
            hits = jnp.sum(rank < min(top_k, dist.shape[-1]))
            pred = jnp.argmax(dist, axis=-1)

            # Conversation lengths: per-example stop-feat sum over executed
            # steps (model.py:671-672).
            conv_len = jnp.sum(ex.stop_feats * live[:, None, None],
                               axis=(0, 2))

            # Mean inter-step Hamming distance vs a zero step -1
            # (model.py:675-691).
            def hamming(feats_tbw):
                prev = jnp.concatenate(
                    [jnp.zeros_like(feats_tbw[:1]), feats_tbw[:-1]], axis=0)
                d = jnp.abs(feats_tbw - prev).sum(-1).mean(-1)    # (T,)
                return jnp.sum(d * live) / n
            mh_sen = hamming(ex.sen_feats)
            mh_rec = hamming(ex.rec_feats)

            return None, (hits, pred, conv_len, mh_sen, mh_rec)

        _, (hits, pred, conv_len, mh_sen, mh_rec) = jax.lax.scan(
            body, None, (idx, keys))
        spec = _fields(nb, idx.shape[1])
        return spec.pack(dict(hits=hits, pred=pred, conv_len=conv_len,
                              mh_sen=mh_sen, mh_rec=mh_rec))

    cache[top_k] = evaluate
    return evaluate


def _dev_eval_inputs(flags, modules, desc_pack):
    """Device copies of the dev-eval constants (descriptions, attention
    word sets, corruption mask). Cached on ``modules`` so the periodic
    dev cadence doesn't pay a fresh host-to-device transfer per call
    (advisor round-2 #1). The cache holds a strong reference to the pack
    and validates it with ``is`` — an ``id()`` key would collide if a
    freed pack's address were reused by a new one."""
    from multimodalgame_tpu.game.masks import build_mask

    cfg = modules.cfg
    ck = (flags.bit_flip, flags.corrupt_region)
    cached = getattr(modules, "_dev_eval_input_cache", None)
    if cached is not None:
        pack, key_, inputs = cached
        if pack is desc_pack and key_ == ck:
            return inputs
    corrupt = None
    if flags.bit_flip and flags.corrupt_region:
        corrupt = jnp.asarray(build_mask(flags.corrupt_region,
                                         cfg.rec_w_dim))
    inputs = dict(
        desc=jnp.asarray(desc_pack.desc),
        desc_set_padded=(jnp.asarray(desc_pack.desc_set_padded)
                         if cfg.desc_attn else None),
        desc_set_mask=(jnp.asarray(desc_pack.desc_set_mask)
                       if cfg.desc_attn else None),
        corrupt_mask=corrupt)
    # One live pack per run; replacing the entry drops stale arrays.
    modules._dev_eval_input_cache = (desc_pack, ck, inputs)
    return inputs


def run_device_dev_eval(flags, modules, params, desc_pack,
                        dev_ds: DeviceDataset, epoch: int, key,
                        row_placer=None, sync: bool = True):
    """Flag-driven wrapper around :func:`eval_dev_device`: builds the
    corruption mask and description-attention inputs from ``flags`` /
    ``desc_pack`` (device copies cached across calls), runs the sweep,
    and writes the confusion-matrix CSV — the shared dev-eval recipe of
    the training driver's cadence (game/driver.py) and the CLI
    ``-eval_only`` branch (train.py).

    ``row_placer`` optionally places the batch-index plan with an
    explicit sharding (the mesh driver shards the batch axis so the dev
    sweep runs data-parallel too). Returns ``(dev_acc, extra)``; with
    ``sync=False`` returns ``(payloads, finish)`` where ``finish()``
    fetches the payloads, writes the confusion-matrix CSV, and returns
    ``(dev_acc, extra)`` — the driver overlaps the fetch with subsequent
    training dispatch (VERDICT round-2 #5)."""
    inputs = _dev_eval_inputs(flags, modules, desc_pack)
    payloads, inner_finish = eval_dev_device(
        modules, params, dev_ds, epoch, flags.shuffle_dev,
        flags.batch_size_dev, flags.top_k_dev,
        inputs["desc"], key,
        desc_set_padded=inputs["desc_set_padded"],
        desc_set_mask=inputs["desc_set_mask"],
        corrupt_mask=inputs["corrupt_mask"],
        row_placer=row_placer, sync=False)

    def finish(host_payloads=None):
        # Pipelined: one round trip for all per-batch payloads instead
        # of one each (parallel/distributed.py:host_view_many). A caller
        # that already fetched the payloads inside its own batched round
        # trip (the driver folds them into the accuracy-backlog fetch)
        # passes the host copies in and no transfer happens here.
        if host_payloads is None:
            from multimodalgame_tpu.parallel.distributed import (
                host_view_many)
            host_payloads = host_view_many(payloads)
        dev_acc, extra, trues, preds = inner_finish(host_payloads)
        from sklearn.metrics import confusion_matrix
        np.savetxt(flags.conf_mat, confusion_matrix(trues, preds),
                   delimiter=",", fmt="%d")
        return dev_acc, extra

    if sync:
        return finish()
    return payloads, finish


def eval_dev_device(modules: AgentModules, params, dev_ds: DeviceDataset,
                    epoch: int, shuffle: bool, batch_size: int, top_k: int,
                    desc, key, desc_set_padded=None, desc_set_mask=None,
                    corrupt_mask=None, sync: bool = True,
                    row_placer=None):
    """Run the dev sweep.

    ``sync=True`` (the driver's and the default path) fetches the packed
    payloads immediately and returns ``(dev_acc, extra, true_labels,
    pred_labels)``. ``sync=False`` returns ``(payloads, finish)`` —
    device arrays plus the closure that turns their host copies into the
    statistics — for callers that want to overlap the fetch with other
    work (note the driver keeps the synchronous path: dev results must
    print before the following log lines for log-order parity).
    """
    if row_placer is None:
        row_placer = jnp.asarray
    idx = dev_ds.epoch_indices(epoch, shuffle, batch_size,
                               truncate_final_batch=True)
    if dev_ds.size == 0:
        raise ValueError("dev set is empty — nothing to evaluate")
    tail = None
    if idx.shape[0] and (idx[-1] < 0).any():
        tail = idx[-1][idx[-1] >= 0]
        idx = idx[:-1]
    evaluate = _get_evaluator(modules, top_k)

    key_full, key_tail = jax.random.split(key)
    calls = []  # (payload_device, spec, idx_rows)
    kwargs = dict(feats_context=dev_ds.context,
                  desc_set_padded=desc_set_padded,
                  desc_set_mask=desc_set_mask, corrupt_mask=corrupt_mask)
    if idx.shape[0]:
        flat = evaluate(params, dev_ds.feats, dev_ds.targets,
                        row_placer(idx), desc, key_full, **kwargs)
        calls.append((flat, _fields(idx.shape[0], idx.shape[1]), idx))
    if tail is not None and tail.size:
        flat = evaluate(params, dev_ds.feats, dev_ds.targets,
                        row_placer(tail[None]), desc, key_tail, **kwargs)
        calls.append((flat, _fields(1, tail.size), tail[None]))

    num_batches = len(idx) + (1 if tail is not None and tail.size else 0)

    def finish(host_flats) -> Tuple[float, Dict[str, float],
                                    np.ndarray, np.ndarray]:
        correct = 0.0
        conv_lens = []
        mh_sen, mh_rec = [], []
        preds = []
        trues = []
        for host_flat, (_, spec, rows) in zip(host_flats, calls):
            got = spec.unpack(host_flat)
            correct += float(got["hits"].sum())
            conv_lens.append(got["conv_len"].reshape(-1))
            mh_sen.append(got["mh_sen"])
            mh_rec.append(got["mh_rec"])
            preds.append(got["pred"].reshape(-1).astype(np.int64))
            trues.append(dev_ds.targets_host[rows.reshape(-1)])
        conv_lens = np.concatenate(conv_lens) if conv_lens else np.zeros(0)
        extra = {
            # Accuracy-denominator quirk: configured batch size per batch,
            # even for the ragged tail (model.py:667).
            "conversation_lengths_mean": float(conv_lens.mean()),
            "conversation_lengths_std": float(conv_lens.std()),
            "hamming_sen_mean": float(np.concatenate(mh_sen).mean()),
            "hamming_rec_mean": float(np.concatenate(mh_rec).mean()),
        }
        acc = correct / float(num_batches * batch_size)
        return (acc, extra, np.concatenate(trues),
                np.concatenate(preds))

    payloads = [c[0] for c in calls]
    if not sync:
        return payloads, finish
    from multimodalgame_tpu.parallel.distributed import host_view_many
    return finish(host_view_many(payloads))
