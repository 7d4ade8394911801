"""Development-set evaluation.

Parity target: reference ``eval_dev`` (model.py:580-722) — eval-mode
exchange per batch, masked prediction selection, top-k accuracy,
confusion-matrix CSV, conversation-length statistics from the stop feats,
and mean inter-step Hamming distance of sender/receiver messages.

The device side is one jitted eval exchange (full ``max_exchange`` steps);
ragged-list semantics are reproduced on host by slicing the stacked arrays
to ``n_steps`` — the number of steps the reference's break_early loop
would have executed — before computing statistics, so every number matches
the reference's including the stats' step denominators.

Reproduced quirk (flagged in SURVEY §2#7): the accuracy denominator adds
the *configured* batch size even for a truncated final batch
(model.py:667), slightly deflating accuracy when ``len(dev) % batch != 0``.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multimodalgame_tpu.data.descriptions import DescriptionPack
from multimodalgame_tpu.data.hdf5_loader import load_hdf5
from multimodalgame_tpu.game.masks import build_mask


def _log_softmax(x: np.ndarray) -> np.ndarray:
    m = x.max(axis=1, keepdims=True)
    s = x - m
    return s - np.log(np.exp(s).sum(axis=1, keepdims=True))


def sliced_masks(stop_masks: np.ndarray, n: int) -> list:
    """Reconstruct the reference's ``s_masks`` list for an ``n``-step
    conversation: entries ``[ones, m_1, ..., m_n]`` with the final entry
    forced to zero (model.py:775, 852, 870)."""
    masks = [stop_masks[t].copy() for t in range(n + 1)]
    masks[n][:] = 0.0
    return masks


def eval_dev(flags, modules, params, eval_exchange: Callable,
             dev_file: str, batch_size: int, epoch: int, shuffle: bool,
             top_k: int, desc_pack: DescriptionPack,
             key: Optional[jax.Array] = None,
             callback: Optional[Callable] = None
             ) -> Tuple[float, Dict[str, float]]:
    """Compute development accuracy and conversation statistics."""
    cfg = modules.cfg
    desc = jnp.asarray(desc_pack.desc)
    padded = jnp.asarray(desc_pack.desc_set_padded) if cfg.desc_attn else None
    pmask = jnp.asarray(desc_pack.desc_set_mask) if cfg.desc_attn else None
    corrupt = None
    if flags.bit_flip and flags.corrupt_region:
        corrupt = jnp.asarray(build_mask(flags.corrupt_region, cfg.rec_w_dim))
    if key is None:
        key = jax.random.PRNGKey(0)

    extra: Dict[str, float] = {}
    conversation_lengths = []
    hamming_sen = []
    hamming_rec = []
    true_labels = []
    pred_labels = []
    total = 0.0
    correct = 0

    dev_loader = load_hdf5(dev_file, batch_size, epoch, shuffle,
                           truncate_final_batch=True,
                           map_labels=desc_pack.map_labels)

    for batch in dev_loader:
        target = np.asarray(batch["target"])
        data = jnp.asarray(batch[flags.img_feat])
        _batch_size = target.shape[0]
        true_labels.append(target.reshape(-1))

        key, sub = jax.random.split(key)
        kwargs = {}
        if flags.attn_extra_context:
            kwargs["data_context"] = jnp.asarray(batch[flags.data_context])
        ex = eval_exchange(params, data, desc, sub,
                           desc_set_padded=padded, desc_set_mask=pmask,
                           corrupt_mask=corrupt,
                           use_corrupt=corrupt is not None, **kwargs)

        # One batched D2H transfer for the whole conversation record —
        # per-array np.asarray would pay a tunnel round trip each.
        ex = jax.device_get(ex)
        n = int(ex.n_steps)
        stop_masks = np.asarray(ex.stop_masks)
        s_masks = sliced_masks(stop_masks, n)
        s_feats = np.asarray(ex.stop_feats)[:n]
        sen_feats = np.asarray(ex.sen_feats)[:n]
        rec_feats = np.asarray(ex.rec_feats)[:n]
        y = np.asarray(ex.y)[:n]

        # Masked prediction selection (model.py:648-654).
        if flags.fixed_exchange:
            outp = y[-1]
        else:
            y_masks = np.stack(
                [np.minimum(1 - m1, m2)
                 for m1, m2 in zip(s_masks[1:], s_masks[:-1])], 0)
            outp = (y * y_masks).sum(axis=0)

        dist = _log_softmax(outp)
        top_k_ind = dist.argsort(axis=1)[:, -top_k:]
        argmax = dist.argmax(axis=1)
        pred_labels.append(argmax)

        # Accuracy-denominator quirk: configured batch size, not actual
        # (model.py:667).
        total += float(batch_size)
        correct += int((top_k_ind == target.reshape(-1, 1)).sum())

        # Conversation lengths: per-example sum of stop feats over executed
        # steps (model.py:671-672).
        conversation_lengths += list(
            s_feats.sum(axis=(0, 2)).reshape(-1))

        # Message diversity: mean inter-step Hamming distance, against a
        # zero message before step 0 (model.py:675-691).
        prev = np.zeros_like(sen_feats[0])
        mh_sen = 0.0
        for t in range(n):
            mh_sen += float(np.abs(sen_feats[t] - prev).sum(1).mean())
            prev = sen_feats[t]
        hamming_sen.append(mh_sen / float(n))
        prev = np.zeros_like(rec_feats[0])
        mh_rec = 0.0
        for t in range(n):
            mh_rec += float(np.abs(rec_feats[t] - prev).sum(1).mean())
            prev = rec_feats[t]
        hamming_rec.append(mh_rec / float(n))

        if callback is not None:
            callback(params, batch, dict(
                s_masks=s_masks, s_feats=s_feats,
                s_probs=np.asarray(ex.stop_probs)[:n],
                sen_feats=sen_feats,
                sen_probs=np.asarray(ex.sen_probs)[:n],
                rec_feats=rec_feats,
                rec_probs=np.asarray(ex.rec_probs)[:n],
                y=y))

    if total == 0:
        raise ValueError("dev set is empty — nothing to evaluate")

    # Confusion matrix CSV (model.py:706-710).
    true_labels = np.concatenate(true_labels).reshape(-1)
    pred_labels = np.concatenate(pred_labels).reshape(-1)
    from sklearn.metrics import confusion_matrix
    np.savetxt(flags.conf_mat, confusion_matrix(true_labels, pred_labels),
               delimiter=",", fmt="%d")

    conversation_lengths = np.array(conversation_lengths)
    extra["conversation_lengths_mean"] = float(conversation_lengths.mean())
    extra["conversation_lengths_std"] = float(conversation_lengths.std())
    extra["hamming_sen_mean"] = float(np.array(hamming_sen).mean())
    extra["hamming_rec_mean"] = float(np.array(hamming_rec).mean())

    return correct / total, extra
