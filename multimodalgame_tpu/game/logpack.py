"""Interval-log payload packing: everything one log window prints, in one
device->host transfer.

The reference's interval logging (model.py:1341-1518) reads a dozen
tensors per log step; on a tunnel-attached TPU each read is a ~30 ms round
trip (utils/device_pack.py). Here a jitted packer slices the conversation
record down to the ``exchange_samples`` rows the sparkline dumps actually
show and concatenates every logged quantity — losses, entropies, argmax,
the train-mode dump, and the re-run eval-mode dump (model.py:1463-1465) —
into one flat vector. The driver fetches it with a single transfer and
formats the log lines from the unpacked host copy.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from multimodalgame_tpu.game.config import GameConfig
from multimodalgame_tpu.game.exchange import ExchangeOutputs
from multimodalgame_tpu.game.train import TrainMetrics
from multimodalgame_tpu.utils.device_pack import PackSpec


def _dump_fields(prefix: str, T: int, S: int, w_dim: int, s_dim: int):
    """The per-conversation-dump fields (train or eval flavor)."""
    return [
        (prefix + "sen_probs", (T, S, w_dim)),
        (prefix + "sen_feats", (T, S, w_dim)),
        (prefix + "rec_probs", (T, S, w_dim)),
        (prefix + "rec_feats", (T, S, w_dim)),
        (prefix + "stop_probs", (T, S, s_dim)),
        (prefix + "stop_masks_post", (T, S, 1)),
        (prefix + "n_steps", ()),
    ]


class LogPacker:
    """Builds and decodes the one-transfer interval-log payload."""

    def __init__(self, cfg: GameConfig, batch: int, n_samples: int):
        self.cfg = cfg
        self.n_samples = n_samples
        T = cfg.max_exchange
        fields = [
            ("loss_sen", ()), ("nll_loss", ()), ("loss_binary_rec", ()),
            ("loss_binary_s", ()), ("loss_bas_sen", ()),
            ("loss_bas_rec", ()), ("accuracy", ()), ("n_steps", ()),
            ("argmax", (batch,)),
            ("ent_binary_sen", (T,)),
            ("ent_binary_rec", (max(T - 1, 0),)),
            ("ent_y_rec", (T,)),
        ]
        if n_samples > 0:
            fields += _dump_fields("train_", T, n_samples,
                                   cfg.sender_out_dim, cfg.rec_s_dim)
            fields += _dump_fields("eval_", T, n_samples,
                                   cfg.sender_out_dim, cfg.rec_s_dim)
        self.spec = PackSpec(fields)
        self._pack = jax.jit(functools.partial(_pack_impl, self.spec,
                                               n_samples))

    def pack(self, m: TrainMetrics,
             ex_eval: Optional[ExchangeOutputs]) -> jnp.ndarray:
        """Device op: returns the ``(total,)`` f32 payload."""
        return self._pack(m, ex_eval)

    def unpack(self, flat: np.ndarray) -> Dict[str, np.ndarray]:
        return self.spec.unpack(flat)


def _dump_values(prefix: str, ex: ExchangeOutputs, S: int):
    return {
        prefix + "sen_probs": ex.sen_probs[:, :S],
        prefix + "sen_feats": ex.sen_feats[:, :S],
        prefix + "rec_probs": ex.rec_probs[:, :S],
        prefix + "rec_feats": ex.rec_feats[:, :S],
        prefix + "stop_probs": ex.stop_probs[:, :S],
        # Post-step masks: the reference's s_masks[1:] (model.py:852).
        prefix + "stop_masks_post": ex.stop_masks[1:, :S],
        prefix + "n_steps": ex.n_steps,
    }


def _pack_impl(spec: PackSpec, n_samples: int, m: TrainMetrics,
               ex_eval: Optional[ExchangeOutputs]) -> jnp.ndarray:
    values = {
        "loss_sen": m.loss_sen, "nll_loss": m.nll_loss,
        "loss_binary_rec": m.loss_binary_rec,
        "loss_binary_s": m.loss_binary_s,
        "loss_bas_sen": m.loss_bas_sen, "loss_bas_rec": m.loss_bas_rec,
        "accuracy": m.accuracy, "n_steps": m.exchange.n_steps,
        "argmax": m.argmax,
        "ent_binary_sen": m.ent_binary_sen,
        "ent_binary_rec": m.ent_binary_rec,
        "ent_y_rec": m.ent_y_rec,
    }
    if n_samples > 0:
        values.update(_dump_values("train_", m.exchange, n_samples))
        if ex_eval is not None:
            values.update(_dump_values("eval_", ex_eval, n_samples))
    return spec.pack(values)
