"""Agent construction and parameter initialization.

Mirrors the four-model build in the reference's ``run()``
(model.py:1013-1064): Sender, Receiver, and the two Baseline value
networks, each with its own parameter tree so the four-optimizer update
(model.py:1307-1330) partitions cleanly.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from multimodalgame_tpu.game.config import GameConfig
from multimodalgame_tpu.models.baseline import Baseline
from multimodalgame_tpu.models.receiver import Receiver
from multimodalgame_tpu.models.sender import Sender


class AgentModules:
    """The four flax module definitions (stateless)."""

    def __init__(self, cfg: GameConfig):
        self.cfg = cfg
        self.sender = Sender(
            feat_dim=cfg.img_feat_dim,
            h_dim=cfg.img_h_dim,
            w_dim=cfg.rec_w_dim,
            bin_dim_out=cfg.sender_out_dim,
            use_binary=cfg.use_binary,
            use_attn=cfg.visual_attn,
            attn_dim=cfg.attn_dim,
            attn_extra_context=cfg.attn_extra_context,
            attn_context_dim=cfg.attn_context_dim,
            sender_mix=cfg.sender_mix,
            ignore_code=cfg.ignore_code)
        self.receiver = Receiver(
            z_dim=cfg.sender_out_dim,
            desc_dim=cfg.wv_dim,
            hid_dim=cfg.rec_hidden,
            out_dim=cfg.rec_out_dim,
            w_dim=cfg.rec_w_dim,
            s_dim=cfg.rec_s_dim,
            use_binary=cfg.use_binary,
            desc_attn=cfg.desc_attn,
            desc_attn_dim=cfg.desc_attn_dim)
        # Sender baseline sees (h_x, z_r); Receiver baseline (z_s, h_z)
        # (model.py:1031-1034, 1056-1059).
        self.baseline_sen = Baseline(
            hid_dim=cfg.baseline_hid_dim, x_dim=cfg.img_h_dim,
            binary_dim=cfg.rec_w_dim, inp_dim=0)
        self.baseline_rec = Baseline(
            hid_dim=cfg.baseline_hid_dim, x_dim=0,
            binary_dim=cfg.rec_w_dim, inp_dim=cfg.rec_hidden)


def _sample_image(cfg: GameConfig, batch: int = 1) -> jnp.ndarray:
    if cfg.visual_attn:
        return jnp.zeros((batch, cfg.img_feat_dim, 8, 8), jnp.float32)
    return jnp.zeros((batch, cfg.img_feat_dim), jnp.float32)


def init_params(modules: AgentModules, key: jax.Array,
                num_classes: int = 2, max_words: int = 3
                ) -> Dict[str, dict]:
    """Initialize the four parameter trees with the reference's init
    schemes (see models/init.py)."""
    cfg = modules.cfg
    k_sen, k_rec, k_bs, k_br = jax.random.split(key, 4)

    x = _sample_image(cfg)
    g = (jnp.zeros((1, cfg.attn_context_dim), jnp.float32)
         if cfg.attn_extra_context else None)
    w = jnp.zeros((1, cfg.rec_w_dim), jnp.float32)
    sender_vars = modules.sender.init(k_sen, x, w, g, jnp.int32(0))

    z = jnp.zeros((1, cfg.sender_out_dim), jnp.float32)
    h_z = jnp.zeros((1, cfg.rec_hidden), jnp.float32)
    desc = jnp.zeros((num_classes, cfg.wv_dim), jnp.float32)
    padded = (jnp.zeros((num_classes, max_words, cfg.wv_dim), jnp.float32)
              if cfg.desc_attn else None)
    mask = (jnp.ones((num_classes, max_words), jnp.float32)
            if cfg.desc_attn else None)
    receiver_vars = modules.receiver.init(k_rec, z, h_z, desc, padded, mask)

    h_x = jnp.zeros((1, cfg.img_h_dim), jnp.float32)
    bs_vars = modules.baseline_sen.init(k_bs, h_x, w, None)
    br_vars = modules.baseline_rec.init(k_br, None, z, h_z)

    return {
        "sender": sender_vars["params"],
        "receiver": receiver_vars["params"],
        "baseline_sen": bs_vars["params"],
        "baseline_rec": br_vars["params"],
    }


def param_count(tree) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(tree))
