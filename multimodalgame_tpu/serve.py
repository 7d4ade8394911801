"""Batch inference / serving API.

The reference has no serving story — evaluation is entangled with the
training driver. This module packages the deterministic eval conversation
as a standalone, checkpoint-loadable predictor for production use:

* one jitted program (optionally the fused Pallas kernel) per batch shape;
* returns predictions, per-class scores, conversation lengths, and the
  full message record;
* accepts either this framework's msgpack checkpoints or reference-layout
  ``.pt`` files (utils/torch_interop.py).

CLI: ``python -m multimodalgame_tpu.serve -checkpoint <path> -log_load
<train json> -dev_file <hdf5>`` prints JSONL predictions.
"""

from __future__ import annotations

import json
import os
import sys
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from multimodalgame_tpu.config import Flags
from multimodalgame_tpu.data.descriptions import DescriptionPack
from multimodalgame_tpu.game.agents import AgentModules, init_params
from multimodalgame_tpu.game.config import GameConfig
from multimodalgame_tpu.game.train import make_eval_exchange
from multimodalgame_tpu.game.masks import assemble_loss_masks
from multimodalgame_tpu.game.losses import get_rec_outp


class Predictor:
    """Checkpoint-backed batched game predictor.

    ``mesh`` (a ``jax.sharding.Mesh``, e.g. ``parallel.mesh.make_mesh()``)
    serves data-parallel: parameters/descriptions replicate, each request
    batch shards on its leading axis (batch sizes divisible by the mesh
    shard evenly; others fall back to replicated execution), and the same
    compiled conversation runs SPMD — the -mesh recipe of the training
    driver applied to inference."""

    def __init__(self, cfg: GameConfig, params: Dict,
                 desc_pack: DescriptionPack, use_pallas: bool = False,
                 mesh=None):
        self.cfg = cfg
        self.params = params
        self.desc_pack = desc_pack
        self._desc = jnp.asarray(desc_pack.desc)
        self._padded = (jnp.asarray(desc_pack.desc_set_padded)
                        if cfg.desc_attn else None)
        self._pmask = (jnp.asarray(desc_pack.desc_set_mask)
                       if cfg.desc_attn else None)
        self._mesh = mesh
        self._placer = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from multimodalgame_tpu.parallel.mesh import axis_placer
            rep = NamedSharding(mesh, P())
            self.params = jax.device_put(self.params, rep)
            self._desc = jax.device_put(self._desc, rep)
            if self._padded is not None:
                self._padded = jax.device_put(self._padded, rep)
                self._pmask = jax.device_put(self._pmask, rep)
            # Request batches shard on their leading axis; ragged batches
            # replicate (parallel/mesh.py shared helper).
            self._placer = axis_placer(mesh, axis=0)
        self._modules = AgentModules(cfg)
        self._exchange = make_eval_exchange(self._modules,
                                            use_pallas=use_pallas)
        self._select = jax.jit(self._select_fn)

    def _place(self, x):
        if x is None or self._placer is None:
            return x
        return self._placer(x)

    def _select_fn(self, y, stop_masks):
        # Fixed exchanges score the LAST step, exactly like training
        # (game/train.py masks=None) and eval.py (y[-1]): the stop unit
        # gets no training signal in fixed mode, so its masks would pick
        # arbitrary earlier steps' logits.
        if self.cfg.fixed_exchange:
            y_masks = None
        else:
            y_masks = assemble_loss_masks(stop_masks).y
        outp, _ = get_rec_outp(y, y_masks)
        return jax.nn.log_softmax(outp, axis=-1)

    @classmethod
    def from_checkpoint(cls, flags: Flags, desc_pack: DescriptionPack,
                        use_pallas: bool = False, mesh=None) -> "Predictor":
        """Load from ``flags.checkpoint`` — msgpack (native) or ``.pt``
        (reference layout)."""
        cfg = GameConfig.from_flags(flags)
        modules = AgentModules(cfg)
        params = init_params(modules, jax.random.PRNGKey(0),
                             num_classes=desc_pack.num_classes,
                             max_words=max(desc_pack.desc_set_lens))
        path = flags.checkpoint
        if path.endswith(".pt") or path.endswith(".pt_best"):
            try:
                from multimodalgame_tpu.utils.checkpoint import (
                    load_checkpoint)
                _, params, _ = load_checkpoint(
                    path, params, _opt_placeholder(cfg, params))
            except Exception:
                from multimodalgame_tpu.utils.torch_interop import (
                    load_reference_checkpoint)
                _, params = load_reference_checkpoint(path, params)
        else:
            from multimodalgame_tpu.utils.checkpoint import load_checkpoint
            _, params, _ = load_checkpoint(path, params,
                                           _opt_placeholder(cfg, params))
        return cls(cfg, params, desc_pack, use_pallas=use_pallas,
                   mesh=mesh)

    def predict(self, features: np.ndarray,
                data_context: Optional[np.ndarray] = None) -> Dict:
        """Run conversations for a feature batch.

        Returns dict with ``prediction`` (B,), ``log_probs`` (B, D),
        ``conversation_length`` (B,), ``sender_messages`` /
        ``receiver_messages`` (n, B, W), and ``n_steps``.
        """
        data = self._place(jnp.asarray(features, jnp.float32))
        ctx = (None if data_context is None
               else self._place(jnp.asarray(data_context, jnp.float32)))
        ex = self._exchange(self.params, data, self._desc,
                            jax.random.PRNGKey(0),
                            desc_set_padded=self._padded,
                            desc_set_mask=self._pmask,
                            data_context=ctx)
        dist, ex = jax.device_get((self._select(ex.y, ex.stop_masks), ex))
        n = int(ex.n_steps)
        return {
            "prediction": dist.argmax(axis=1),
            "log_probs": dist,
            "conversation_length": np.asarray(
                ex.stop_feats[:n]).sum(axis=(0, 2)),
            "sender_messages": np.asarray(ex.sen_feats[:n]),
            "receiver_messages": np.asarray(ex.rec_feats[:n]),
            "n_steps": n,
        }


def _opt_placeholder(cfg, params):
    from multimodalgame_tpu.game.train import init_opt_states
    return init_opt_states(cfg, params)


def main(argv=None) -> None:
    from multimodalgame_tpu.config import flags_from_argv
    from multimodalgame_tpu.data.descriptions import load_descriptions
    from multimodalgame_tpu.data.hdf5_loader import load_hdf5

    flags = flags_from_argv(argv)
    desc_pack = load_descriptions(flags.descr_dev, flags.wv_type,
                                  flags.wv_dim, glove_path=flags.glove_path)
    mesh = None
    n_mesh = int(getattr(flags, "mesh", 0) or 0)
    if int(getattr(flags, "mesh_model", 0) or 0) > 1:
        raise ValueError(
            "-mesh_model is a training-driver option; serving shards "
            "the request batch axis only — drop -mesh_model")
    if n_mesh == -1 or n_mesh > 1:
        from multimodalgame_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(None if n_mesh == -1 else n_mesh)
    # Same fused-kernel opt-in the training/eval CLI honors (train.py).
    pred = Predictor.from_checkpoint(
        flags, desc_pack,
        use_pallas=os.environ.get("MMG_USE_PALLAS_EVAL") == "1",
        mesh=mesh)
    for batch in load_hdf5(flags.dev_file, flags.batch_size_dev, 0,
                           shuffle=False, truncate_final_batch=True,
                           map_labels=desc_pack.map_labels):
        # Attention-with-context checkpoints need the fc context vector
        # (same contract as eval.py / extract.py).
        ctx = (batch[flags.data_context] if pred.cfg.attn_extra_context
               else None)
        out = pred.predict(batch[flags.img_feat], data_context=ctx)
        for ex_id, p, true in zip(batch["example_ids"], out["prediction"],
                                  batch["target"]):
            print(json.dumps({
                "example_id": ex_id.decode() if isinstance(ex_id, bytes)
                else str(ex_id),
                "prediction": int(p),
                "label": pred.desc_pack.idx_to_label.get(int(p)),
                "target": int(true),
            }))


if __name__ == "__main__":
    main(sys.argv[1:])
