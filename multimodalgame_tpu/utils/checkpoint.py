"""Checkpoint / resume.

Parity target: the reference's single-file torch checkpoint
(misc.py:58-92) containing ``{data: {step, best_dev_acc},
models: {4 state_dicts}, optimizers: {4 state_dicts}}``, saved to
``FLAGS.checkpoint`` (periodic) and ``FLAGS.checkpoint + "_best"`` on dev
improvement (model.py:1569-1584), with auto-resume when the file exists
(model.py:1149-1156).

Format: flax ``state_dict`` trees serialized with msgpack — a single
self-contained file, all tensors on host (the reference also forces CPU
before writing, misc.py:64). Loading restores into caller-provided
templates so optimizer-state pytree structure round-trips exactly.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Tuple

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(filename: str, data: Dict[str, Any],
                    params: Dict[str, Any], opt_states: Dict[str, Any]
                    ) -> None:
    """Write ``{data, models, optimizers}`` to one msgpack file
    (atomic rename so a crash can't truncate an existing checkpoint)."""
    payload = {
        "data": {k: np.asarray(v) for k, v in data.items()},
        "models": serialization.to_state_dict(_to_host(params)),
        "optimizers": serialization.to_state_dict(_to_host(opt_states)),
    }
    blob = serialization.msgpack_serialize(payload)
    tmp = filename + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, filename)


def load_checkpoint(filename: str, params: Dict[str, Any],
                    opt_states: Dict[str, Any]
                    ) -> Tuple[Dict[str, Any], Dict[str, Any], Dict[str, Any]]:
    """Restore ``(data, params, opt_states)`` from ``filename`` using the
    given templates for pytree structure (reference misc.py:78-92)."""
    filename = os.path.expanduser(filename)
    if not os.path.exists(filename):
        raise FileNotFoundError("File does not exist: " + filename)
    with open(filename, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    new_params = serialization.from_state_dict(params, payload["models"])
    new_opts = serialization.from_state_dict(opt_states, payload["optimizers"])
    data = {k: (v.item() if hasattr(v, "item") and getattr(v, "ndim", 1) == 0
                else v)
            for k, v in payload["data"].items()}
    return data, new_params, new_opts
