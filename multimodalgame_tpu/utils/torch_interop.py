"""Interop with the reference's torch checkpoint layout.

The reference checkpoints four torch ``state_dict``s plus metadata into
one ``.pt`` file (misc.py:58-92). This module maps between that layout
and this framework's parameter trees so users can migrate:

* ``params_to_torch_state`` / ``params_from_torch_state`` — pure
  array-layout conversion (torch Linear ``weight`` is the transpose of a
  flax ``kernel``; GRU matrices are the transposed torch ``[r|z|n]``
  stacks; ``y1`` round-trips to the reference's single concat matrix).
* ``save_reference_checkpoint`` / ``load_reference_checkpoint`` — read
  and write actual ``.pt`` files (requires torch). Model weights and the
  ``{step, best_dev_acc}`` metadata transfer exactly; optimizer state is
  NOT converted (torch and optax slot layouts differ) — optimizers
  restart, which matches a fine-tuning hand-off.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

_DENSE_KEYS = {
    "sender": ["image_layer", "code_layer", "binary_layer", "attn_W_x",
               "attn_W_w", "attn_U", "attn_W_g"],
    "receiver": ["w_h", "w_d", "w", "y2", "s", "d_d", "d_h", "d_attn"],
    "baseline_sen": ["linear1", "linear2"],
    "baseline_rec": ["linear1", "linear2"],
}


def _np(x) -> np.ndarray:
    return np.asarray(x)


def params_to_torch_state(params: Dict[str, Any]) -> Dict[str, Dict]:
    """Convert the four parameter trees to torch-layout state dicts
    (numpy arrays; pass to ``torch.save`` via
    :func:`save_reference_checkpoint`)."""
    out: Dict[str, Dict[str, np.ndarray]] = {}
    for agent, tree in params.items():
        sd: Dict[str, np.ndarray] = {}
        for name in _DENSE_KEYS.get(agent, []):
            if name not in tree:
                continue
            sd[name + ".weight"] = _np(tree[name]["kernel"]).T
            if "bias" in tree[name]:
                sd[name + ".bias"] = _np(tree[name]["bias"])
        if agent == "sender":
            sd["code_bias"] = _np(tree["code_bias"])
            if "code_bias_mou" in tree:
                sd["code_bias_mou"] = _np(tree["code_bias_mou"])
        if agent == "receiver":
            sd["rnn.weight_ih"] = _np(tree["rnn"]["w_ih"]).T
            sd["rnn.weight_hh"] = _np(tree["rnn"]["w_hh"]).T
            sd["rnn.bias_ih"] = _np(tree["rnn"]["b_ih"])
            sd["rnn.bias_hh"] = _np(tree["rnn"]["b_hh"])
            sd["y1.weight"] = _np(tree["y1_kernel"]).T
            sd["y1.bias"] = _np(tree["y1_bias"])
        out[agent] = sd
    return out


def params_from_torch_state(params: Dict[str, Any],
                            state: Dict[str, Dict]) -> Dict[str, Any]:
    """Inverse of :func:`params_to_torch_state`; ``params`` provides the
    template structure (and any entries absent from ``state``)."""
    import jax

    new = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
    for agent, sd in state.items():
        tree = dict(new[agent])
        for name in _DENSE_KEYS.get(agent, []):
            if name + ".weight" not in sd:
                continue
            entry = dict(tree[name])
            entry["kernel"] = _np(sd[name + ".weight"]).T
            if name + ".bias" in sd and "bias" in entry:
                entry["bias"] = _np(sd[name + ".bias"])
            tree[name] = entry
        if agent == "sender" and "code_bias" in sd:
            tree["code_bias"] = _np(sd["code_bias"])
            if "code_bias_mou" in sd:
                tree["code_bias_mou"] = _np(sd["code_bias_mou"])
        if agent == "receiver" and "rnn.weight_ih" in sd:
            tree["rnn"] = {
                "w_ih": _np(sd["rnn.weight_ih"]).T,
                "w_hh": _np(sd["rnn.weight_hh"]).T,
                "b_ih": _np(sd["rnn.bias_ih"]),
                "b_hh": _np(sd["rnn.bias_hh"]),
            }
            tree["y1_kernel"] = _np(sd["y1.weight"]).T
            tree["y1_bias"] = _np(sd["y1.bias"])
        new[agent] = tree
    return new


# The reference's model-name keys inside the checkpoint file
# (model.py:1141-1142).
_REF_NAMES = {"sender": "sender", "receiver": "receiver",
              "baseline_sen": "baseline_sen", "baseline_rec": "baseline_rec"}


def save_reference_checkpoint(path: str, data: Dict[str, Any],
                              params: Dict[str, Any]) -> None:
    """Write a reference-layout ``.pt``: ``{data, models: {...}}``
    (optimizer slots are written empty)."""
    import torch
    state = params_to_torch_state(params)
    payload = {
        "data": dict(data),
        "models": {_REF_NAMES[k]: {kk: torch.from_numpy(
            np.ascontiguousarray(vv).copy()) for kk, vv in v.items()}
            for k, v in state.items()},
        "optimizers": {k: {} for k in _REF_NAMES.values()},
    }
    torch.save(payload, path)


def load_reference_checkpoint(path: str, params: Dict[str, Any]):
    """Load a reference-layout ``.pt`` into our parameter trees. Returns
    ``(data, new_params)``."""
    import torch
    payload = torch.load(path, map_location="cpu", weights_only=False)
    state = {
        ours: {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
               for k, v in payload["models"][ref].items()}
        for ours, ref in _REF_NAMES.items() if ref in payload["models"]}
    return payload["data"], params_from_torch_state(params, state)
