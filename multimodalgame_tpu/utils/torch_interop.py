"""Interop with the reference's torch checkpoint layout.

The reference checkpoints four torch ``state_dict``s plus metadata into
one ``.pt`` file (misc.py:58-92). This module maps between that layout
and this framework's parameter trees so users can migrate:

* ``params_to_torch_state`` / ``params_from_torch_state`` — pure
  array-layout conversion (torch Linear ``weight`` is the transpose of a
  flax ``kernel``; GRU matrices are the transposed torch ``[r|z|n]``
  stacks; ``y1`` round-trips to the reference's single concat matrix).
* ``save_reference_checkpoint`` / ``load_reference_checkpoint`` — read
  and write actual ``.pt`` files (requires torch). Model weights, the
  ``{step, best_dev_acc}`` metadata, AND optimizer accumulators transfer:
  torch RMSprop ``square_avg`` <-> optax rmsprop ``nu``, Adam
  ``exp_avg``/``exp_avg_sq``/``step`` <-> ``mu``/``nu``/``count`` (the
  reference restores all four optimizer state_dicts, misc.py:78-92).
  Torch orders optimizer slots by ``Module.parameters()`` position, so
  conversion pins the reference modules' registration order
  (model.py:56-87, 256-271, 492-494). Caveat: torch RMSprop also tracks a
  per-param ``step`` count optax's rmsprop has no slot for — it is
  written on save and ignored on load (it does not affect updates for
  vanilla RMSprop).
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


def _torch_param_entries(agent: str, tree: Dict[str, Any]):
    """The agent's parameters in torch ``Module.parameters()`` order.

    Returns ``[(torch_name, our_path, transpose)]`` where ``our_path`` is
    a key tuple into our tree and ``transpose`` marks 2-D weights stored
    transposed. Order = the reference modules' registration order: direct
    Parameters first, then submodules (torch ``named_parameters``
    traversal; reference model.py:56-87 [Sender], 256-271 [Receiver],
    492-494 [Baseline]).
    """
    entries = []

    def dense(name):
        entries.append((name + ".weight", (name, "kernel"), True))
        if "bias" in tree.get(name, {}):
            entries.append((name + ".bias", (name, "bias"), False))

    if agent == "sender":
        entries.append(("code_bias", ("code_bias",), False))
        if "code_bias_mou" in tree:
            entries.append(("code_bias_mou", ("code_bias_mou",), False))
        for name in ("image_layer", "code_layer", "binary_layer",
                     "attn_W_x", "attn_W_w", "attn_U", "attn_W_g"):
            if name in tree:
                dense(name)
    elif agent == "receiver":
        for gk, ours in (("weight_ih", "w_ih"), ("weight_hh", "w_hh"),
                         ("bias_ih", "b_ih"), ("bias_hh", "b_hh")):
            entries.append(("rnn." + gk, ("rnn", ours),
                            gk.startswith("weight")))
        dense("w_h")
        dense("w_d")
        dense("w")
        entries.append(("y1.weight", ("y1_kernel",), True))
        entries.append(("y1.bias", ("y1_bias",), False))
        dense("y2")
        dense("s")
        for name in ("d_d", "d_h", "d_attn"):
            if name in tree:
                dense(name)
    else:  # baselines
        dense("linear1")
        dense("linear2")
    return entries


def _tree_get(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def _state_field_leaves(opt_state) -> Dict[str, list]:
    """Indices of ``opt_state``'s flat leaves grouped by the optax state
    field (``nu``/``mu``/``count``) they live under."""
    import jax

    out: Dict[str, list] = {}
    flat = jax.tree_util.tree_flatten_with_path(opt_state)[0]
    for i, (path, _) in enumerate(flat):
        for k in path:
            name = getattr(k, "name", None)
            if name in ("nu", "mu", "count"):
                out.setdefault(name, []).append(i)
                break
    return out


def opt_state_to_torch(agent: str, tree: Dict[str, Any], opt_state,
                       optim_type: str, step: int = 0) -> Dict[str, Any]:
    """Our optax chain state -> a torch optimizer ``state_dict`` (numpy
    values; slot arrays transposed like their parameters)."""
    import jax

    entries = _torch_param_entries(agent, tree)
    leaves = [l for _, l in
              jax.tree_util.tree_flatten_with_path(opt_state)[0]]
    fields = _state_field_leaves(opt_state)

    def moment_values(field):
        idxs = fields.get(field, [])
        # The moment sub-tree mirrors the param tree: same flatten order
        # (dict keys sorted) — map through the param tree's own order.
        ptree_paths = [p for p, _ in
                       jax.tree_util.tree_flatten_with_path(tree)[0]]
        assert len(idxs) == len(ptree_paths)
        by_path = {}
        for (path, _), i in zip(
                jax.tree_util.tree_flatten_with_path(tree)[0], idxs):
            key = tuple(getattr(k, "key", getattr(k, "name", None))
                        for k in path)
            by_path[key] = np.asarray(leaves[i])
        return by_path

    state: Dict[int, Dict[str, Any]] = {}
    if optim_type == "RMSprop":
        nu = moment_values("nu")
        for i, (tname, path, transpose) in enumerate(entries):
            v = nu[path]
            state[i] = {"step": int(step),
                        "square_avg": v.T if transpose else v}
    elif optim_type == "Adam":
        nu = moment_values("nu")
        mu = moment_values("mu")
        count = int(np.asarray(leaves[fields["count"][0]]))
        for i, (tname, path, transpose) in enumerate(entries):
            state[i] = {"step": count,
                        "exp_avg": (mu[path].T if transpose else mu[path]),
                        "exp_avg_sq": (nu[path].T if transpose
                                       else nu[path])}
    else:  # SGD (no momentum): stateless
        pass
    return {"state": state,
            "param_groups": [{"params": list(range(len(entries)))}]}


def opt_state_from_torch(agent: str, tree: Dict[str, Any], opt_state,
                         torch_sd: Dict[str, Any], optim_type: str):
    """Inverse of :func:`opt_state_to_torch`: write the torch slots into
    a (template) optax state, matching by parameter order."""
    import jax

    entries = _torch_param_entries(agent, tree)
    flat = jax.tree_util.tree_flatten_with_path(opt_state)
    leaves = [l for _, l in flat[0]]
    treedef = jax.tree_util.tree_structure(opt_state)
    fields = _state_field_leaves(opt_state)
    ptree_paths = [tuple(getattr(k, "key", getattr(k, "name", None))
                         for k in p)
                   for p, _ in jax.tree_util.tree_flatten_with_path(
                       tree)[0]]
    tstate = {int(k): v for k, v in torch_sd.get("state", {}).items()}
    if not tstate:
        return opt_state

    def write(field, slot):
        idxs = fields.get(field, [])
        assert len(idxs) == len(ptree_paths)
        path_to_leaf = dict(zip(ptree_paths, idxs))
        for i, (tname, path, transpose) in enumerate(entries):
            if i not in tstate:
                continue
            v = np.asarray(tstate[i][slot], dtype=np.float32)
            leaves[path_to_leaf[path]] = v.T if transpose else v

    if optim_type == "RMSprop":
        write("nu", "square_avg")
    elif optim_type == "Adam":
        write("nu", "exp_avg_sq")
        write("mu", "exp_avg")
        steps = [int(v.get("step", 0)) for v in tstate.values()]
        for i in fields.get("count", []):
            leaves[i] = np.asarray(max(steps), dtype=np.int32)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_reference_checkpoint(path: str, data: Dict[str, Any],
                              params: Dict[str, Any],
                              opt_states: Dict[str, Any] = None,
                              optim_type: str = "RMSprop") -> None:
    """Write a reference-layout ``.pt``: ``{data, models, optimizers}``
    (misc.py:58-76). Optimizer slots are converted when ``opt_states`` is
    given, else written empty."""
    import torch

    def t(v):
        return torch.from_numpy(np.ascontiguousarray(v).copy())

    def t_tree(obj):
        if isinstance(obj, dict):
            return {k: t_tree(v) for k, v in obj.items()}
        if isinstance(obj, list):
            return [t_tree(v) for v in obj]
        if isinstance(obj, np.ndarray):
            return t(obj)
        return obj

    state = params_to_torch_state(params)
    step = int(data.get("step", 0))
    optimizers = {k: {} for k in _REF_NAMES.values()}
    if opt_states is not None:
        optimizers = {
            _REF_NAMES[agent]: t_tree(opt_state_to_torch(
                agent, params[agent], opt_states[agent], optim_type,
                step=step))
            for agent in _REF_NAMES}
    payload = {
        "data": dict(data),
        "models": {_REF_NAMES[k]: {kk: t(vv) for kk, vv in v.items()}
                   for k, v in state.items()},
        "optimizers": optimizers,
    }
    torch.save(payload, path)


def load_reference_checkpoint(path: str, params: Dict[str, Any],
                              opt_states: Dict[str, Any] = None,
                              optim_type: str = "RMSprop"):
    """Load a reference-layout ``.pt`` into our trees. Returns
    ``(data, new_params)`` — or ``(data, new_params, new_opt_states)``
    when ``opt_states`` templates are given and the file carries
    optimizer slots (misc.py:78-92)."""
    import torch
    payload = torch.load(path, map_location="cpu", weights_only=False)
    state = {
        ours: {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
               for k, v in payload["models"][ref].items()}
        for ours, ref in _REF_NAMES.items() if ref in payload["models"]}
    new_params = params_from_torch_state(params, state)
    if opt_states is None:
        return payload["data"], new_params

    def n_tree(obj):
        if isinstance(obj, dict):
            return {k: n_tree(v) for k, v in obj.items()}
        if isinstance(obj, list):
            return [n_tree(v) for v in obj]
        if hasattr(obj, "numpy"):
            return obj.numpy()
        return obj

    new_opts = dict(opt_states)
    for agent, ref in _REF_NAMES.items():
        sd = payload.get("optimizers", {}).get(ref)
        if sd:
            new_opts[agent] = opt_state_from_torch(
                agent, new_params[agent], opt_states[agent], n_tree(sd),
                optim_type)
    return payload["data"], new_params, new_opts
