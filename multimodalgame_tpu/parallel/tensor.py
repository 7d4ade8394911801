"""Tensor (model) parallelism over a 2-D ``(data, model)`` mesh.

Data parallelism (parallel/mesh.py) is the right scale-out axis for the
canonical game, but the big-game configurations (``python bench.py big``:
128-bit messages, 1024/256 hidden, 1000 classes, GloVe-300, batch ≥1024
bf16) also admit the classic Megatron sharding of their widest matmuls.
This module provides that second mesh axis the TPU-native way: parameters
are *placed* with ``PartitionSpec`` annotations and the train step itself
is unchanged — XLA's SPMD partitioner derives every collective (the
column-parallel all-gather-free forward, the row-parallel ``psum``, the
clip-by-global-norm reduction) from the placements alone. There is no
hand-written collective anywhere, exactly as in the data-parallel layer.

Placement policy (why these leaves and not others):

* **Sender MLP** — ``image_layer``/``code_layer`` (feat→h, w→h) are
  column-parallel (output features sharded), and ``binary_layer`` (h→bits)
  is row-parallel (contraction dim sharded, one psum): the textbook
  two-matmul Megatron block around the sender's widest dim ``img_h_dim``
  (1024 in the big game). Activations between them stay sharded on the
  feature axis; no resharding in the middle.
* **Baselines** — ``linear1`` column-parallel / ``linear2`` row-parallel
  over ``baseline_hid_dim`` (500), the same block shape.
* **Receiver parameters** — replicated. Its GRU recurrence is the
  latency-bound sequential phase (PERFORMANCE.md); sharding the hidden
  dim would put a collective on every turn of the exchange's critical
  path for matmuls that are tiny even in the big game (256 hidden). The
  scaling-book rule: shard where the FLOPs are, never across a fast
  sequential dependency.
* **Receiver prediction head** — class-axis sharded via the *description
  input*, not a parameter (:func:`class_axis_placer`). The head is the
  big game's declared bandwidth center (PERFORMANCE.md "Larger games"):
  every turn broadcasts the per-class projection ``desc_proj (D, hid)``
  against ``(B, hid)`` into the ``relu`` intermediate ``(B, D, hid)`` —
  1 GB per turn at B=1024, D=1000, hid=256 f32, ~170 GB/s of the chip's
  HBM bandwidth at the measured step rate, vs ~3 MFLOP-sized GRU matmuls.
  Per-class scoring is embarrassingly parallel over D, and D is the
  leading axis of the ``desc`` *input* (the CBOW description matrix), so
  the TPU-native move is a placement again: shard ``desc`` dim 0 over
  ``model`` and GSPMD keeps ``desc_proj``, the ``(B, D, hid)``
  intermediate, and the per-class scores ``y (B, D)`` sharded — the
  intermediate's HBM traffic divides by the model-axis size. The only
  cross-class ops are the softmax normalizer and the confidence-weighted
  mixing contraction ``y_scores @ desc``, which lower to one small
  ``(B,)``/``(B, hid)``-sized psum/all-gather pair per turn (audited in
  tests/test_hlo_collectives.py): collective bytes per turn are
  ``B*(hid+D)*4`` ≈ 5 MB vs the ``(1 - 1/m)`` GB of intermediate traffic
  saved. Ragged ``D % model != 0`` falls back to replicated like every
  other placement here.

Any dim not divisible by the model-axis size falls back to replicated for
that leaf (mirroring ``mesh.axis_placer``'s ragged-tail rule), so every
config runs on every mesh shape — sharding is a placement optimization,
never a constraint.

The train step is literally ``mesh.make_sharded_train_step``: batch
sharded over ``data``, the leaves below over ``model``. Numerical
equality with single-device execution is pinned in
tests/test_tensor_parallel.py (fp reduction order may differ, so to the
same tolerances as the data-parallel tests, not bit-exactness).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multimodalgame_tpu.game.train import AGENT_NAMES, build_optimizer
from multimodalgame_tpu.parallel.mesh import BATCH_AXIS

MODEL_AXIS = "model"

# Column-parallel layers: kernel (in, out) sharded on the output dim,
# bias sharded alike. Row-parallel layers: kernel sharded on the
# contraction dim (XLA inserts the psum), bias replicated.
_COLUMN_PARALLEL = ("image_layer", "code_layer", "linear1")
_ROW_PARALLEL = ("binary_layer", "linear2")


def make_mesh_2d(n_data: int, n_model: int,
                 devices: Optional[list] = None) -> Mesh:
    """A ``(data, model)`` mesh over the first ``n_data * n_model``
    devices. Lay the model axis innermost so its psums ride the
    fastest ICI links (nearest neighbours in the device order)."""
    if devices is None:
        devices = jax.devices()
    need = n_data * n_model
    if len(devices) < need:
        raise ValueError(
            f"requested a {n_data}x{n_model} mesh but only "
            f"{len(devices)} devices are available")
    grid = np.asarray(devices[:need]).reshape(n_data, n_model)
    return Mesh(grid, (BATCH_AXIS, MODEL_AXIS))


def class_axis_placer(mesh: Mesh):
    """Placement for class-indexed description tensors (leading axis =
    class): shard dim 0 over the model axis when it divides, replicate
    otherwise (the ragged-tail rule). Covers ``desc (D, wv)`` and, under
    word attention, ``desc_set_padded (D, L, wv)`` / ``desc_set_mask
    (D, L)``.

    This is the whole tensor-parallel story for the receiver prediction
    head (see the module docstring): the head's per-class pipeline —
    ``desc @ y1_desc_block``, the ``(B, D, hid)`` relu intermediate, the
    ``y2`` reduction to ``y (B, D)`` (models/receiver.py) — is
    embarrassingly parallel over D and rooted at this input, so GSPMD
    derives the sharded head plus the per-turn softmax/mixing collectives
    from this one placement. No parameter moves: checkpoints, the torch
    interop mapping, and single-device numerics are untouched
    (equality pinned in tests/test_tensor_parallel.py, collectives in
    tests/test_hlo_collectives.py)."""
    rep = NamedSharding(mesh, P())
    n_model = mesh.shape[MODEL_AXIS]

    def place(x):
        if x is None:
            return x
        from multimodalgame_tpu.parallel.mesh import _put
        if np.ndim(x) == 0 or np.shape(x)[0] % n_model:
            return _put(x, rep)
        spec = [None] * np.ndim(x)
        spec[0] = MODEL_AXIS
        return _put(x, NamedSharding(mesh, P(*spec)))

    return place


def tp_param_specs(params, n_model: int):
    """The Megatron placement policy as a ``PartitionSpec`` pytree
    matching ``params`` (see module docstring for the rationale)."""

    def spec(path, leaf):
        keys = {getattr(p, "key", None) for p in path}
        shape = np.shape(leaf)
        if keys & set(_COLUMN_PARALLEL):
            if shape and shape[-1] % n_model == 0:
                return (P(None, MODEL_AXIS) if len(shape) == 2
                        else P(MODEL_AXIS))
            return P()
        if keys & set(_ROW_PARALLEL):
            if len(shape) == 2 and shape[0] % n_model == 0:
                return P(MODEL_AXIS, None)
            return P()  # row-parallel bias stays replicated
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params_tp(params, mesh: Mesh, specs=None):
    """Place a parameter tree on a 2-D mesh under the tp policy.

    Works on meshes spanning processes too: ``mesh._put`` falls back to
    per-leaf ``put_global`` (each process materializes its addressable
    shards from its local copy of the full host value) when the
    sharding isn't fully addressable."""
    from multimodalgame_tpu.parallel.mesh import _put
    if specs is None:
        specs = tp_param_specs(params, mesh.shape[MODEL_AXIS])
    return jax.tree_util.tree_map(
        lambda x, s: _put(x, NamedSharding(mesh, s)), params, specs)


def _spec_for_opt_leaf(path, specs):
    """The spec of the param an optimizer-state leaf mirrors.

    optax accumulators (RMSprop ``nu``, Adam ``mu``/``nu``) are
    ``zeros_like`` trees over the params, so an accumulator leaf's
    dict-key path is exactly ``(agent, *param_path)`` — the namedtuple
    hops (chain index, ``.nu``) appear as non-dict path entries. Leaves
    that don't address a param (step counters, empty clip state) are
    replicated.
    """
    node = specs
    for p in path:
        if not isinstance(p, jax.tree_util.DictKey):
            continue
        if not isinstance(node, dict) or p.key not in node:
            return P()
        node = node[p.key]
    return node if isinstance(node, P) else P()


def _is_model_sharded(spec) -> bool:
    return isinstance(spec, P) and any(
        a == MODEL_AXIS or (isinstance(a, (tuple, list)) and MODEL_AXIS in a)
        for a in spec if a is not None)


def count_model_sharded(spec_tree) -> int:
    """Number of leaves in a ``PartitionSpec`` tree placed (at least
    partly) on the model axis — the visibility counter behind
    :func:`_check_opt_placement` and the drivers' TP banner."""
    return sum(_is_model_sharded(s) for s in jax.tree_util.tree_leaves(
        spec_tree, is_leaf=lambda x: isinstance(x, P)))


def _check_opt_placement(opt_states, opt_specs, specs) -> int:
    """Guard against a *silent* replicated fallback of TP accumulators.

    ``_spec_for_opt_leaf`` resolves optimizer leaves to param specs via
    their dict-key paths; an optax component whose state dict keys do not
    alias param names would resolve every leaf to replicated with no
    signal (advisor round-3 #3). Invariants checked whenever any param is
    model-sharded: (a) if the state holds matrix-shaped accumulators at
    all, at least one resolved to a model-sharded spec; (b) each
    accumulator tree mirrors *all* params, so the model-sharded leaf
    count must be an exact multiple of the model-sharded param count (a
    partially-resolving chain breaks the multiple). Returns the
    model-sharded opt-leaf count for the caller's banner."""
    n_par = count_model_sharded(specs)
    n_opt = count_model_sharded(opt_specs)
    if n_par == 0:
        return n_opt
    has_matrix_acc = any(
        len(getattr(leaf, "shape", np.shape(leaf))) >= 2
        for leaf in jax.tree_util.tree_leaves(opt_states))
    if has_matrix_acc and n_opt == 0:
        raise ValueError(
            "tensor parallelism: params have {} model-sharded leaves but "
            "no optimizer accumulator resolved to a model-sharded spec — "
            "the optimizer state's dict keys do not alias the param tree "
            "(see tensor._spec_for_opt_leaf)".format(n_par))
    if n_opt % n_par:
        raise ValueError(
            "tensor parallelism: {} model-sharded optimizer leaves is not "
            "a multiple of the {} model-sharded params — some accumulator "
            "tree resolved only partially".format(n_opt, n_par))
    return n_opt


def place_opt_states_tp(opt_states, mesh: Mesh, specs):
    """Place an *existing* optimizer-state tree (e.g. resumed from a
    checkpoint) with each accumulator sharded like the parameter it
    mirrors — the placement counterpart of :func:`init_tp_opt_states`."""
    from multimodalgame_tpu.parallel.mesh import _put
    opt_specs = jax.tree_util.tree_map_with_path(
        lambda path, _: _spec_for_opt_leaf(path, specs), opt_states)
    _check_opt_placement(opt_states, opt_specs, specs)
    return jax.tree_util.tree_map(
        lambda x, s: _put(x, NamedSharding(mesh, s)),
        opt_states, opt_specs)


def init_tp_opt_states(cfg, params, mesh: Mesh, specs=None):
    """Optimizer states for already-placed parameters, with each
    accumulator placed exactly like the parameter it mirrors (via
    explicit ``out_shardings`` — GSPMD's default output layout choice
    is not guaranteed to propagate the input placement)."""
    tx = build_optimizer(cfg)
    if specs is None:
        specs = tp_param_specs(params, mesh.shape[MODEL_AXIS])

    def init(p):
        return {name: tx.init(p[name]) for name in AGENT_NAMES}

    shapes = jax.eval_shape(init, params)
    opt_specs = jax.tree_util.tree_map_with_path(
        lambda path, _: _spec_for_opt_leaf(path, specs), shapes)
    _check_opt_placement(shapes, opt_specs, specs)
    out_shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), opt_specs,
        is_leaf=lambda x: isinstance(x, P))
    return jax.jit(init, out_shardings=out_shardings)(params)
