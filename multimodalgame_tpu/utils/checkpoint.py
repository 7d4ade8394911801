"""Checkpoint / resume.

Parity target: the reference's single-file torch checkpoint
(misc.py:58-92) containing ``{data: {step, best_dev_acc},
models: {4 state_dicts}, optimizers: {4 state_dicts}}``, saved to
``FLAGS.checkpoint`` (periodic) and ``FLAGS.checkpoint + "_best"`` on dev
improvement (model.py:1569-1584), with auto-resume when the file exists
(model.py:1149-1156).

Formats (``-ckpt_format``):

* ``msgpack`` (default) — flax ``state_dict`` trees serialized with
  msgpack: a single self-contained file, all tensors on host (the
  reference also forces CPU before writing, misc.py:64), written with an
  atomic rename.
* ``orbax`` — the same ``{data, models, optimizers}`` payload written as
  an Orbax checkpoint *directory* via an ``AsyncCheckpointer``: the save
  returns after a host snapshot and the serialization/commit runs on a
  background thread, so periodic checkpoints overlap training dispatch
  instead of blocking it. Crash safety: the async save targets a
  ``.staging`` sibling (orbax's ``force=True`` would delete the live
  checkpoint *before* its replacement commits), and the staging
  directory is swapped into place at the next synchronization point
  (:func:`wait_for_checkpoints` — called before every subsequent
  save/load, at driver exit, and atexit), so the previous checkpoint
  survives any crash up to the swap. :func:`load_checkpoint`
  auto-detects the format from the path (directory = orbax, file =
  msgpack), so ``-ckpt_format`` only needs to be set when *writing* —
  and a write whose path holds the OTHER format fails fast with an
  actionable error instead of corrupting it.

Loading restores into caller-provided templates so optimizer-state pytree
structure round-trips exactly in both formats.
"""

from __future__ import annotations

import atexit
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def _local_leaf(x):
    """Reduce a cross-process array to a locally-fetchable host value.

    Replicated leaves read their local shard. Model-sharded leaves
    (multi-host tensor parallelism) reassemble from local shards —
    zero communication, possible whenever ``make_mesh_2d``'s innermost
    model axis keeps every Megatron shard on each process. Only a model
    axis genuinely spanning processes needs the collective gather
    (``host_view``) — and then EVERY process must reach this call (see
    ``save_checkpoint``'s all-process payload contract)."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        if x.sharding.is_fully_replicated:
            return x.addressable_data(0)
        from multimodalgame_tpu.parallel.distributed import (
            covers_locally, host_view, reassemble_local)
        if covers_locally(x):  # index-only check before any data fetch
            return reassemble_local(x)
        return host_view(x)
    return x


def _cross_process_sharded(tree) -> bool:
    """True when any leaf is a cross-process array that is NOT fully
    replicated — i.e. building the host payload may involve collective
    gathers, so all processes must build it (sharding metadata is
    identical on every process, so every process takes this branch
    together)."""
    return any(
        isinstance(x, jax.Array) and not x.is_fully_addressable
        and not x.sharding.is_fully_replicated
        for x in jax.tree_util.tree_leaves(tree))


def _to_host(tree):
    # jax.device_get, not tree_map(np.asarray): device_get issues
    # copy_to_host_async on every leaf before materializing, so the
    # ~60-100 leaf transfers (4 models + 4 optimizers) pipeline through
    # the link instead of each paying a blocking ~30 ms round trip.
    return jax.device_get(jax.tree_util.tree_map(_local_leaf, tree))


def _payload(data, params, opt_states) -> Dict[str, Any]:
    return {
        "data": {k: np.asarray(v) for k, v in data.items()},
        "models": serialization.to_state_dict(_to_host(params)),
        "optimizers": serialization.to_state_dict(_to_host(opt_states)),
    }


def save_checkpoint(filename: str, data: Dict[str, Any],
                    params: Dict[str, Any], opt_states: Dict[str, Any],
                    fmt: str = "msgpack") -> None:
    """Write ``{data, models, optimizers}`` to ``filename`` in ``fmt``
    (``msgpack``: one file, atomic rename so a crash can't truncate an
    existing checkpoint; ``orbax``: async checkpoint directory).

    In a multi-process job only process 0 writes. With replicated state
    (data parallelism) the other processes return immediately — process
    0's local copy IS the global state. With model-sharded state
    (multi-host tensor parallelism) EVERY process builds the host
    payload first: reassembly is usually local (zero communication, see
    ``_local_leaf``) but may need collective gathers, and a collective
    dispatched by process 0 alone would hang the job — so all processes
    walk the same leaves in the same order, then the non-writers drop
    the result."""
    payload = None
    if jax.process_count() > 1:
        if _cross_process_sharded((params, opt_states)):
            payload = _payload(data, params, opt_states)
        if jax.process_index() != 0:
            return
    if fmt == "orbax":
        if os.path.isfile(filename):
            raise ValueError(
                f"{filename} is a msgpack checkpoint file but "
                "-ckpt_format orbax was requested; pass -ckpt_format "
                "msgpack (the resumed run's format) or remove the file")
        _save_orbax(filename,
                    payload or _payload(data, params, opt_states))
        return
    if fmt != "msgpack":
        raise ValueError(f"unknown checkpoint format: {fmt!r}")
    if os.path.isdir(filename):
        raise ValueError(
            f"{filename} is an orbax checkpoint directory but the "
            "msgpack format was requested; pass -ckpt_format orbax "
            "(the resumed run's format) or remove the directory")
    blob = serialization.msgpack_serialize(
        payload or _payload(data, params, opt_states))
    tmp = filename + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, filename)


def load_checkpoint(filename: str, params: Dict[str, Any],
                    opt_states: Dict[str, Any]
                    ) -> Tuple[Dict[str, Any], Dict[str, Any], Dict[str, Any]]:
    """Restore ``(data, params, opt_states)`` from ``filename`` using the
    given templates for pytree structure (reference misc.py:78-92). The
    format is auto-detected: a directory is an orbax checkpoint, a file
    is msgpack."""
    filename = os.path.expanduser(filename)
    wait_for_checkpoints()  # a just-dispatched async save must commit
    recover_orbax(filename)  # repair a crash-interrupted staging swap
    if os.path.isdir(filename):
        payload = _restore_orbax(filename)
    elif os.path.exists(filename):
        with open(filename, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
    else:
        raise FileNotFoundError("File does not exist: " + filename)
    new_params = serialization.from_state_dict(params, payload["models"])
    new_opts = serialization.from_state_dict(opt_states, payload["optimizers"])
    data = {k: (v.item() if hasattr(v, "item") and getattr(v, "ndim", 1) == 0
                else v)
            for k, v in payload["data"].items()}
    return data, new_params, new_opts


# --- Orbax backend -----------------------------------------------------

_ORBAX: Optional[Any] = None     # singleton AsyncCheckpointer
_PENDING_SWAPS: list = []        # [(committed staging dir, final dir)]


def _orbax_checkpointer():
    global _ORBAX
    if _ORBAX is None:
        import orbax.checkpoint as ocp
        kwargs = {}
        if jax.process_count() > 1:
            # Only process 0 reaches the orbax calls (the checkpoint
            # owner — save_checkpoint gates the others out, and the
            # payload is already a gathered host tree by then). Orbax's
            # save/restore open with GLOBAL sync barriers, so without
            # restricting the active set to process 0 the first orbax
            # save would block forever waiting for processes that never
            # call it.
            kwargs["multiprocessing_options"] = (
                ocp.options.MultiprocessingOptions(primary_host=0,
                                                   active_processes={0}))
        _ORBAX = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler(),
                                       **kwargs)
        atexit.register(wait_for_checkpoints)
    return _ORBAX


def wait_for_checkpoints() -> None:
    """Block until any in-flight async orbax save has committed, then
    swap committed staging directories into their final paths (no-op
    when orbax was never used).

    The swap replaces the previous checkpoint only AFTER its successor
    fully committed, so a crash at any point leaves a loadable
    checkpoint: before the swap the old one is still at the path; the
    two renames inside the swap are the only (microsecond) exposure."""
    if _ORBAX is None:
        return
    _ORBAX.wait_until_finished()
    import shutil
    while _PENDING_SWAPS:
        staging, final = _PENDING_SWAPS.pop(0)
        old = final + ".old"
        if os.path.exists(old):
            shutil.rmtree(old)
        if os.path.exists(final):
            os.rename(final, old)
        os.rename(staging, final)
        if os.path.exists(old):
            shutil.rmtree(old)


def recover_orbax(dirname: str) -> None:
    """Repair on-disk state left by a process that died at ANY point of
    the async-save staging/swap protocol, so a loadable checkpoint
    survives every crash window (VERDICT round-3 #9):

    * crash mid-serialization — orbax writes into a
      ``*.orbax-checkpoint-tmp-*`` sibling and renames it to
      ``.staging`` only on a complete commit, so a partial save never
      masquerades as a checkpoint; the previous checkpoint at the final
      path is untouched. Nothing to repair (tmp garbage is swept by the
      next save).
    * crash after commit, before the swap — ``.staging`` exists and is a
      full checkpoint NEWER than the final path: finish the interrupted
      swap (same rename sequence as :func:`wait_for_checkpoints`).
    * crash between the swap's two renames — the final path is missing,
      ``.staging`` (new) still present: the same branch re-runs the
      swap to completion.
    * crash after the swap, before the ``.old`` cleanup — the final path
      is live; the stale ``.old`` is swept here.

    Idempotent and cheap (a few ``stat`` calls when nothing crashed);
    called by :func:`load_checkpoint` so auto-resume self-heals — and by
    the driver BEFORE its resume decision, because the mid-swap crash
    window leaves nothing at the final path, so an ``exists()``-gated
    resume would skip the load entirely and the next save would sweep
    the only committed copy as stale staging.

    In a multi-process job only process 0 (the checkpoint owner) runs
    the repair: on a shared filesystem concurrent repairs would race
    each other's renames."""
    if jax.process_count() > 1 and jax.process_index() != 0:
        return
    import shutil
    final = os.path.abspath(os.path.expanduser(dirname))
    staging, old = final + ".staging", final + ".old"
    if os.path.isdir(staging):
        if os.path.exists(old):
            shutil.rmtree(old)
        if os.path.exists(final):
            os.rename(final, old)
        os.rename(staging, final)
    if os.path.isdir(old) and os.path.exists(final):
        shutil.rmtree(old)
    elif os.path.isdir(old):
        # Unreachable via the protocol itself (staging moves last), but
        # a lone .old with no live checkpoint is still a full one:
        # restore it rather than lose it.
        os.rename(old, final)


def _save_orbax(dirname: str, payload: Dict[str, Any]) -> None:
    import glob
    import shutil

    import orbax.checkpoint as ocp
    ckptr = _orbax_checkpointer()
    # Finalize any previous save first: one in-flight save at a time,
    # and its staging directory must be swapped away before reuse.
    wait_for_checkpoints()
    staging = os.path.abspath(dirname) + ".staging"
    if os.path.exists(staging):  # leftover from a crashed, un-resumed run
        shutil.rmtree(staging)
    # Sweep partial-serialization garbage from a crashed run (orbax's
    # atomic-rename tmp dirs for the staging target).
    for tmp in glob.glob(staging + ".orbax-checkpoint-tmp-*"):
        shutil.rmtree(tmp, ignore_errors=True)
    ckptr.save(staging, args=ocp.args.PyTreeSave(payload))
    _PENDING_SWAPS.append((staging, os.path.abspath(dirname)))


def _restore_orbax(dirname: str) -> Dict[str, Any]:
    # Caller (load_checkpoint) has already drained pending saves/swaps.
    return _orbax_checkpointer().restore(os.path.abspath(dirname))
