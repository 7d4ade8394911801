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


def _to_host(tree):
    # jax.device_get, not tree_map(np.asarray): device_get issues
    # copy_to_host_async on every leaf before materializing, so the
    # ~60-100 leaf transfers (4 models + 4 optimizers) pipeline through
    # the link instead of each paying a blocking ~30 ms round trip.
    return jax.device_get(tree)


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
    existing checkpoint; ``orbax``: async checkpoint directory)."""
    if fmt == "orbax":
        if os.path.isfile(filename):
            raise ValueError(
                f"{filename} is a msgpack checkpoint file but "
                "-ckpt_format orbax was requested; pass -ckpt_format "
                "msgpack (the resumed run's format) or remove the file")
        _save_orbax(filename, _payload(data, params, opt_states))
        return
    if fmt != "msgpack":
        raise ValueError(f"unknown checkpoint format: {fmt!r}")
    if os.path.isdir(filename):
        raise ValueError(
            f"{filename} is an orbax checkpoint directory but the "
            "msgpack format was requested; pass -ckpt_format orbax "
            "(the resumed run's format) or remove the directory")
    blob = serialization.msgpack_serialize(_payload(data, params,
                                                    opt_states))
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
        _ORBAX = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
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


def _save_orbax(dirname: str, payload: Dict[str, Any]) -> None:
    import shutil

    import orbax.checkpoint as ocp
    ckptr = _orbax_checkpointer()
    # Finalize any previous save first: one in-flight save at a time,
    # and its staging directory must be swapped away before reuse.
    wait_for_checkpoints()
    staging = os.path.abspath(dirname) + ".staging"
    if os.path.exists(staging):  # leftover from a crashed run
        shutil.rmtree(staging)
    ckptr.save(staging, args=ocp.args.PyTreeSave(payload))
    _PENDING_SWAPS.append((staging, os.path.abspath(dirname)))


def _restore_orbax(dirname: str) -> Dict[str, Any]:
    # Caller (load_checkpoint) has already drained pending saves/swaps.
    return _orbax_checkpointer().restore(os.path.abspath(dirname))
