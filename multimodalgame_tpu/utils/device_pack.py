"""Flat-packing of heterogeneous device arrays for single-transfer reads.

Motivation (measured on the v5e behind the axon tunnel, PERFORMANCE.md):
one device->host read costs ~30 ms of round-trip latency *regardless of
size* — reading a dozen small metric arrays serially costs ~0.4 s, while
one packed vector of the same bytes costs one round trip. Everything the
host needs from a device computation (interval-log metrics, dev-eval
statistics, checkpoint snapshots) is therefore concatenated into a single
flat ``float32`` vector on device and sliced apart on host.

The reference has no analog (its tensors live on the host already); this
subsystem exists because the TPU runtime boundary is a network hop.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class PackSpec:
    """A fixed schema of named array fields packed into one flat f32
    vector.

    ``fields`` is a sequence of ``(name, shape)``; order defines the
    layout. ``pack`` runs on device (jit-safe); ``unpack`` runs on host.
    Integer fields survive the f32 round trip exactly for values below
    2**24 (step counts, class indices, bit vectors — all far below).
    """

    def __init__(self, fields: Sequence[Tuple[str, Tuple[int, ...]]]):
        self.fields: List[Tuple[str, Tuple[int, ...]]] = [
            (name, tuple(shape)) for name, shape in fields]
        self._offsets: Dict[str, Tuple[int, int, Tuple[int, ...]]] = {}
        off = 0
        for name, shape in self.fields:
            size = int(np.prod(shape)) if shape else 1
            self._offsets[name] = (off, off + size, shape)
            off += size
        self.total = off

    def pack(self, values: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        """Concatenate ``values`` (keyed by field name) into one
        ``(total,)`` f32 vector. Missing fields are zero-filled."""
        parts = []
        for name, shape in self.fields:
            v = values.get(name)
            size = int(np.prod(shape)) if shape else 1
            if v is None:
                parts.append(jnp.zeros((size,), jnp.float32))
            else:
                parts.append(jnp.asarray(v, jnp.float32).reshape(size))
        return jnp.concatenate(parts) if parts else jnp.zeros((0,),
                                                              jnp.float32)

    def unpack(self, flat: np.ndarray) -> Dict[str, np.ndarray]:
        flat = np.asarray(flat)
        out: Dict[str, np.ndarray] = {}
        for name, (a, b, shape) in self._offsets.items():
            out[name] = flat[a:b].reshape(shape) if shape else flat[a]
        return out


def pack_pytree(tree: Any) -> jnp.ndarray:
    """Flatten a pytree of device arrays into one f32 vector (device op).

    Used for checkpoint snapshots: fetching a ~30-leaf parameter tree
    leaf-by-leaf costs ~30 round trips; packed, it costs one.
    """
    leaves = jax.tree_util.tree_leaves(tree)
    if not leaves:
        return jnp.zeros((0,), jnp.float32)
    return jnp.concatenate(
        [jnp.asarray(l, jnp.float32).reshape(-1) for l in leaves])


def unpack_pytree(flat: np.ndarray, template: Any) -> Any:
    """Rebuild a host pytree matching ``template``'s structure/shapes from
    a packed vector (dtypes are restored from the template leaves)."""
    flat = np.asarray(flat)
    leaves, treedef = jax.tree_util.tree_flatten(template)
    out = []
    off = 0
    for l in leaves:
        size = int(np.prod(np.shape(l))) if np.shape(l) else 1
        vals = flat[off:off + size].reshape(np.shape(l))
        out.append(vals.astype(np.asarray(l).dtype))
        off += size
    return jax.tree_util.tree_unflatten(treedef, out)
