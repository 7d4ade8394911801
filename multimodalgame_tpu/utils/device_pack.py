"""Flat-packing of heterogeneous device arrays for single-transfer reads.

Motivation (measured on the v5e behind the axon tunnel, PERFORMANCE.md):
one device->host read costs ~30 ms of round-trip latency *regardless of
size* — reading a dozen small metric arrays serially costs ~0.4 s, while
one packed vector of the same bytes costs one round trip. Everything the
host needs from a device computation (interval-log metrics, dev-eval
statistics) is therefore concatenated into a single flat ``float32``
vector on device and sliced apart on host. (Checkpoint trees take the
complementary route: ``jax.device_get`` pipelines the per-leaf copies —
utils/checkpoint.py:_to_host — which keeps exact dtypes without an extra
compiled concat program.)

The reference has no analog (its tensors live on the host already); this
subsystem exists because the TPU runtime boundary is a network hop.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

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
