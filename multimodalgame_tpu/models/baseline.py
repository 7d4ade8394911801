"""REINFORCE value-baseline network.

Parity target: reference ``Baseline`` (model.py:480-516) — a two-layer MLP
``linear2(relu(linear1(cat(features))))`` regressing the per-example
log-likelihood reward. The Sender baseline receives ``(h_x, z_r)``
(model.py:834-836); the Receiver baseline ``(z_s, h_z)`` (model.py:841-843).

The reference never resets Baseline parameters, so they keep PyTorch's
default Linear init — replicated here via ``torch_default_linear``.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from multimodalgame_tpu.models.init import (torch_default_bias,
                                            torch_default_linear)


class Baseline(nn.Module):
    hid_dim: int
    x_dim: int
    binary_dim: int
    inp_dim: int

    @nn.compact
    def __call__(self, x: Optional[jnp.ndarray],
                 binary: Optional[jnp.ndarray],
                 inp: Optional[jnp.ndarray]) -> jnp.ndarray:
        features = [f for f in (x, binary, inp) if f is not None]
        features = jnp.concatenate(features, axis=1)
        in_dim = self.x_dim + self.binary_dim + self.inp_dim
        linear1 = nn.Dense(self.hid_dim, kernel_init=torch_default_linear,
                           bias_init=torch_default_bias(in_dim),
                           name="linear1")
        linear2 = nn.Dense(1, kernel_init=torch_default_linear,
                           bias_init=torch_default_bias(self.hid_dim),
                           name="linear2")
        hidden = jax.nn.relu(linear1(features))
        return linear2(hidden)
