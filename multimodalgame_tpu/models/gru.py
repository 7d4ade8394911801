"""GRU cell with torch parameter layout and reference init semantics.

The reference Receiver's recurrence is ``nn.GRUCell`` (model.py:256,340):

    r = sigmoid(W_ir x + b_ir + W_hr h + b_hr)
    z = sigmoid(W_iz x + b_iz + W_hz h + b_hz)
    n = tanh(W_in x + b_in + r * (W_hn h + b_hn))
    h' = (1 - z) * n + z * h

Parameters are stored stacked in torch gate order ``[r | z | n]`` —
``w_ih (in, 3H)``, ``w_hh (H, 3H)`` (transposed relative to torch so the
matmul is a natural ``x @ w``), with Xavier-normal init computed over the
*stacked* fan exactly as the reference does when it walks GRUCell
parameters (model.py:281-288) and zero biases.

Keeping the torch layout makes checkpoint interop with the reference's
``.pt`` files a pure transpose.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from multimodalgame_tpu.models.init import xavier_normal


class TorchGRUCell(nn.Module):
    in_dim: int
    hid_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
        H = self.hid_dim
        w_ih = self.param(
            "w_ih", xavier_normal(fan_override=(self.in_dim, 3 * H)),
            (self.in_dim, 3 * H))
        w_hh = self.param(
            "w_hh", xavier_normal(fan_override=(H, 3 * H)), (H, 3 * H))
        b_ih = self.param("b_ih", nn.initializers.zeros, (3 * H,))
        b_hh = self.param("b_hh", nn.initializers.zeros, (3 * H,))

        # Accumulate gates in (at least) f32 — the MXU-native recipe for
        # bf16 inputs — then return in the carry dtype so lax.scan carries
        # stay fixed (f64 runs promote, bf16 runs cast back down).
        acc = jnp.promote_types(jnp.float32, x.dtype)
        gi = jnp.dot(x, w_ih, preferred_element_type=acc) + b_ih
        gh = jnp.dot(h, w_hh, preferred_element_type=acc) + b_hh
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = nn.sigmoid(i_r + h_r)
        z = nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        return ((1.0 - z) * n + z * h).astype(h.dtype)
