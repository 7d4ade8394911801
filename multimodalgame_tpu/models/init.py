"""Weight initialization schemes matching the reference.

The reference applies a hand-rolled Xavier-normal (misc.py:349-385, from
nninit) to every Linear/GRU weight matrix with zero biases
(model.py:90-97, model.py:275-288), samples ``code_bias`` from a standard
normal (model.py:97), and leaves the Baseline networks on the PyTorch
default Linear init — ``U(-1/sqrt(fan_in), 1/sqrt(fan_in))`` for both
weight and bias (Baseline defines no ``reset_parameters``,
model.py:480-516).

Flax stores Dense kernels as ``(fan_in, fan_out)`` (the transpose of
torch's ``(out, in)``); the fan computation below accounts for that so the
sampled distributions are identical.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _fans(shape):
    if len(shape) < 2:
        raise ValueError(f"fan in/out undefined for shape {shape}")
    if len(shape) == 2:
        fan_in, fan_out = shape[0], shape[1]
    else:
        receptive = int(np.prod(shape[:-2]))
        fan_in = shape[-2] * receptive
        fan_out = shape[-1] * receptive
    return fan_in, fan_out


def xavier_normal(gain: float = 1.0, fan_override=None):
    """Xavier-normal: ``N(0, gain * sqrt(2/(fan_in+fan_out)))``
    (reference misc.py:367-385).

    ``fan_override=(fan_in, fan_out)`` supports the stacked-GRU case: the
    reference initializes torch's stacked ``(3H, in)`` GRU matrices as one
    tensor, so the fan is computed over the stack, not per gate
    (model.py:281-288).
    """
    def init(key, shape, dtype=jnp.float32):
        if fan_override is not None:
            fan_in, fan_out = fan_override
        else:
            fan_in, fan_out = _fans(shape)
        std = gain * np.sqrt(2.0 / (fan_in + fan_out))
        return std * jax.random.normal(key, shape, dtype)
    return init


def torch_default_linear(key, shape, dtype=jnp.float32):
    """PyTorch-default Linear init: ``U(-1/sqrt(fan_in), 1/sqrt(fan_in))``.
    Used for the Baseline networks (model.py:480-516, no reset)."""
    fan_in = shape[0] if len(shape) == 2 else shape[-1]
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_default_bias(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / np.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def std_normal(key, shape, dtype=jnp.float32):
    """Standard normal — the Sender's learned first-step ``code_bias``
    (model.py:97)."""
    return jax.random.normal(key, shape, dtype)
