"""Message sampling and channel-corruption primitives.

The reference samples Bernoulli bits by round-tripping probabilities
through host numpy every step (``np.random.rand(*shape) < probs`` at
model.py:225-227, 418-420, 458-460 — the hot-loop bottleneck called out in
SURVEY §3.1). Here sampling is ``jax.random`` inside the jitted scan: zero
host transfers, fused with the surrounding compute by XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bernoulli_sample(key: jax.Array, probs: jnp.ndarray) -> jnp.ndarray:
    """Draw 0/1 floats with P(1) = probs — the device-native equivalent of
    the reference's ``(np.random.rand(*p.shape) < p).astype('float32')``.

    The comparison is non-differentiable; a stop_gradient makes the
    REINFORCE detach explicit (reference re-wraps samples as fresh
    Variables).

    Uniforms are drawn in (at least) f32 regardless of the compute dtype:
    bf16 uniforms are 8-bit-coarse AND a different bit-mapping entirely,
    which would decorrelate bf16 runs from f32 runs at the same key."""
    u_dtype = jnp.promote_types(jnp.float32, probs.dtype)
    u = jax.random.uniform(key, probs.shape, dtype=u_dtype)
    return jax.lax.stop_gradient(
        (u < probs.astype(u_dtype)).astype(probs.dtype))


def hard_round(probs: jnp.ndarray) -> jnp.ndarray:
    """Deterministic eval-mode quantization, ``torch.round`` semantics
    (half rounds up; model.py:229, 427, 462)."""
    return jax.lax.stop_gradient(jnp.floor(probs + 0.5))


def flipout(key: jax.Array, binary: jnp.ndarray, p: float) -> jnp.ndarray:
    """Flip each bit independently with probability ``p``
    (reference ``flipout``, model.py:554-568): draw a Bernoulli(p) mask and
    take ``|binary - mask|``."""
    mask = bernoulli_sample(key, jnp.full_like(binary, p))
    return jnp.abs(binary - mask)
