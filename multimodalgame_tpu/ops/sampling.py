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


def bernoulli_from_uniform(u: jnp.ndarray, probs: jnp.ndarray
                           ) -> jnp.ndarray:
    """Consume a pre-drawn uniform: produces exactly
    ``bernoulli_sample(key, probs)``'s bits when
    ``u = jax.random.uniform(key, probs.shape, f32-or-wider)``.

    The exchange scan pre-draws every turn's uniforms in one vmapped
    call over the per-step keys (game/exchange.py) — the uniforms don't
    depend on the probabilities, so hoisting the threefry hash chains out
    of the sequential scan is free parallelism: one batched PRNG
    invocation instead of 3-5 latency-bound hash chains per turn."""
    return jax.lax.stop_gradient(
        (u < probs.astype(u.dtype)).astype(probs.dtype))


def flipout_from_uniform(u: jnp.ndarray, binary: jnp.ndarray,
                         p: float) -> jnp.ndarray:
    """`flipout` against a pre-drawn uniform (same bits as
    ``flipout(key, binary, p)`` for ``u = uniform(key, shape)``)."""
    mask = bernoulli_from_uniform(u, jnp.full_like(binary, p))
    return jnp.abs(binary - mask)


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
