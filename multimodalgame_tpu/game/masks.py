"""Stop-mask algebra and channel-corruption masks.

The subtle heart of adaptive-exchange parity (SURVEY §7 "hard parts"): the
reference breaks out of its Python loop when every Receiver has stopped
(model.py:866-867) and slices the resulting ragged mask lists with
off-by-one conventions (model.py:1247-1262). Here the exchange always runs
``max_exchange`` steps and the masks carry the termination information;
because every loss term is mask-weighted and steps after the (virtual)
break have all-zero masks, the loss algebra is exactly equivalent (zero
numerator *and* zero denominator contribution).
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import Optional

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class LossMasks:
    """Per-loss mask stacks derived from the stop-mask chain, shapes
    ``(T[, -1], B, 1)`` (reference model.py:1247-1262)."""
    binary_s: jnp.ndarray     # s_masks[:-1]  — pre-step masks, (T, B, 1)
    binary_rec: jnp.ndarray   # s_masks[1:-1] — (T-1, B, 1)
    binary_sen: jnp.ndarray   # s_masks[:-1]
    bas_rec: jnp.ndarray      # s_masks[:-1]
    bas_sen: jnp.ndarray      # s_masks[:-1]
    y: jnp.ndarray            # min(1 - m_{t+1}, m_t) — (T, B, 1)


def assemble_loss_masks(stop_masks: jnp.ndarray) -> LossMasks:
    """Build the five loss-mask views from the ``(T+1, B, 1)`` stop-mask
    chain (``stop_masks[0]`` is all-ones padding, ``stop_masks[-1]`` is
    forced to zero — model.py:775, 870).

    The y-mask ``min(1 - m_{t+1}, m_t)`` selects, per example, exactly the
    step at which it stopped (model.py:1261-1262); the forced-zero final
    mask guarantees every example selects some step.
    """
    pre = stop_masks[:-1]
    post = stop_masks[1:]
    return LossMasks(
        binary_s=pre,
        binary_rec=stop_masks[1:-1],
        binary_sen=pre,
        bas_rec=pre,
        bas_sen=pre,
        y=jnp.minimum(1.0 - post, pre),
    )


def build_mask(region_str: str, size: int) -> np.ndarray:
    """Parse a bit-region spec like ``"0:3,5"`` into a 0/1 vector of length
    ``size`` (reference misc.py:388-402; python-style half-open ranges).
    Used for adversarial bit flipping at eval (model.py:814-820)."""
    regions = [r.split(":") for r in region_str.split(",")]
    regions = [[int(r[0])] if len(r) == 1 else
               list(range(int(r[0]), int(r[1]))) for r in regions]
    index = list(itertools.chain(*regions))
    mask = np.zeros((size,), dtype=np.float32)
    mask[index] = 1.0
    return mask


def corrupt_message(z_binary: jnp.ndarray,
                    corrupt_mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Flip the masked bits of a binary message:
    ``|z - mask|`` (model.py:814-820)."""
    if corrupt_mask is None:
        return z_binary
    return jnp.abs(z_binary - corrupt_mask[None, :])
