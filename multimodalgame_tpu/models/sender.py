"""Sender agent: image features + Receiver's last query -> message logits.

Parity target: reference ``Sender`` (model.py:49-238).

    h_x = image_layer(x)            # optionally attention-pooled x
    h_w = code_layer(sigmoid(code_bias))   at t == 0  (model.py:196-200)
        = code_layer(w)                    at t  > 0
    feats = binary_layer(tanh(mix(h_x, h_w)))   mix in {sum, prod, mou}
                                                 (model.py:208-221)

Visual attention (Xu et al.-style, model.py:114-142, 168-191): scores
``U tanh(W_w w + W_x x_i [+ W_g g])`` with a uniform distribution forced at
t == 0 (model.py:177-180).

TPU-first notes: the module is purely deterministic — it emits *logits*;
Bernoulli sampling/rounding happens in the exchange engine so the whole
multi-step conversation compiles into one ``lax.scan``. The reference's
per-episode caches (``h_x_attn_flat``/``h_g_flat``, model.py:123-133) become
an explicit ``precompute`` whose results are closed over by the scan body,
making the loop-invariance visible to XLA. The t == 0 special case is a
``jnp.where`` select so a single traced program covers every step.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from multimodalgame_tpu.models.init import std_normal, xavier_normal


class Sender(nn.Module):
    feat_dim: int
    h_dim: int
    w_dim: int
    bin_dim_out: int
    use_binary: bool = True
    use_attn: bool = False
    attn_dim: int = 256
    attn_extra_context: bool = False
    attn_context_dim: int = 4096
    sender_mix: str = "sum"
    ignore_code: bool = False

    def setup(self):
        dense = lambda feats, name: nn.Dense(
            feats, kernel_init=xavier_normal(),
            bias_init=nn.initializers.zeros, name=name)
        self.image_layer = dense(self.h_dim, "image_layer")
        self.code_layer = dense(self.h_dim, "code_layer")
        self.code_bias = self.param("code_bias", std_normal,
                                    (self.bin_dim_out,))
        self.binary_layer = dense(self.bin_dim_out, "binary_layer")
        if self.sender_mix == "mou" and self.ignore_code:
            self.code_bias_mou = self.param("code_bias_mou", std_normal,
                                            (self.bin_dim_out,))
        if self.use_attn:
            self.attn_W_x = dense(self.attn_dim, "attn_W_x")
            self.attn_W_w = dense(self.attn_dim, "attn_W_w")
            self.attn_U = dense(1, "attn_U")
            if self.attn_extra_context:
                self.attn_W_g = dense(self.attn_dim, "attn_W_g")

    def __call__(self, x, w, g, t):
        """Single-turn convenience API (the reference ``forward``,
        model.py:144) — precompute + step. Used for parameter init and
        single-step tests; the exchange engine calls the pieces directly."""
        cache = self.precompute(x, g)
        return self.step(x, w, t, cache)

    def precompute(self, x: jnp.ndarray,
                   g: Optional[jnp.ndarray]) -> Dict[str, Any]:
        """Step-invariant projections, computed once per conversation
        (the reference's per-episode cache, model.py:123-133).

        ``x`` is the raw feature batch: ``(B, C, H, W)`` when attention is
        on, ``(B, feat_dim)`` otherwise. Returns the attention key
        projections plus the spatially-flattened features, and the
        learned-constant code projections (parameter-only, so computed
        once instead of inside every sequential turn).
        """
        # code_layer(sigmoid(code_bias)) depends on parameters only
        # (model.py:196-207) — one (1, h_dim) row per conversation.
        cache: Dict[str, Any] = {
            "h_w_first": self.code_layer(
                nn.sigmoid(self.code_bias)[None, :]),       # (1, h_dim)
        }
        if self.ignore_code and self.sender_mix == "mou":
            cache["h_w_mou"] = self.code_layer(
                nn.sigmoid(self.code_bias_mou)[None, :])    # (1, h_dim)
        if not self.use_attn:
            return cache
        b, c, h, w = x.shape
        x_flat = jnp.transpose(x.reshape(b, c, h * w), (0, 2, 1))  # (B,N,C)
        cache["x_flat"] = x_flat
        cache["h_x_attn"] = self.attn_W_x(x_flat)  # (B, N, A)
        if self.attn_extra_context:
            cache["h_g"] = self.attn_W_g(g)[:, None, :]  # (B, 1, A)
        return cache

    def step(self, x: jnp.ndarray, w: jnp.ndarray, t: jnp.ndarray,
             cache: Dict[str, Any]
             ) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
        """One sender turn.

        Args:
            x: image features — ``(B, C, H, W)`` with attention else
               ``(B, feat_dim)``.
            w: the Receiver's previous query, ``(B, w_dim)`` (already
               stop-gradiented by the exchange engine, the reference's
               ``Variable(z_r.data)`` at model.py:807-811).
            t: traced step index (scalar int).
            cache: output of :meth:`precompute`.

        Returns ``(logits, h_x, attn_scores)`` — message logits
        ``(B, bin_dim_out)``; ``h_x`` feeds the Sender baseline
        (model.py:832-836); ``attn_scores`` is ``None`` without attention.
        """
        attn_scores = None
        if self.use_attn:
            x_flat = cache["x_flat"]                      # (B, N, C)
            n_feats = x_flat.shape[1]
            h_w_attn = self.attn_W_w(w)[:, None, :]       # (B, 1, A)
            pre = h_w_attn + cache["h_x_attn"]
            if self.attn_extra_context:
                pre = pre + cache["h_g"]
            scores = self.attn_U(jnp.tanh(pre))[..., 0]   # (B, N)
            uniform = jnp.full_like(scores, 1.0 / n_feats)
            attn_scores = jnp.where(t == 0, uniform,
                                    nn.softmax(scores, axis=-1))
            _x = jnp.einsum("bn,bnc->bc", attn_scores, x_flat)
        else:
            _x = x

        h_x = self.image_layer(_x)

        h_w_first = jnp.broadcast_to(cache["h_w_first"], h_x.shape)
        if self.ignore_code and self.sender_mix == "mou":
            # t > 0 with ignore_code+mou uses a second learned constant code
            # (model.py:201-205).
            h_w_later = jnp.broadcast_to(cache["h_w_mou"], h_x.shape)
        else:
            h_w_later = self.code_layer(w)
        h_w = jnp.where(t == 0, h_w_first, h_w_later)

        if self.ignore_code:
            if self.sender_mix in ("sum", "prod"):
                features = self.binary_layer(jnp.tanh(h_x))
            else:  # mou
                features = self.binary_layer(jnp.tanh(jnp.concatenate(
                    [h_x, h_w, h_x - h_w, h_x * h_w], axis=1)))
        else:
            if self.sender_mix == "sum":
                features = self.binary_layer(jnp.tanh(h_x + h_w))
            elif self.sender_mix == "prod":
                features = self.binary_layer(jnp.tanh(h_x * h_w))
            else:  # mou
                features = self.binary_layer(jnp.tanh(jnp.concatenate(
                    [h_x, h_w, h_x - h_w, h_x * h_w], axis=1)))

        return features, h_x, attn_scores
