"""Receiver agent: GRU over incoming messages, class prediction, STOP bit,
and a binary query back to the Sender.

Parity target: reference ``Receiver`` (model.py:241-477):

    h_z = GRUCell(z, h_z)                                 (model.py:340)
    s   = W_s h_z                                         (model.py:414)
    y_i = y2(relu(y1([h_z, desc_i])))  for every class i  (model.py:431-433)
    wd  = sum_i softmax(y)_i.detach() * desc_i            (model.py:439-449)
    w   = W tanh(W_h h_z + W_d wd)                        (model.py:452-454)

TPU-first redesign of the prediction head: the reference materializes the
cartesian product ``B*D x (hid+desc)`` and runs one big Linear over it
(``build_inp``, model.py:519-551). Here ``y1`` is algebraically split into
its ``h_z`` and description blocks — the description block is projected
*once per conversation* in :meth:`precompute` and the per-step cost drops to
one ``(B, hid)`` matmul plus a broadcast add, with no ``B*D`` concat ever
hitting HBM.

The optional word-level description attention (model.py:267-271, 344-410)
replaces the reference's per-class Python slicing/softmax loop with one
masked softmax over a dense ``(D, L_max)`` padded word tensor.

Like the Sender, this module emits logits only; sampling (and the eval-mode
cumulative stop product, model.py:416-427) lives in the exchange engine.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from multimodalgame_tpu.models.gru import TorchGRUCell
from multimodalgame_tpu.models.init import xavier_normal


class ParamDense(nn.Module):
    """Dense layer with explicit kernel/bias access (``kb``), used where
    the consumer needs to restructure the contraction (the ``y2``
    reduction below). Parameter names/shapes are identical to
    ``nn.Dense`` — checkpoint layout is unchanged."""
    in_dim: int
    feats: int

    def setup(self):
        self.kernel = self.param("kernel", xavier_normal(),
                                 (self.in_dim, self.feats))
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.feats,))

    def kb(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return self.kernel, self.bias

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.dot(x, self.kernel) + self.bias


class Receiver(nn.Module):
    z_dim: int
    desc_dim: int
    hid_dim: int
    out_dim: int
    w_dim: int
    s_dim: int
    use_binary: bool = True
    desc_attn: bool = False
    desc_attn_dim: int = 64

    def setup(self):
        dense = lambda feats, name, bias=True: nn.Dense(
            feats, kernel_init=xavier_normal(),
            bias_init=nn.initializers.zeros, use_bias=bias, name=name)
        self.rnn = TorchGRUCell(self.z_dim, self.hid_dim, name="rnn")
        # Communication head (model.py:258-260). w_h/s/d_h use ParamDense
        # (same param names/shapes as nn.Dense) so precompute can fuse
        # their kernels into one h_z matmul.
        self.w_h = ParamDense(self.hid_dim, self.hid_dim, name="w_h")
        self.w_d = dense(self.hid_dim, "w_d", bias=False)
        self.w = dense(self.w_dim, "w")
        # Prediction head. y1 is stored as the reference's single
        # (hid+desc, hid) matrix so torch checkpoints map by transpose; it
        # is consumed in split form (see precompute/step).
        self.y1_kernel = self.param(
            "y1_kernel", xavier_normal(), (self.hid_dim + self.desc_dim,
                                           self.hid_dim))
        self.y1_bias = self.param("y1_bias", nn.initializers.zeros,
                                  (self.hid_dim,))
        if self.out_dim != 1:
            # The reference accepts rec_out_dim > 1 but its own
            # confidence-weighted mixing then multiplies a (B, D*out)
            # softmax into (D, wv) descriptions and fails (model.py:433,
            # 439-449) — dead configuration space. Reject it loudly here
            # instead of crashing with an opaque shape error downstream
            # (same policy as wv_type="none", PARITY.md).
            raise NotImplementedError(
                "rec_out_dim must be 1: the prediction/query pipeline is "
                "per-class scalar scores in both frameworks")
        self.y2 = ParamDense(self.hid_dim, self.out_dim, name="y2")
        # Decision (STOP) head (model.py:265)
        if self.s_dim != 1:
            # Same dead-config policy as rec_out_dim above: the stop-mask
            # chain min(prev_mask, s) assumes a (B, 1) stop bit in both
            # frameworks (exchange.py carry; reference model.py:852), so
            # s_dim > 1 would fail with an opaque scan carry-shape error
            # far from the cause.
            raise NotImplementedError(
                "rec_s_dim must be 1: the stop bit is a scalar per "
                "example in the exchange mask chain")
        self.s = ParamDense(self.hid_dim, self.s_dim, name="s")
        if self.desc_attn:
            self.d_d = dense(self.desc_attn_dim, "d_d")
            self.d_h = ParamDense(self.hid_dim, self.desc_attn_dim,
                                  name="d_h")
            self.d_attn = dense(1, "d_attn")

    def __call__(self, z, h_z, desc, desc_set_padded=None,
                 desc_set_mask=None):
        """Single-turn convenience API (the reference ``forward``,
        model.py:303) — precompute + step. Used for parameter init and
        single-step tests; the exchange engine calls the pieces directly."""
        cache = self.precompute(desc, desc_set_padded, desc_set_mask)
        return self.step(z, h_z, cache)

    def initial_state(self, batch_size: int) -> jnp.ndarray:
        """Zero hidden state (model.py:300-301)."""
        return jnp.zeros((batch_size, self.hid_dim), dtype=jnp.float32)

    def precompute(self, desc: jnp.ndarray,
                   desc_set_padded: Optional[jnp.ndarray] = None,
                   desc_set_mask: Optional[jnp.ndarray] = None
                   ) -> Dict[str, Any]:
        """Conversation-invariant description projections.

        Without word attention: project the CBOW description matrix through
        ``y1``'s description block once — ``(D, hid)``. With word attention:
        project the padded word set through ``d_d`` once (the reference
        recomputes both every step, model.py:352, 431-432).

        Note the reference's concat order differs between paths —
        ``[h_z, desc]`` in build_inp (model.py:548) but ``[desc, h_z]``
        under desc_attn (model.py:409-410) — so the y1 block split swaps
        accordingly.
        """
        cache: Dict[str, Any] = {"desc": desc}
        if self.desc_attn:
            cache["dd"] = self.d_d(desc_set_padded)       # (D, L, A)
            cache["padded"] = desc_set_padded
            cache["mask"] = desc_set_mask
        else:
            k_desc = self.y1_kernel[self.hid_dim:]        # (desc, hid)
            cache["desc_proj"] = (
                jnp.dot(desc, k_desc, preferred_element_type=desc.dtype))
        # Fused h_z head matrix: s / y1-h-block / w_h (and d_h under
        # attention) all contract the same ``(B, hid)`` hidden state, so
        # one concatenated matmul replaces 3-4 separate small dots in the
        # sequential per-turn chain (each output column is the identical
        # dot product — same math, fewer latency-bound ops; the
        # conversation-invariant concat happens once here). Parameters
        # and checkpoint layout are untouched.
        k_h = (self.y1_kernel[self.desc_dim:] if self.desc_attn
               else self.y1_kernel[:self.hid_dim])
        parts_k = [self.s.kernel, k_h, self.w_h.kernel]
        parts_b = [self.s.bias, self.y1_bias, self.w_h.bias]
        if self.desc_attn:
            parts_k.append(self.d_h.kernel)
            parts_b.append(self.d_h.bias)
        cache["hz_k"] = jnp.concatenate(parts_k, axis=1)
        cache["hz_b"] = jnp.concatenate(parts_b, axis=0)
        return cache

    def gru(self, z: jnp.ndarray, h_z: jnp.ndarray) -> jnp.ndarray:
        """The bare recurrence ``h' = GRU(z, h)`` (model.py:340) — exposed
        separately so the fast training path can rebuild the hidden-state
        chain without the heads (game/fast_train.py)."""
        return self.rnn(z, h_z)

    def step(self, z: jnp.ndarray, h_z: jnp.ndarray, cache: Dict[str, Any]
             ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """One receiver turn.

        Args:
            z: the Sender's message ``(B, z_dim)`` (stop-gradiented by the
               exchange engine, model.py:826-829).
            h_z: previous hidden state ``(B, hid)``.
            cache: output of :meth:`precompute`.

        Returns ``(h_z_new, s_logits, y, w_logits)`` with ``y`` shaped
        ``(B, D*out_dim)`` (``out_dim`` is 1 in every reference config).
        """
        h_z_new = self.rnn(z, h_z)
        s_logits, y, w_logits = self.heads(h_z_new, cache)
        return h_z_new, s_logits, y, w_logits

    def heads(self, h_z_new: jnp.ndarray, cache: Dict[str, Any]
              ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """STOP / prediction / query heads on an (already-updated) hidden
        state — the non-recurrent part of a receiver turn."""
        desc = cache["desc"]
        num_desc = desc.shape[0]

        # One fused matmul for every h_z-consuming head (see precompute):
        # [s | y1-h-block (+y1_bias) | w_h | d_h?].
        fused = (jnp.dot(h_z_new, cache["hz_k"],
                         preferred_element_type=h_z_new.dtype)
                 + cache["hz_b"])
        o1 = self.s_dim
        o2 = o1 + self.hid_dim
        o3 = o2 + self.hid_dim
        s_logits = fused[:, :o1]
        y1h = fused[:, o1:o2]          # h_z @ y1_k_h + y1_bias
        w_h_out = fused[:, o2:o3]      # w_h(h_z)

        if self.desc_attn:
            # Word-level attention (model.py:344-410): score every word
            # against h_z, softmax within each class's words, CBOW-pool.
            dh = fused[:, o3:]                            # d_h(h_z) (B, A)
            pre = jnp.tanh(cache["dd"][None] + dh[:, None, None, :])
            scores = self.d_attn(pre)[..., 0]             # (B, D, L)
            neg = jnp.finfo(scores.dtype).min
            scores = jnp.where(cache["mask"][None] > 0, scores, neg)
            alpha = nn.softmax(scores, axis=-1)           # (B, D, L)
            weighted_desc = jnp.einsum("bdl,dlv->bdv", alpha,
                                       cache["padded"])   # (B, D, desc)
            # y1 with desc_attn concat order [desc, h_z] (model.py:409-410);
            # the h_z block and y1_bias arrive via the fused matmul.
            k_desc = self.y1_kernel[:self.desc_dim]
            y_hid = jax.nn.relu(
                jnp.einsum("bdv,vh->bdh", weighted_desc, k_desc)
                + y1h[:, None, :])
        else:
            # y1 with build_inp concat order [h_z, desc] (model.py:548).
            y_hid = jax.nn.relu(
                y1h[:, None, :] + cache["desc_proj"][None])  # (B, D, hid)

        # y2 as an explicit multiply-reduce (out_dim is 1 in every
        # reference config): XLA fuses the whole relu(y1...) chain into
        # one reduction kernel, so the (B, D, hid) intermediate is never
        # materialized in HBM — at large class counts that intermediate
        # (e.g. 1 GB at B=1024, D=1000, hid=256 in f32) is the
        # bandwidth bottleneck. A dot/matmul form would force
        # materialization as an MXU operand.
        k2, b2 = self.y2.kb()
        y = (jnp.sum(y_hid * k2[:, 0][None, None, :], axis=-1)
             + b2)                                        # (B, D)
        y = y.reshape(h_z_new.shape[0], -1)

        # Confidence-weighted description mixing; scores detached
        # (model.py:441: F.softmax(y).detach()).
        y_scores = jax.lax.stop_gradient(nn.softmax(y, axis=-1))
        if self.desc_attn:
            wd_inp = jnp.einsum("bd,bdv->bv",
                                y_scores.reshape(-1, num_desc),
                                weighted_desc)
        else:
            wd_inp = jnp.dot(y_scores.reshape(-1, num_desc), desc,
                             preferred_element_type=desc.dtype)

        h_w = jnp.tanh(w_h_out + self.w_d(wd_inp))
        w_logits = self.w(h_w)

        return s_logits, y, w_logits
