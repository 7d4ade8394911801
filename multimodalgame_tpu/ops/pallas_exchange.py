"""Fused whole-conversation Pallas kernel for eval/serving.

The eval-mode exchange (rounded messages, cumulative stop product —
reference model.py:222-229, 414-429) is fully deterministic, so the entire
``max_exchange``-step conversation can run as ONE Pallas kernel: every
weight matrix, the description matrix, and the batch all fit comfortably
in VMEM (~1 MB at the canonical config), and the T-step recurrence becomes
an unrolled in-register loop with zero intermediate HBM traffic — the
latency-bound small-matmul chain that XLA executes as ~30 scheduled ops
per step collapses into a single launch.

Supported configuration (the flagship Fixed/Adaptive families): binary
channel, no visual/description attention, no eval-time flipout. The
exchange engine automatically falls back to the lax.scan path otherwise
(see ``supports_config`` and game/train.py's ``make_eval_exchange``).

Numerical note: against the lax.scan path the kernel is bit-exact under
exact-f32 matmuls (interpret mode, or TPU with
``jax_default_matmul_precision='highest'``). At the TPU's default matmul
precision the two implementations round differently, and because sampled
bits feed back into the conversation a probability that lands on the
0.5 threshold can flip a bit and let trajectories diverge — both remain
valid implementations of the same eval semantics.

Layout notes (pallas_guide): batch 64 rows fill f32 sublanes exactly;
message (32), hidden (64/256), and class (30) dims are each a single
128-lane tile, so all VPU ops are one-tile wide and the two big matmuls
(image projection, prediction head) hit the MXU.

Batch-size support (measured on v5e, 2026-08-17): batches < 8 fail to
lower ("Not implemented: Offset change" on sub-sublane reductions) —
``make_eval_exchange`` routes them to the scan path automatically.
Batches 8, 12, 64, and the canonical sizes compile and run; batch 100 at
the canonical dims reproducibly OOM-kills this environment's Mosaic
compile helper (SIGKILL, twice) — a compiler resource limit, not a
lowering error. The kernel is opt-in (MMG_USE_PALLAS_EVAL=1 /
``Predictor(use_pallas=True)``); the scan path is the default and is
faster anyway (PERFORMANCE.md).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodalgame_tpu.game.config import GameConfig


class FusedEvalOutputs(NamedTuple):
    stop_feats: jnp.ndarray  # (T, B, 1)
    stop_probs: jnp.ndarray  # (T, B, 1)
    sen_feats: jnp.ndarray   # (T, B, W) — post-corruption
    sen_probs: jnp.ndarray   # (T, B, W)
    rec_feats: jnp.ndarray   # (T, B, W)
    rec_probs: jnp.ndarray   # (T, B, W)
    y: jnp.ndarray           # (T, B, D)
    masks: jnp.ndarray       # (T, B, 1) post-step stop-mask chain


def supports_config(cfg: GameConfig) -> bool:
    """The fused kernel covers the non-attention binary-channel eval path
    without stochastic eval-time corruption."""
    return (cfg.use_binary and not cfg.visual_attn and not cfg.desc_attn
            and cfg.rec_s_dim == 1 and cfg.rec_out_dim == 1
            and cfg.sender_mix in ("sum", "prod")
            and not (cfg.flipout_dev and (cfg.flipout_sen is not None or
                                          cfg.flipout_rec is not None)))


def _uniform01(shape):
    """Uniform [0,1) floats from the per-core PRNG (24-bit mantissa).
    Mosaic has no uint32->f32 cast, so shift down to 24 bits (which fit
    exactly) and route through int32."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    small = pltpu.bitcast(bits >> jnp.uint32(8), jnp.int32)
    return small.astype(jnp.float32) * (1.0 / (1 << 24))


def _kernel(cfg: GameConfig, train: bool,
            # inputs
            seed_ref, data_ref, desc_ref, corrupt_ref,
            s_wimg, s_bimg, s_wcode, s_bcode, s_cbias, s_wbin, s_bbin,
            r_wih, r_whh, r_bih, r_bhh,
            r_y1h, r_y1d, r_y1b, r_y2k, r_y2b,
            r_sk, r_sb, r_whk, r_whb, r_wdk, r_wk, r_wb,
            # outputs
            o_sfeat, o_sprob, o_zfeat, o_zprob, o_wfeat, o_wprob, o_y,
            o_mask):
    T = cfg.max_exchange
    batch = data_ref.shape[0]
    hid = r_whh.shape[0]

    if train:
        pltpu.prng_seed(seed_ref[0])

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    def sample(probs):
        return (_uniform01(probs.shape) < probs).astype(jnp.float32)

    # Conversation-invariant projections (sender image path; the y1
    # description block — game/receiver.py's precompute, done in-kernel).
    h_x = dot(data_ref[:], s_wimg[:]) + s_bimg[:]          # (B, H)
    desc = desc_ref[:]                                      # (D, WV)
    desc_proj = dot(desc, r_y1d[:])                         # (D, R)
    first_code = jax.nn.sigmoid(s_cbias[:]).reshape(1, -1)  # (1, W)
    h_w_first = dot(first_code, s_wcode[:]) + s_bcode[:]    # (1, H)

    h_z = jnp.zeros((batch, hid), jnp.float32)
    w_prev = jnp.full((batch, cfg.rec_w_dim), cfg.first_rec, jnp.float32)
    mask = jnp.ones((batch, 1), jnp.float32)
    sprod = jnp.ones((batch, 1), jnp.float32)

    for t in range(T):  # static unroll — T is small (<= ~10)
        # --- Sender turn (model.py:144-238) ---
        if t == 0:
            h_w = jnp.broadcast_to(h_w_first, h_x.shape)
        else:
            h_w = dot(w_prev, s_wcode[:]) + s_bcode[:]
        if cfg.ignore_code:
            mixed = jnp.tanh(h_x)
        elif cfg.sender_mix == "prod":
            mixed = jnp.tanh(h_x * h_w)
        else:  # sum (mou is rejected by supports_config upstream sizing)
            mixed = jnp.tanh(h_x + h_w)
        z_logits = dot(mixed, s_wbin[:]) + s_bbin[:]
        z_probs = jax.nn.sigmoid(z_logits)
        if train:
            z = sample(z_probs)
            if cfg.flipout_sen is not None:
                z = jnp.abs(z - sample(jnp.full_like(z, cfg.flipout_sen)))
        else:
            z = jnp.floor(z_probs + 0.5)
        z = jnp.abs(z - corrupt_ref[:])  # bit-flip corruption (or zeros)

        # --- Receiver GRU (models/gru.py; torch gate order [r|z|n]) ---
        gi = dot(z, r_wih[:]) + r_bih[:]
        gh = dot(h_z, r_whh[:]) + r_bhh[:]
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_zg, h_n = jnp.split(gh, 3, axis=-1)
        rg = jax.nn.sigmoid(i_r + h_r)
        zg = jax.nn.sigmoid(i_z + h_zg)
        ng = jnp.tanh(i_n + rg * h_n)
        h_z = (1.0 - zg) * ng + zg * h_z

        # --- STOP bit: sampled in train; cumulative product rule in eval
        # (model.py:414-429) ---
        s_prob = jax.nn.sigmoid(dot(h_z, r_sk[:]) + r_sb[:])
        if train:
            s_bit = sample(s_prob)
        else:
            if cfg.s_prob_prod:
                # sprod starts at ones; 1.0 * x is exact, so t==0 needs
                # no special case (same form as game/exchange.py).
                sprod = sprod * s_prob
            else:
                sprod = s_prob
            s_bit = jnp.floor(sprod + 0.5)

        # --- Prediction head (split-y1 redesign, models/receiver.py) ---
        y_hid = jax.nn.relu(dot(h_z, r_y1h[:])[:, None, :]
                            + desc_proj[None] + r_y1b[:])   # (B, D, R)
        num_desc = y_hid.shape[1]
        y = dot(y_hid.reshape(batch * num_desc, hid),
                r_y2k[:]).reshape(batch, num_desc) + r_y2b[:]  # (B, D)

        # --- Query back (model.py:435-468); scores detached is moot in
        # eval ---
        y_scores = jax.nn.softmax(y, axis=-1)
        wd = dot(y_scores, desc)                            # (B, WV)
        h_wq = jnp.tanh(dot(h_z, r_whk[:]) + r_whb[:] + dot(wd, r_wdk[:]))
        w_logits = dot(h_wq, r_wk[:]) + r_wb[:]
        w_probs = jax.nn.sigmoid(w_logits)
        if train:
            w_bits = sample(w_probs)
            if cfg.flipout_rec is not None:
                w_bits = jnp.abs(
                    w_bits - sample(jnp.full_like(w_bits,
                                                  cfg.flipout_rec)))
        else:
            w_bits = jnp.floor(w_probs + 0.5)
        if cfg.ignore_receiver:
            w_bits = jnp.zeros_like(w_bits)

        mask = jnp.minimum(mask, s_bit)

        o_sfeat[t] = s_bit
        o_sprob[t] = s_prob
        o_zfeat[t] = z
        o_zprob[t] = z_probs
        o_wfeat[t] = w_bits
        o_wprob[t] = w_probs
        o_y[t] = y
        o_mask[t] = mask
        w_prev = w_bits


def _fused_call(cfg: GameConfig, params: Dict[str, Any],
                data: jnp.ndarray, desc: jnp.ndarray, train: bool,
                seed, corrupt_mask: Optional[jnp.ndarray],
                interpret: bool) -> FusedEvalOutputs:
    assert supports_config(cfg), "config not supported by the fused kernel"
    sen = params["sender"]
    rec = params["receiver"]
    batch = data.shape[0]
    num_desc = desc.shape[0]
    T = cfg.max_exchange
    W = cfg.rec_w_dim

    if corrupt_mask is None:
        corrupt = jnp.zeros((1, W), jnp.float32)
    else:
        corrupt = jnp.asarray(corrupt_mask, jnp.float32).reshape(1, W)
    seed_arr = jnp.asarray([seed], jnp.int32) if train else \
        jnp.zeros((1,), jnp.int32)

    out_shape = (
        jax.ShapeDtypeStruct((T, batch, 1), jnp.float32),      # s_feat
        jax.ShapeDtypeStruct((T, batch, 1), jnp.float32),      # s_prob
        jax.ShapeDtypeStruct((T, batch, W), jnp.float32),      # z feat
        jax.ShapeDtypeStruct((T, batch, W), jnp.float32),      # z prob
        jax.ShapeDtypeStruct((T, batch, W), jnp.float32),      # w feat
        jax.ShapeDtypeStruct((T, batch, W), jnp.float32),      # w prob
        jax.ShapeDtypeStruct((T, batch, num_desc), jnp.float32),  # y
        jax.ShapeDtypeStruct((T, batch, 1), jnp.float32),      # mask
    )
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)

    inputs = (
        seed_arr, data, desc, corrupt,
        sen["image_layer"]["kernel"], sen["image_layer"]["bias"],
        sen["code_layer"]["kernel"], sen["code_layer"]["bias"],
        sen["code_bias"],
        sen["binary_layer"]["kernel"], sen["binary_layer"]["bias"],
        rec["rnn"]["w_ih"], rec["rnn"]["w_hh"],
        rec["rnn"]["b_ih"], rec["rnn"]["b_hh"],
        rec["y1_kernel"][:cfg.rec_hidden],   # h_z block
        rec["y1_kernel"][cfg.rec_hidden:],   # desc block
        rec["y1_bias"],
        rec["y2"]["kernel"], rec["y2"]["bias"],
        rec["s"]["kernel"], rec["s"]["bias"],
        rec["w_h"]["kernel"], rec["w_h"]["bias"],
        rec["w_d"]["kernel"],
        rec["w"]["kernel"], rec["w"]["bias"],
    )

    in_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)]
                + [vmem() for _ in inputs[1:]])
    outs = pl.pallas_call(
        functools.partial(_kernel, cfg, train),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=tuple(vmem() for _ in out_shape),
        interpret=interpret,
    )(*inputs)
    return FusedEvalOutputs(*outs)


def fused_eval_exchange(cfg: GameConfig, params: Dict[str, Any],
                        data: jnp.ndarray, desc: jnp.ndarray,
                        corrupt_mask: Optional[jnp.ndarray] = None,
                        interpret: bool = False) -> FusedEvalOutputs:
    """Run the whole eval conversation in one Pallas kernel.

    Bit-exact (modulo matmul rounding) with the lax.scan exchange in eval
    mode; see tests/test_pallas.py.
    """
    return _fused_call(cfg, params, data, desc, False, 0, corrupt_mask,
                       interpret)


def fused_train_forward(cfg: GameConfig, params: Dict[str, Any],
                        data: jnp.ndarray, desc: jnp.ndarray, seed,
                        interpret: bool = False) -> FusedEvalOutputs:
    """Sampled (train-mode) conversation in one Pallas kernel using the
    on-core PRNG — the gradient-free phase A of the fast training path
    (game/fast_train.py). The RNG stream differs from ``jax.random`` (the
    bits are an equally valid Monte-Carlo sample; determinism is per
    ``seed``). Flipout noise is applied in-kernel; eval-only channel
    corruption is not (the reference only corrupts at eval,
    model.py:636-638)."""
    return _fused_call(cfg, params, data, desc, True, seed, None,
                       interpret)
