"""Torch re-derivation of the reference forward math, used as a parity
oracle (SURVEY §4b; VERDICT round-1 item #2).

These modules reproduce, in modern torch, exactly what the py2/torch-0.x
reference computes in ``Sender.forward`` (model.py:144-238),
``Receiver.forward`` (model.py:303-477), ``Baseline.forward``
(model.py:480-516), ``build_inp`` (model.py:519-551) and the eval-mode
parts of ``exchange`` (model.py:725-876). They are a TEST FIXTURE only —
weights are never initialized here; tests inject weights converted from
the JAX parameter trees through ``utils/torch_interop`` and assert the
two frameworks agree to float32 precision.

Only the deterministic paths are modeled (eval-mode rounding, the
cumulative stop product, logits/probabilities before sampling) — sampled
bits can never match across RNG implementations and are excluded from
parity by design.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


class OracleSender(nn.Module):
    """model.py:49-238 (deterministic parts)."""

    def __init__(self, cfg, feat_dim):
        super().__init__()
        h, w, out = cfg.img_h_dim, cfg.rec_w_dim, cfg.sender_out_dim
        self.cfg = cfg
        self.image_layer = nn.Linear(feat_dim, h)
        self.code_layer = nn.Linear(w, h)
        self.code_bias = nn.Parameter(torch.zeros(out))
        bin_in = h * 4 if cfg.sender_mix == "mou" else h
        self.binary_layer = nn.Linear(bin_in, out)
        if cfg.sender_mix == "mou" and cfg.ignore_code:
            self.code_bias_mou = nn.Parameter(torch.zeros(out))
        if cfg.visual_attn:
            self.attn_W_x = nn.Linear(feat_dim, cfg.attn_dim)
            self.attn_W_w = nn.Linear(w, cfg.attn_dim)
            self.attn_U = nn.Linear(cfg.attn_dim, 1)
            if cfg.attn_extra_context:
                self.attn_W_g = nn.Linear(cfg.attn_context_dim, cfg.attn_dim)

    def forward(self, x, w, g, t):
        """Returns ``(probs, attn_scores)``; the eval-mode message is
        ``round(probs)`` (model.py:222-229)."""
        cfg = self.cfg
        attn_scores = None
        if cfg.visual_attn:
            b, c, hh, ww = x.size()
            n = hh * ww
            x = x.view(b, c, n).transpose(1, 2)           # (B, N, C)
            pre = self.attn_W_w(w).unsqueeze(1) + self.attn_W_x(x)
            if cfg.attn_extra_context:
                pre = pre + self.attn_W_g(g).unsqueeze(1)
            scores = self.attn_U(torch.tanh(pre)).squeeze(-1)
            if t == 0:
                attn_scores = torch.full((b, n), 1.0 / n)  # model.py:177-180
            else:
                attn_scores = F.softmax(scores, dim=1)
            _x = torch.bmm(attn_scores.unsqueeze(1), x).squeeze(1)
        else:
            _x = x

        self.h_x = h_x = self.image_layer(_x)
        if t == 0:
            h_w = self.code_layer(
                torch.sigmoid(self.code_bias.view(1, -1))).expand_as(h_x)
        elif cfg.ignore_code and cfg.sender_mix == "mou":
            h_w = self.code_layer(
                torch.sigmoid(self.code_bias_mou.view(1, -1))).expand_as(h_x)
        else:
            h_w = self.code_layer(w)

        if cfg.ignore_code and cfg.sender_mix in ("sum", "prod"):
            feats = self.binary_layer(torch.tanh(h_x))
        elif cfg.sender_mix == "sum":
            feats = self.binary_layer(torch.tanh(h_x + h_w))
        elif cfg.sender_mix == "prod":
            feats = self.binary_layer(torch.tanh(h_x * h_w))
        else:  # mou (with or without ignore_code)
            feats = self.binary_layer(torch.tanh(
                torch.cat([h_x, h_w, h_x - h_w, h_x * h_w], 1)))
        return torch.sigmoid(feats), attn_scores


class OracleReceiver(nn.Module):
    """model.py:241-477 (deterministic parts). Carries ``h_z`` and the
    eval cumulative stop product across calls like the reference."""

    def __init__(self, cfg, num_classes):
        super().__init__()
        z, d, h = cfg.sender_out_dim, cfg.wv_dim, cfg.rec_hidden
        self.cfg = cfg
        self.rnn = nn.GRUCell(z, h)
        self.w_h = nn.Linear(h, h)
        self.w_d = nn.Linear(d, h, bias=False)
        self.w = nn.Linear(h, cfg.rec_w_dim)
        self.y1 = nn.Linear(h + d, h)
        self.y2 = nn.Linear(h, cfg.rec_out_dim)
        self.s = nn.Linear(h, cfg.rec_s_dim)
        if cfg.desc_attn:
            self.d_d = nn.Linear(d, cfg.desc_attn_dim)
            self.d_h = nn.Linear(h, cfg.desc_attn_dim)
            self.d_attn = nn.Linear(cfg.desc_attn_dim, 1)
        self.reset_state()

    def reset_state(self):
        self.h_z = None
        self.s_prob_prod = None

    def forward(self, z, desc, desc_set=None, desc_set_lens=None):
        cfg = self.cfg
        b = z.size(0)
        if self.h_z is None:
            self.h_z = torch.zeros(b, self.rnn.hidden_size)
        self.h_z = self.rnn(z, self.h_z)

        if cfg.desc_attn:
            # Partitioned word attention (model.py:344-410).
            nw = desc_set.size(0)
            dd = self.d_d(desc_set).unsqueeze(0)          # (1, NW, A)
            dh = self.d_h(self.h_z).unsqueeze(1)          # (B, 1, A)
            d_attn = self.d_attn(torch.tanh(dd + dh)).view(b, nw)
            cum, parts = 0, []
            for n in desc_set_lens:
                parts.append(F.softmax(d_attn[:, cum:cum + n], dim=1))
                cum += n
            scores = torch.cat(parts, 1)                  # (B, NW)
            weighted = desc_set.unsqueeze(0) * scores.unsqueeze(2)
            cum, cbows = 0, []
            for n in desc_set_lens:
                cbows.append(weighted[:, cum:cum + n, :].sum(1, keepdim=True))
                cum += n
            weighted_desc = torch.cat(cbows, 1)           # (B, D, WV)
            nclasses = weighted_desc.size(1)
            inp = torch.cat(
                [weighted_desc.reshape(b * nclasses, -1),
                 self.h_z.unsqueeze(1).expand(b, nclasses,
                                              self.rnn.hidden_size)
                 .reshape(b * nclasses, -1)], 1)          # [desc, h_z]
        else:
            # build_inp cartesian concat [h_z, desc] (model.py:519-551).
            nclasses = desc.size(0)
            inp = torch.cat(
                [self.h_z.repeat_interleave(nclasses, dim=0),
                 desc.repeat(b, 1)], 1)

        s_prob = torch.sigmoid(self.s(self.h_z))
        # Eval-mode stop inference: cumulative product (model.py:421-427).
        if self.s_prob_prod is None or not cfg.s_prob_prod:
            self.s_prob_prod = s_prob
        else:
            self.s_prob_prod = self.s_prob_prod * s_prob
        s_binary = torch.round(self.s_prob_prod).detach()

        y = self.y2(self.y1(inp).clamp(min=0)).view(b, -1)

        y_scores = F.softmax(y, dim=1).detach()
        if cfg.desc_attn:
            wd_inp = (y_scores.unsqueeze(2) * weighted_desc).sum(1)
        else:
            wd_inp = (y_scores.unsqueeze(2) * desc.unsqueeze(0)).sum(1)
        self.h_w = torch.tanh(self.w_h(self.h_z) + self.w_d(wd_inp))
        w_scores = self.w(self.h_w)
        if cfg.use_binary:
            w_probs = torch.sigmoid(w_scores)
            w_feats = torch.round(w_probs).detach()
            if cfg.ignore_receiver:
                w_feats = torch.zeros_like(w_feats)
        else:
            w_feats, w_probs = w_scores, None
        return (s_binary, s_prob), (w_feats, w_probs), y


class OracleBaseline(nn.Module):
    """model.py:480-516."""

    def __init__(self, hid_dim, x_dim, binary_dim, inp_dim):
        super().__init__()
        self.linear1 = nn.Linear(x_dim + binary_dim + inp_dim, hid_dim)
        self.linear2 = nn.Linear(hid_dim, 1)

    def forward(self, x, binary, inp):
        feats = torch.cat([f for f in (x, binary, inp) if f is not None], 1)
        return self.linear2(self.linear1(feats).clamp(min=0))


@torch.no_grad()
def oracle_eval_exchange(sender, receiver, cfg, data, desc, max_exchange,
                         data_context=None, desc_set=None,
                         desc_set_lens=None, break_early=False,
                         corrupt_mask=None):
    """The reference eval-mode conversation loop (model.py:725-876):
    returns per-step lists matching the appended records, with the final
    stop mask forced to zero."""
    b = data.size(0)
    rec = dict(stop_mask=[torch.ones(b, 1)], stop_feat=[], stop_prob=[],
               sen_feats=[], sen_probs=[], rec_feats=[], rec_probs=[], y=[])
    w_binary = torch.full((b, cfg.rec_w_dim), float(cfg.first_rec))
    receiver.reset_state()
    for t in range(max_exchange):
        z_r = w_binary
        z_probs, _ = sender(data, z_r, data_context, t)
        z_binary = torch.round(z_probs)
        if corrupt_mask is not None:
            z_binary = (z_binary - corrupt_mask.view(1, -1)).abs()
        (s_binary, s_prob), (w_binary, w_probs), outp = receiver(
            z_binary, desc, desc_set, desc_set_lens)
        rec["stop_mask"].append(torch.min(rec["stop_mask"][-1], s_binary))
        rec["stop_feat"].append(s_binary)
        rec["stop_prob"].append(s_prob)
        rec["sen_feats"].append(z_binary)
        rec["sen_probs"].append(z_probs)
        rec["rec_feats"].append(w_binary)
        rec["rec_probs"].append(w_probs)
        rec["y"].append(outp)
        if break_early and float(rec["stop_mask"][-1].sum()) == 0:
            break
    rec["stop_mask"][-1].fill_(0)
    return rec
