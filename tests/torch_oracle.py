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

Round 3 extends the oracle to the full TRAINING step (VERDICT round-2
item #1): ``oracle_train_exchange`` replays *recorded bit traces* (the
sampled z/w/s bits from a JAX training exchange) through the torch
modules with gradients flowing, ``oracle_losses`` re-derives the
reference's loss assembly (model.py:879-988, 1264-1305) on the ragged
break_early lists, and ``oracle_apply_updates`` runs the reference's
four backward/clip(1.0)/step updates (model.py:1307-1330) with torch
optimizers. Because sampled bits cross the channel as constants in both
frameworks, injecting identical bits makes every downstream quantity —
losses, per-agent gradients, post-update parameters — comparable at
float64 precision.

Documented deviation: gradient clipping uses optax's exact formula
``g * min(1, max_norm/||g||)``; torch's ``clip_grad_norm_`` computes
``max_norm/(||g||+1e-6)`` — a ≤1e-6 relative difference on the update
whenever clipping engages (PARITY.md).
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
                attn_scores = torch.full((b, n), 1.0 / n,
                                         dtype=x.dtype)  # model.py:177-180
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

    def _heads(self, z, desc, desc_set=None, desc_set_lens=None):
        """Shared deterministic head math (model.py:303-412, 431-455):
        updates ``self.h_z`` (gradient flows across steps like the
        reference's carried hidden state) and returns
        ``(s_prob, y, w_probs_or_scores)``."""
        cfg = self.cfg
        b = z.size(0)
        if self.h_z is None:
            self.h_z = z.new_zeros(b, self.rnn.hidden_size)
        self.h_z = self.rnn(z, self.h_z)

        if cfg.desc_attn:
            nw = desc_set.size(0)
            dd = self.d_d(desc_set).unsqueeze(0)
            dh = self.d_h(self.h_z).unsqueeze(1)
            d_attn = self.d_attn(torch.tanh(dd + dh)).view(b, nw)
            cum, parts = 0, []
            for n in desc_set_lens:
                parts.append(F.softmax(d_attn[:, cum:cum + n], dim=1))
                cum += n
            scores = torch.cat(parts, 1)
            weighted = desc_set.unsqueeze(0) * scores.unsqueeze(2)
            cum, cbows = 0, []
            for n in desc_set_lens:
                cbows.append(weighted[:, cum:cum + n, :].sum(1, keepdim=True))
                cum += n
            weighted_desc = torch.cat(cbows, 1)
            nclasses = weighted_desc.size(1)
            inp = torch.cat(
                [weighted_desc.reshape(b * nclasses, -1),
                 self.h_z.unsqueeze(1).expand(b, nclasses,
                                              self.rnn.hidden_size)
                 .reshape(b * nclasses, -1)], 1)
        else:
            nclasses = desc.size(0)
            inp = torch.cat(
                [self.h_z.repeat_interleave(nclasses, dim=0),
                 desc.repeat(b, 1)], 1)

        s_prob = torch.sigmoid(self.s(self.h_z))
        y = self.y2(self.y1(inp).clamp(min=0)).view(b, -1)

        y_scores = F.softmax(y, dim=1).detach()  # model.py:441
        if cfg.desc_attn:
            wd_inp = (y_scores.unsqueeze(2) * weighted_desc).sum(1)
        else:
            wd_inp = (y_scores.unsqueeze(2) * desc.unsqueeze(0)).sum(1)
        self.h_w = torch.tanh(self.w_h(self.h_z) + self.w_d(wd_inp))
        w_scores = self.w(self.h_w)
        return s_prob, y, w_scores

    def forward_train(self, z, desc, desc_set=None, desc_set_lens=None):
        """Training-mode head pass (model.py:414-420, 452-460 with the
        numpy sampling factored out — the caller injects recorded bits).
        Returns ``(s_prob, y, w_probs)`` with gradients flowing."""
        s_prob, y, w_scores = self._heads(z, desc, desc_set, desc_set_lens)
        return s_prob, y, torch.sigmoid(w_scores)

    def forward(self, z, desc, desc_set=None, desc_set_lens=None):
        cfg = self.cfg
        s_prob, y, w_scores = self._heads(z, desc, desc_set, desc_set_lens)

        # Eval-mode stop inference: cumulative product (model.py:421-427).
        if self.s_prob_prod is None or not cfg.s_prob_prod:
            self.s_prob_prod = s_prob
        else:
            self.s_prob_prod = self.s_prob_prod * s_prob
        s_binary = torch.round(self.s_prob_prod).detach()

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


# ---------------------------------------------------------------------------
# Training-step oracle (VERDICT round-2 item #1)
# ---------------------------------------------------------------------------

def oracle_train_exchange(sender, receiver, bas_sen, bas_rec, cfg, data,
                          desc, traces, data_context=None, desc_set=None,
                          desc_set_lens=None):
    """The reference's TRAIN-mode conversation loop (model.py:725-876)
    with the numpy Bernoulli draws replaced by recorded bit traces.

    ``traces`` holds ``z``/``w``/``s`` arrays of shape ``(T, B, dim)`` —
    the sampled sender messages, receiver queries, and stop bits from a
    JAX training exchange. Sampled bits are constants in both frameworks
    (reference: numpy round-trip, model.py:225-227, 418-420, 458-460), so
    replaying them reproduces the exact computation graph the reference
    would build, gradients included. Returns the reference's ragged
    per-step lists (``break_early`` honored for adaptive configs).
    """
    t_of = lambda a, t: torch.as_tensor(a[t]).to(data.dtype)  # noqa: E731
    b = data.size(0)
    rec = dict(stop_mask=[torch.ones(b, 1, dtype=data.dtype)],
               stop_feat=[], stop_prob=[], sen_feats=[], sen_probs=[],
               rec_feats=[], rec_probs=[], y=[], bs=[], br=[])
    w_binary = torch.full((b, cfg.rec_w_dim), float(cfg.first_rec),
                          dtype=data.dtype)
    receiver.reset_state()
    break_early = not cfg.fixed_exchange
    for t in range(cfg.max_exchange):
        z_r = w_binary.detach()                      # Variable(z_r.data)
        z_probs, _ = sender(data, z_r, data_context, t)
        z_binary = t_of(traces["z"], t)              # injected sample
        s_prob, y, w_probs = receiver.forward_train(
            z_binary, desc, desc_set, desc_set_lens)
        s_binary = t_of(traces["s"], t)
        w_binary = t_of(traces["w"], t)
        if cfg.ignore_receiver:                      # model.py:470-472
            w_binary = torch.zeros_like(w_binary)

        # Baselines on fully detached inputs (model.py:831-843);
        # receiver h_z is the post-step state.
        bs_score = bas_sen(sender.h_x.detach(), z_r, None)
        br_score = bas_rec(None, z_binary, receiver.h_z.detach())

        rec["stop_mask"].append(torch.min(rec["stop_mask"][-1], s_binary))
        rec["stop_feat"].append(s_binary)
        rec["stop_prob"].append(s_prob)
        rec["sen_feats"].append(z_binary)
        rec["sen_probs"].append(z_probs)
        rec["rec_feats"].append(w_binary)
        rec["rec_probs"].append(w_probs)
        rec["y"].append(y)
        rec["bs"].append(bs_score)
        rec["br"].append(br_score)
        if break_early and float(rec["stop_mask"][-1].sum()) == 0:
            break
    rec["stop_mask"][-1] = torch.zeros_like(rec["stop_mask"][-1])
    return rec


def o_calculate_loss_binary(feats, probs, logs, scores, entropy_penalty):
    """model.py:907-927 — REINFORCE with std-normalized advantage and
    two-sided entropy bonus. ``torch.std`` is unbiased (N-1), matching
    the reference's torch-0.x semantics; the ``logs.size(0) > 1`` guard
    skips normalization for single-row (masked) subsets exactly as the
    reference does."""
    f = feats.detach()
    log_p_z = (f * torch.log(probs + 1e-8)
               + (1 - f) * torch.log(1 - probs + 1e-8)).sum(
        1, keepdim=True)
    weight = (logs - scores).detach()
    if logs.size(0) > 1:
        weight = weight / max(1.0, float(torch.std(weight)))
    loss = torch.mean(-1 * weight * log_p_z)
    initial_negent = (torch.log(probs + 1e-8) * probs).sum(1).mean()
    inverse_negent = (torch.log((1.0 - probs) + 1e-8)
                      * (1.0 - probs)).sum(1).mean()
    negentropy = initial_negent + inverse_negent
    if entropy_penalty is not None:
        loss = loss + entropy_penalty * negentropy
    return loss, negentropy


def o_multistep_loss_binary(feats, probs, logs, scores, masks,
                            entropy_penalty):
    """model.py:930-968 on the ragged lists. With ``break_early``
    honored, every mask in the executed window is non-empty (the
    cumulative-min chain is monotone), so ``mapped_fn``'s zero-mask
    branch is unreachable — asserted here."""
    if masks is not None:
        losses, mask_sums = [], []
        for ft, pb, sc, m in zip(feats, probs, scores, masks):
            sel = m.detach().bool().squeeze(1)
            n = float(m.sum())
            assert n > 0, "zero-mask step reached the ragged loss"
            l, _ = o_calculate_loss_binary(ft[sel], pb[sel], logs[sel],
                                           sc[sel], entropy_penalty)
            losses.append(l * n)
            mask_sums.append(n)
        return sum(losses) / sum(mask_sums)
    losses = [o_calculate_loss_binary(ft, pb, logs, sc, entropy_penalty)[0]
              for ft, pb, sc in zip(feats, probs, scores)]
    return sum(losses) / len(feats)


def o_multistep_loss_bas(scores, logs, masks):
    """model.py:971-988 — masked MSE regression onto detached rewards."""
    tgt = logs.detach()
    if masks is not None:
        losses, mask_sums = [], []
        for sc, m in zip(scores, masks):
            sel = m.detach().bool().squeeze(1)
            n = float(m.sum())
            losses.append(F.mse_loss(sc[sel], tgt[sel]) * n)
            mask_sums.append(n)
        return sum(losses) / sum(mask_sums)
    return sum(F.mse_loss(sc, tgt) for sc in scores) / len(scores)


def oracle_losses(cfg, rec, target):
    """The reference's loss assembly (model.py:1247-1305) on the ragged
    exchange record. Returns a dict of loss tensors (gradients attached)
    mirroring the names logged by the reference."""
    if cfg.fixed_exchange:
        binary_s_masks = binary_rec_masks = binary_sen_masks = None
        bas_rec_masks = bas_sen_masks = y_masks = None
    else:
        s_masks = rec["stop_mask"]
        binary_s_masks = s_masks[:-1]
        binary_rec_masks = s_masks[1:-1]
        binary_sen_masks = s_masks[:-1]
        bas_rec_masks = s_masks[:-1]
        bas_sen_masks = s_masks[:-1]
        y_masks = [torch.min(1 - m1, m2)
                   for m1, m2 in zip(s_masks[1:], s_masks[:-1])]

    if y_masks is None:
        outp = rec["y"][-1]
    else:
        # masked_select with one-hot-over-steps masks == masked sum
        # (model.py:890-898).
        outp = sum(y * m.detach() for y, m in zip(rec["y"], y_masks))
    dist = F.log_softmax(outp, dim=1)
    nll = F.nll_loss(dist, target)
    logs = dist.detach().gather(1, target.view(-1, 1))  # model.py:571-577

    zero = torch.zeros(())
    out = dict(nll=nll, loss_binary_s=zero, loss_binary_rec=zero,
               loss_binary_sen=zero, loss_bas_rec=zero, loss_bas_sen=zero)
    if cfg.use_binary:
        if not cfg.fixed_exchange:
            out["loss_binary_s"] = o_multistep_loss_binary(
                rec["stop_feat"], rec["stop_prob"], logs, rec["br"],
                binary_s_masks, cfg.entropy_s)
        if len(rec["rec_feats"][:-1]) > 0:
            out["loss_binary_rec"] = o_multistep_loss_binary(
                rec["rec_feats"][:-1], rec["rec_probs"][:-1], logs,
                rec["br"][:-1], binary_rec_masks, cfg.entropy_rec)
        out["loss_binary_sen"] = o_multistep_loss_binary(
            rec["sen_feats"], rec["sen_probs"], logs, rec["bs"],
            binary_sen_masks, cfg.entropy_sen)
        out["loss_bas_rec"] = o_multistep_loss_bas(rec["br"], logs,
                                                   bas_rec_masks)
        out["loss_bas_sen"] = o_multistep_loss_bas(rec["bs"], logs,
                                                   bas_sen_masks)

    out["loss_rec"] = out["nll"]
    if cfg.use_binary:
        out["loss_rec"] = out["loss_rec"] + out["loss_binary_rec"]
        if not cfg.fixed_exchange:
            out["loss_rec"] = out["loss_rec"] + out["loss_binary_s"]
    out["loss_sen"] = out["loss_binary_sen"]
    return out


def optax_style_clip_(parameters, max_norm=1.0):
    """In-place global-norm clip with optax's exact formula
    ``g * min(1, max_norm/||g||)`` (no +1e-6 — see module docstring)."""
    params = [p for p in parameters if p.grad is not None]
    norm = torch.sqrt(sum((p.grad.detach() ** 2).sum() for p in params))
    if float(norm) > max_norm:
        for p in params:
            p.grad.detach().mul_(max_norm / norm)


def oracle_apply_updates(losses, modules, optimizers, use_binary=True):
    """The reference's four separate backward/clip/step updates
    (model.py:1307-1330). ``modules``/``optimizers`` are dicts keyed by
    agent name. ``retain_graph`` is safe — the four losses live on
    disjoint parameter subgraphs (every cross-agent tensor is detached)."""
    plan = [("receiver", losses["loss_rec"])]
    if use_binary:
        plan += [("sender", losses["loss_sen"]),
                 ("baseline_rec", losses["loss_bas_rec"]),
                 ("baseline_sen", losses["loss_bas_sen"])]
    for name, loss in plan:
        optimizers[name].zero_grad()
        loss.backward(retain_graph=True)
        optax_style_clip_(modules[name].parameters(), 1.0)
        optimizers[name].step()


def build_torch_optimizers(cfg, modules):
    """Reference optimizer construction (model.py:1110-1137): one
    optimizer per agent at a shared learning rate."""
    import torch.optim as optim
    out = {}
    for name, m in modules.items():
        if cfg.optim_type == "SGD":
            out[name] = optim.SGD(m.parameters(), lr=cfg.learning_rate)
        elif cfg.optim_type == "Adam":
            out[name] = optim.Adam(m.parameters(), lr=cfg.learning_rate,
                                   betas=(0.9, 0.999), eps=1e-8)
        elif cfg.optim_type == "RMSprop":
            out[name] = optim.RMSprop(m.parameters(),
                                      lr=cfg.learning_rate,
                                      alpha=0.99, eps=1e-8)
        else:
            raise NotImplementedError(cfg.optim_type)
    return out
