"""CPU baseline measurement: the reference's computational pattern in
eager PyTorch.

The upstream repo publishes no benchmark numbers (BASELINE.md), and its
Python-2 / torch-0.x code cannot run in this environment, so the baseline
is *established by measurement* from a fresh eager-torch harness that
reproduces the reference's per-step work profile on the canonical config
(README.md:30-53: batch 64, 32-bit messages, sender hidden 256, receiver
hidden 64, max_exchange 10, 30 classes):

* a Python exchange loop with per-step host numpy Bernoulli sampling
  round-trips (the reference's model.py:225-227, 418-420, 458-460);
* the cartesian ``B*D x (hid+wv)`` prediction input build
  (model.py:519-551);
* per-step REINFORCE + baseline losses and FOUR separate
  backward/clip/step updates per batch (model.py:1307-1330);
* adaptive break_early on the sampled stop bits (model.py:866-867).

This file is a benchmark harness only — it is not part of the framework.

Usage: ``python benchmarks/torch_reference_bench.py [num_steps]`` prints a
JSON line with measured steps/sec and writes ``BASELINE_MEASURED.json``.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

B, D, FEAT, H_IMG, HID, W, WV, BAS, T = 64, 30, 512, 256, 64, 32, 100, 500, 10
LR = 1e-4


class EagerSender(nn.Module):
    def __init__(self):
        super().__init__()
        self.image = nn.Linear(FEAT, H_IMG)
        self.code = nn.Linear(W, H_IMG)
        self.out = nn.Linear(H_IMG, W)
        self.code_bias = nn.Parameter(torch.randn(W))

    def forward(self, x, w, t):
        h_x = self.image(x)
        if t == 0:
            h_w = self.code(torch.sigmoid(self.code_bias)[None]).expand_as(h_x)
        else:
            h_w = self.code(w)
        return self.out(torch.tanh(h_x + h_w)), h_x


class EagerReceiver(nn.Module):
    def __init__(self):
        super().__init__()
        self.rnn = nn.GRUCell(W, HID)
        self.y1 = nn.Linear(HID + WV, HID)
        self.y2 = nn.Linear(HID, 1)
        self.w_h = nn.Linear(HID, HID)
        self.w_d = nn.Linear(WV, HID, bias=False)
        self.w = nn.Linear(HID, W)
        self.s = nn.Linear(HID, 1)

    def forward(self, z, h, desc):
        h = self.rnn(z, h)
        # Cartesian product input, as the reference builds it.
        hz_rep = h.repeat_interleave(D, dim=0)
        desc_rep = desc.repeat(B, 1)
        y = self.y2(F.relu(self.y1(torch.cat([hz_rep, desc_rep], 1))))
        y = y.view(B, D)
        wd = torch.softmax(y, -1).detach() @ desc
        w_logits = self.w(torch.tanh(self.w_h(h) + self.w_d(wd)))
        return h, self.s(h), y, w_logits


class EagerBaseline(nn.Module):
    def __init__(self, in_dim):
        super().__init__()
        self.l1 = nn.Linear(in_dim, BAS)
        self.l2 = nn.Linear(BAS, 1)

    def forward(self, *xs):
        return self.l2(F.relu(self.l1(torch.cat(xs, 1))))


def host_sample(probs: torch.Tensor) -> torch.Tensor:
    """The reference's host round-trip sampling."""
    p = probs.detach().cpu().numpy()
    return torch.from_numpy(
        (np.random.rand(*p.shape) < p).astype("float32"))


def reinforce(feats, probs, advantage):
    lp = (feats * torch.log(probs + 1e-8)
          + (1 - feats) * torch.log(1 - probs + 1e-8)).sum(1)
    return (-advantage.detach() * lp).mean()


def run_steps(n_steps: int) -> float:
    torch.manual_seed(0)
    np.random.seed(0)
    torch.set_num_threads(os.cpu_count() or 1)

    sender, receiver = EagerSender(), EagerReceiver()
    bas_s = EagerBaseline(H_IMG + W)
    bas_r = EagerBaseline(W + HID)
    opts = [torch.optim.RMSprop(m.parameters(), lr=LR, alpha=0.99)
            for m in (sender, receiver, bas_s, bas_r)]

    rng = np.random.RandomState(0)
    data = torch.from_numpy(rng.randn(B, FEAT).astype("float32"))
    desc = torch.from_numpy(rng.randn(D, WV).astype("float32"))
    target = torch.from_numpy(rng.randint(0, D, size=B))

    t0 = None
    for it in range(n_steps + 1):
        if it == 1:
            t0 = time.perf_counter()  # skip first-step warmup

        h = torch.zeros(B, HID)
        w_msg = torch.zeros(B, W)
        mask = torch.ones(B, 1)
        rec = {"s": [], "sp": [], "z": [], "zp": [], "w": [], "wp": [],
               "y": [], "bs": [], "br": [], "m": [mask]}
        for t in range(T):
            z_logits, h_x = sender(data, w_msg.detach(), t)
            z_probs = torch.sigmoid(z_logits)
            z = host_sample(z_probs)
            h, s_logits, y, w_logits = receiver(z.detach(), h, desc)
            s_probs = torch.sigmoid(s_logits)
            s = host_sample(s_probs)
            w_probs = torch.sigmoid(w_logits)
            w_msg = host_sample(w_probs)
            rec["bs"].append(bas_s(h_x.detach(), w_msg.detach()))
            rec["br"].append(bas_r(z.detach(), h.detach()))
            for k, v in (("s", s), ("sp", s_probs), ("z", z),
                         ("zp", z_probs), ("w", w_msg), ("wp", w_probs),
                         ("y", y)):
                rec[k].append(v)
            mask = torch.min(mask, s)
            rec["m"].append(mask)
            if mask.sum().item() == 0:  # break_early
                break

        n = len(rec["y"])
        dist = F.log_softmax(rec["y"][-1], dim=-1)
        nll = F.nll_loss(dist, target)
        reward = dist.gather(1, target[:, None]).detach()

        loss_rec = nll
        loss_sen = torch.zeros(())
        loss_bas_s = torch.zeros(())
        loss_bas_r = torch.zeros(())
        for t in range(n):
            adv_s = (reward - rec["bs"][t].detach())[:, 0]
            adv_r = (reward - rec["br"][t].detach())[:, 0]
            loss_sen = loss_sen + reinforce(rec["z"][t], rec["zp"][t], adv_s)
            loss_rec = loss_rec + reinforce(rec["w"][t], rec["wp"][t], adv_r)
            loss_rec = loss_rec + reinforce(rec["s"][t], rec["sp"][t], adv_r)
            loss_bas_s = loss_bas_s + F.mse_loss(rec["bs"][t], reward)
            loss_bas_r = loss_bas_r + F.mse_loss(rec["br"][t], reward)

        # Four separate backward/clip/step updates.
        for loss, model, opt in ((loss_rec, receiver, opts[1]),
                                 (loss_sen, sender, opts[0]),
                                 (loss_bas_r, bas_r, opts[3]),
                                 (loss_bas_s, bas_s, opts[2])):
            opt.zero_grad()
            loss.backward()
            nn.utils.clip_grad_norm_(model.parameters(), 1.0)
            opt.step()

    elapsed = time.perf_counter() - t0
    return n_steps / elapsed


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    sps = run_steps(n)
    result = {
        "metric": "reference_cpu_train_steps_per_sec",
        "value": sps,
        "unit": "steps/s",
        "config": {"batch": B, "classes": D, "msg_dim": W,
                   "max_exchange": T, "img_h_dim": H_IMG,
                   "rec_hidden": HID},
    }
    print(json.dumps(result))
    out = os.path.join(os.path.dirname(__file__), "..",
                       "BASELINE_MEASURED.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
