"""AdaptiveAttention convergence driver (VERDICT round-1 item #4).

Trains the paper's hardest preset — adaptive conversation length with
Xu-style visual attention over layer4_2 plus fc context
(reference model.py:1629-1636) — at the canonical README configuration
(T=10, batch 64, 32-bit messages, 256/64 hidden, RMSprop 1e-4) on the
synthetic 30-class dataset, through the product CLI driver, and records
the dev-accuracy curve.

Usage:
  python benchmarks/adaptive_attention_run.py [workdir] [--steps N]
      [--lr LR] [--entropy-s E] [--entropy-sen E] [--entropy-rec E]
      [--seed S] [--tag NAME]

Writes ``<workdir>/curves/<tag>.json`` with the full dev trajectory and
prints a one-line summary.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
# Persistent compile cache: opt-in only (utils/compile_cache.py).


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("workdir", nargs="?", default="/tmp/mmg_aa")
    p.add_argument("--steps", type=int, default=4000)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--entropy-s", type=float, default=0.08)
    p.add_argument("--entropy-sen", type=float, default=0.01)
    p.add_argument("--entropy-rec", type=float, default=0.01)
    p.add_argument("--max-exchange", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log-dev", type=int, default=250)
    p.add_argument("--tag", default=None)
    args = p.parse_args()

    import jax

    from multimodalgame_tpu.utils import compile_cache
    compile_cache.configure(jax, _REPO)

    from multimodalgame_tpu.config import (finalize_flags, make_flags,
                                           parse_args)
    from multimodalgame_tpu.data.synthetic import build_synthetic_dataset
    from multimodalgame_tpu.train import run

    os.makedirs(args.workdir, exist_ok=True)
    # Guard on a completion marker written AFTER the build: existence
    # checks alone can't catch a timeout-truncated writer (h5py creates
    # each file at open, so a run killed during the last write leaves
    # all four present, one corrupt — the CLAUDE.md hazard).
    marker = os.path.join(args.workdir, ".dataset_complete")
    if not os.path.exists(marker):
        build_synthetic_dataset(args.workdir, num_classes=30,
                                train_per_class=100, dev_per_class=20,
                                wv_dim=100)
        with open(marker, "w") as mf:
            mf.write("ok\n")

    tag = args.tag or "aa_lr{}_es{}_seed{}".format(
        args.lr, args.entropy_s, args.seed)
    logdir = os.path.join(args.workdir, "logs_" + tag)
    os.makedirs(logdir, exist_ok=True)

    f = make_flags()
    argv = [
        "-experiment_name", tag, "-model_type", "AdaptiveAttention",
        "-log_path", logdir,
        "-max_exchange", str(args.max_exchange),
        "-batch_size", "64", "-batch_size_dev", "100",
        "-rec_w_dim", "32", "-sender_out_dim", "32",
        "-img_h_dim", "256", "-rec_hidden", "64",
        "-learning_rate", str(args.lr),
        "-entropy_rec", str(args.entropy_rec),
        "-entropy_sen", str(args.entropy_sen),
        "-entropy_s", str(args.entropy_s),
        "-use_binary", "-max_epoch", "100000",
        "-top_k_dev", "6", "-top_k_train", "6",
        "-descr_train", os.path.join(args.workdir, "descriptions.csv"),
        "-descr_dev", os.path.join(args.workdir, "descriptions.csv"),
        "-train_file", os.path.join(args.workdir, "train.hdf5"),
        "-dev_file", os.path.join(args.workdir, "dev.hdf5"),
        "-wv_dim", "100",
        "-glove_path", os.path.join(args.workdir, "glove.txt"),
        "-log_interval", "100", "-log_dev", str(args.log_dev),
        "-save_after", "500", "-save_interval", "1000",
        "-exchange_samples", "0", "-random_seed", str(args.seed),
    ]
    parse_args(f, argv)
    finalize_flags(f, argv)

    t0 = time.perf_counter()
    out = run(f, max_steps=args.steps)
    wall = time.perf_counter() - t0

    curve = out["metrics"].get("Development Accuracy", [])
    conv = out["metrics"].get("Conversation Length (avg)", [])
    best = max((v for _, v in curve), default=0.0)
    summary = {
        "tag": tag, "steps": out["step"], "wall_s": round(wall, 1),
        "best_dev_top6": best, "final_dev_top6": curve[-1][1] if curve else 0,
        "lr": args.lr, "entropy_s": args.entropy_s,
        "entropy_sen": args.entropy_sen, "entropy_rec": args.entropy_rec,
        "max_exchange": args.max_exchange, "seed": args.seed,
        "dev_curve": curve, "conv_len_curve": conv,
    }
    os.makedirs(os.path.join(args.workdir, "curves"), exist_ok=True)
    with open(os.path.join(args.workdir, "curves", tag + ".json"),
              "w") as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps({k: summary[k] for k in
                      ("tag", "steps", "wall_s", "best_dev_top6",
                       "final_dev_top6")}))


if __name__ == "__main__":
    main()
