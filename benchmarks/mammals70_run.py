"""70-class mammals game at canonical scale (the reference's
``descriptions_mammals.csv`` variant, SURVEY §2#21).

Uses the REAL 70-class mammal description file shipped in
``data/descriptions_mammals.csv`` (real tokenized/deduped/stopword-
stripped word lists through the text pipeline) with deterministic fake
word vectors (``-wv_type fake`` — no GloVe download needed) and synthetic
class-conditional image features, trained with the Adaptive preset at the
canonical README configuration through the product CLI driver.

Chance top-6 is 6/70 ≈ 0.086.

Usage: python benchmarks/mammals70_run.py [workdir] [--steps N]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
# Persistent compile cache: opt-in only (utils/compile_cache.py).


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("workdir", nargs="?", default="/tmp/mmg_mammals")
    p.add_argument("--steps", type=int, default=6000)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log-dev", type=int, default=250)
    args = p.parse_args()

    import jax

    from multimodalgame_tpu.utils import compile_cache
    compile_cache.configure(jax, _REPO)

    from multimodalgame_tpu.config import (finalize_flags, make_flags,
                                           parse_args)
    from multimodalgame_tpu.data.synthetic import write_feature_hdf5
    from multimodalgame_tpu.train import run

    os.makedirs(args.workdir, exist_ok=True)
    descr = os.path.join(args.workdir, "descriptions_mammals.csv")
    shutil.copy(os.path.join(_REPO, "data", "descriptions_mammals.csv"),
                descr)
    train = os.path.join(args.workdir, "train.hdf5")
    dev = os.path.join(args.workdir, "dev.hdf5")
    # Guard on a completion marker written AFTER both files: existence
    # checks alone can't catch a timeout-truncated writer (h5py creates
    # the file at open, so a run killed mid-second-write leaves both
    # present, one corrupt — the CLAUDE.md hazard).
    marker = os.path.join(args.workdir, ".dataset_complete")
    if not os.path.exists(marker):
        write_feature_hdf5(train, 70 * 100, 70, seed=2,
                           single_class_blocks=True)
        write_feature_hdf5(dev, 70 * 20, 70, seed=3,
                           single_class_blocks=True)
        with open(marker, "w") as mf:
            mf.write("ok\n")

    tag = "mammals70_seed{}".format(args.seed)
    logdir = os.path.join(args.workdir, "logs_" + tag)
    os.makedirs(logdir, exist_ok=True)

    f = make_flags()
    argv = [
        "-experiment_name", tag, "-model_type", "Adaptive",
        "-log_path", logdir,
        "-max_exchange", "10",
        "-batch_size", "64", "-batch_size_dev", "140",
        "-rec_w_dim", "32", "-sender_out_dim", "32",
        "-img_h_dim", "256", "-rec_hidden", "64",
        "-learning_rate", str(args.lr),
        "-entropy_rec", "0.01", "-entropy_sen", "0.01",
        "-entropy_s", "0.08",
        "-use_binary", "-max_epoch", "100000",
        "-top_k_dev", "6", "-top_k_train", "6",
        "-descr_train", descr, "-descr_dev", descr,
        "-train_file", train, "-dev_file", dev,
        "-wv_type", "fake", "-wv_dim", "100",
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
        "num_classes": 70, "chance_top6": round(6 / 70, 4),
        "best_dev_top6": best,
        "final_dev_top6": curve[-1][1] if curve else 0,
        "dev_curve": curve, "conv_len_curve": conv,
    }
    os.makedirs(os.path.join(args.workdir, "curves"), exist_ok=True)
    with open(os.path.join(args.workdir, "curves", tag + ".json"),
              "w") as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps({k: summary[k] for k in
                      ("tag", "steps", "wall_s", "chance_top6",
                       "best_dev_top6", "final_dev_top6")}))


if __name__ == "__main__":
    main()
