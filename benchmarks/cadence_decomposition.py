"""Decompose the product driver's cadence-on cost (VERDICT round-4 #3).

PERFORMANCE.md records the chunked driver at ~6,250 steps/s cadence-light
but ~3,000 steps/s with full product cadences (log every 1,000 with
packed window payloads + exchange samples, dev sweep every 2,000,
periodic checkpoints every 2,000) — a 2x gap on the configuration users
actually run, measured once in round 3 and never decomposed. This
harness measures each cadence's marginal cost through the REAL driver
(``train.run`` with ``-fast_driver``), not a proxy loop:

  off      — all cadences pushed past the horizon (pure chunked stream)
  log      — log windows every 1,000 (full-metrics boundary step,
             deferred payload fetch, 3 exchange samples, sparklines)
  log_dev  — + dev sweep every 2,000 (device sweep, deferred fetch)
  full     — + periodic checkpoint every 2,000 (device snapshot,
             deferred fetch + msgpack write)

Method (PERFORMANCE.md): marginal cost — each variant times a short and
a long run in the same process (same compiled programs, same constant
startup: staging, GloVe embed, init, final fetch) and divides the step
delta by the time delta, so only steady-state cost remains. Variants
run round-robin across trials so tunnel drift (CLAUDE.md: per-dispatch
cost drifts by hours-long epochs) decorrelates from the variant axis;
the summary reports per-variant medians and the derived per-event
milliseconds.

Run: python benchmarks/cadence_decomposition.py [trials] [long_epochs]
Prints one JSON line. ``long_epochs`` scales the long run (default
E2 = 2295); raise it when the off-variant delta shrinks below ~15 s —
at 12k+ steps/s the default's ~8 s delta sits inside the tunnel's
±2 s per-run stall noise and single trials can go negative.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

BATCH = 64
STEPS_PER_EPOCH = 3000 // BATCH          # 46 (30 classes x 100)
# The long/short spread must dwarf per-RUN wall variance, not just
# cancel its mean: a first cut at 45/223 epochs (8k-step delta, ~1-2 s)
# produced NEGATIVE marginal rates — tunnel stalls are +-2 s per run.
# 2,295 epochs puts ~100k steps (~16-35 s) in the delta.
E1, E2 = 45, 2295                        # 2,070 / 105,570 steps
L, D, S = 1000, 2000, 2000               # the canonical product cadences

VARIANTS = {
    "off": {"-log_interval": 10**9, "-log_dev": 10**9,
            "-save_interval": 10**9},
    "log": {"-log_interval": L, "-log_dev": 10**9,
            "-save_interval": 10**9},
    "log_dev": {"-log_interval": L, "-log_dev": D,
                "-save_interval": 10**9},
    "full": {"-log_interval": L, "-log_dev": D, "-save_interval": S},
}


def build_data(root: str) -> dict:
    from multimodalgame_tpu.data.synthetic import build_synthetic_dataset
    return build_synthetic_dataset(root, num_classes=30,
                                   train_per_class=100, dev_per_class=20,
                                   wv_dim=100)


def run_once(paths: dict, variant: dict, max_epoch: int,
             workdir: str) -> tuple:
    """One full product run; returns (steps, wall seconds). A fresh
    log_path per call — a leftover checkpoint would auto-resume."""
    from multimodalgame_tpu.config import (finalize_flags, make_flags,
                                           parse_args)
    from multimodalgame_tpu.train import run

    os.makedirs(workdir, exist_ok=True)
    argv = [
        "-experiment_name", "cad", "-model_type", "Adaptive",
        "-log_path", workdir,
        "-max_exchange", "10", "-batch_size", "64",
        "-batch_size_dev", "100",
        "-rec_w_dim", "32", "-sender_out_dim", "32", "-img_h_dim", "256",
        "-rec_hidden", "64", "-learning_rate", "1e-4",
        "-entropy_rec", "0.01", "-entropy_sen", "0.01",
        "-entropy_s", "0.08", "-use_binary",
        "-top_k_dev", "6", "-top_k_train", "6",
        "-descr_train", paths["descr"], "-descr_dev", paths["descr"],
        "-train_file", paths["train"], "-dev_file", paths["dev"],
        "-wv_dim", "100", "-glove_path", paths["glove"],
        "-exchange_samples", "3", "-save_after", "1",
        "-max_epoch", str(max_epoch),
    ]
    for flag, val in variant.items():
        argv += [flag, str(val)]
    flags = make_flags()
    parse_args(flags, argv)
    finalize_flags(flags, argv)
    t0 = time.perf_counter()
    result = run(flags)
    dt = time.perf_counter() - t0
    return result["step"], dt


def main() -> None:
    global E2
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    if len(sys.argv) > 2:
        E2 = int(sys.argv[2])
    root = tempfile.mkdtemp(prefix="mmg_cadence_")
    paths = build_data(root)

    # Warmup: compile every program each variant uses (chunk sizes,
    # boundary step, eval exchange, dev sweep, snapshot). E1 epochs, not
    # fewer: the driver's exact-remainder planner only admits a window
    # remainder length once it RECURS (game/driver.py), so a warmup with
    # a single log window would leave the exact-487 program uncompiled
    # and the first measured run would pay it mid-measurement.
    for name, variant in VARIANTS.items():
        run_once(paths, variant, E1, os.path.join(root, f"warm_{name}"))

    rates = {name: [] for name in VARIANTS}
    for trial in range(trials):
        for name, variant in VARIANTS.items():
            s1, t1 = run_once(paths, variant, E1,
                              os.path.join(root, f"{name}_{trial}_a"))
            s2, t2 = run_once(paths, variant, E2,
                              os.path.join(root, f"{name}_{trial}_b"))
            rates[name].append((s2 - s1) / (t2 - t1))
            # Bound disk: each full-variant run leaves checkpoints.
            for suffix in ("_a", "_b"):
                shutil.rmtree(os.path.join(root, f"{name}_{trial}{suffix}"),
                              ignore_errors=True)

    med = {name: float(np.median(v)) for name, v in rates.items()}
    d_steps = (E2 - E1) * STEPS_PER_EPOCH

    def per_event_ms(slow: str, fast: str, every: int) -> float:
        """Extra milliseconds per cadence event of `slow` over `fast`."""
        dt = d_steps / med[slow] - d_steps / med[fast]
        return 1000.0 * dt / (d_steps / every)

    print(json.dumps({
        "steps_per_sec": {k: round(v, 1) for k, v in med.items()},
        "trials": {k: [round(x, 1) for x in v] for k, v in rates.items()},
        "per_event_ms": {
            "log_window": round(per_event_ms("log", "off", L), 2),
            "dev_sweep": round(per_event_ms("log_dev", "log", D), 2),
            "checkpoint": round(per_event_ms("full", "log_dev", S), 2),
        },
        "cadence_on_fraction_of_off": round(med["full"] / med["off"], 3),
    }))


if __name__ == "__main__":
    main()
