"""A/B the enqueue-time device->host prefetch of deferred-event payloads
(game/driver.py ``prefetch_host_async``) at the full product cadence.

Protocol per CLAUDE.md / PERFORMANCE.md: both arms interleave in ONE
process in BOTH orders (pref,nopref / nopref,pref alternating per trial)
through the REAL driver at the canonical full-cadence config, marginal
cost over a short/long epoch pair, medians reported. The toggle is the
driver's ``MMG_NO_PREFETCH`` env knob, read per ``run_fast`` call, so
compiled programs are shared by both arms.

Run: python benchmarks/prefetch_ab.py [trials]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from benchmarks.cadence_decomposition import (E1, E2, STEPS_PER_EPOCH,  # noqa: E402
                                              VARIANTS, build_data,
                                              run_once)


def main() -> None:
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    root = tempfile.mkdtemp(prefix="mmg_prefab_")
    paths = build_data(root)
    full = VARIANTS["full"]

    arms = {"pref": "0", "nopref": "1"}
    rates = {name: [] for name in arms}

    def measure(name, tag):
        os.environ["MMG_NO_PREFETCH"] = arms[name]
        try:
            s1, t1 = run_once(paths, full, E1,
                              os.path.join(root, f"{name}_{tag}_a"))
            s2, t2 = run_once(paths, full, E2,
                              os.path.join(root, f"{name}_{tag}_b"))
        finally:
            os.environ.pop("MMG_NO_PREFETCH", None)
        rates[name].append((s2 - s1) / (t2 - t1))
        for suffix in ("_a", "_b"):
            shutil.rmtree(os.path.join(root, f"{name}_{tag}{suffix}"),
                          ignore_errors=True)

    for name in arms:   # warmup: compile everything incl. the recurring
        run_once(paths, full, E1, os.path.join(root, f"warm_{name}"))
        # exact-remainder program (see cadence_decomposition warmup note)
    for trial in range(trials):
        order = (("pref", "nopref") if trial % 2 == 0
                 else ("nopref", "pref"))
        for name in order:
            measure(name, trial)

    med = {name: float(np.median(v)) for name, v in rates.items()}
    print(json.dumps({
        "steps_per_sec": {k: round(v, 1) for k, v in med.items()},
        "trials": {k: [round(x, 1) for x in v] for k, v in rates.items()},
        "pref_over_nopref": round(med["pref"] / med["nopref"], 3),
    }))


if __name__ == "__main__":
    main()
