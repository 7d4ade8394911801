"""Offline analysis of extracted binary messages (``bv.hdf5``).

Parity target: the reference's ``analyse_communication.ipynb`` (17 cells,
Python 2) — loads the ``binary_only`` extraction output, isolates each
adaptive conversation's termination row via ``StopMask == 1``, reports
per-class mean conversation length, and draws a 2-component PCA scatter of
sender vs receiver messages.

Redesigned as an importable module (so it's testable and scriptable) with
a companion notebook; run directly:

    python tools/analyse_communication.py logs/<name>.bv.hdf5 \
        [--out-dir analysis/]
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, Optional, Tuple

import h5py
import numpy as np


def load_bv(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Return the (Communication, Predictions) record arrays."""
    with h5py.File(path, "r") as f:
        return f["Communication"][:], f["Predictions"][:]


def conversation_lengths(preds: np.ndarray) -> Dict[int, float]:
    """Mean number of exchange rounds per class.

    The extraction writes a Predictions row for EVERY example at every
    batch-level step (the reference's extract loop is batch-synchronous,
    binary_vectors.py:88-135), so an example that stopped early still has
    trailing rows with ``StopMask == 0``. A conversation's true length is
    therefore the count of its ``StopMask == 1`` rows (alive entering the
    round) — the same filter the reference notebook applies before
    counting.
    """
    alive = preds["StopMask"][:, 0] == 1
    out: Dict[int, list] = {}
    uniq: Dict[Tuple[bytes, int], int] = {}
    for ex, t in zip(preds["ExampleId"][alive], preds["Target"][alive]):
        uniq[(bytes(ex), int(t))] = uniq.get((bytes(ex), int(t)), 0) + 1
    for (_, t), n in uniq.items():
        out.setdefault(t, []).append(n)
    return {t: float(np.mean(v)) for t, v in sorted(out.items())}


def final_round_messages(comm: np.ndarray, preds: np.ndarray
                         ) -> Dict[str, np.ndarray]:
    """Messages and metadata at each conversation's end.

    ``StopMask == 1`` marks rows where the conversation was still alive
    entering the round (the pre-step mask the extraction stores); the last
    such row per example is the round where the exchange effectively
    terminated — the notebook's filter of interest.
    """
    alive = preds["StopMask"][:, 0] == 1
    p = preds[alive]
    # Keep the max Index per example.
    last: Dict[bytes, int] = {}
    for row in p:
        ex = bytes(row["ExampleId"])
        last[ex] = max(last.get(ex, -1), int(row["Index"]))

    sel_s, sel_r = [], []
    for row in comm:
        ex = bytes(row["ExampleId"])
        idx = int(row["Index"])
        if ex in last and idx in (last[ex] - 1, last[ex]):
            (sel_s if row["AgentId"] == b"S" else sel_r).append(row)
    s = np.asarray(sel_s, dtype=comm.dtype)
    r = np.asarray(sel_r, dtype=comm.dtype)
    return {
        "sender_vecs": s["BinaryVec"], "sender_targets": s["Target"],
        "receiver_vecs": r["BinaryVec"], "receiver_targets": r["Target"],
    }


def pca_2d(x: np.ndarray) -> np.ndarray:
    """2-component PCA projection (sklearn, as the notebook uses)."""
    from sklearn.decomposition import PCA
    return PCA(n_components=2).fit_transform(x.astype(np.float64))


def analyse(path: str, out_dir: Optional[str] = None,
            show: bool = False) -> Dict:
    comm, preds = load_bv(path)
    lengths = conversation_lengths(preds)
    finals = final_round_messages(comm, preds)

    result = {
        "num_communication_rows": int(comm.shape[0]),
        "num_examples": len(set(bytes(e) for e in comm["ExampleId"])),
        "conversation_length_per_class": lengths,
        "mean_conversation_length": float(np.mean(list(lengths.values()))),
    }

    if out_dir is not None:
        os.makedirs(out_dir, exist_ok=True)
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        for agent, vecs_key, t_key in (
                ("sender", "sender_vecs", "sender_targets"),
                ("receiver", "receiver_vecs", "receiver_targets")):
            vecs = finals[vecs_key]
            if len(vecs) < 3:
                continue
            proj = pca_2d(vecs)
            fig, ax = plt.subplots(figsize=(6, 5))
            sc = ax.scatter(proj[:, 0], proj[:, 1],
                            c=finals[t_key], cmap="tab20", s=12)
            ax.set_title(f"PCA of final-round {agent} messages")
            fig.colorbar(sc, label="class")
            out = os.path.join(out_dir, f"pca_{agent}.png")
            fig.savefig(out, dpi=120, bbox_inches="tight")
            plt.close(fig)
            result[f"pca_{agent}_png"] = out

        fig, ax = plt.subplots(figsize=(7, 3))
        classes = list(lengths)
        ax.bar([str(c) for c in classes],
               [lengths[c] for c in classes])
        ax.set_xlabel("class")
        ax.set_ylabel("mean conversation length")
        out = os.path.join(out_dir, "conversation_lengths.png")
        fig.savefig(out, dpi=120, bbox_inches="tight")
        plt.close(fig)
        result["lengths_png"] = out

    return result


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("bv_file")
    p.add_argument("--out-dir", default=None)
    args = p.parse_args(argv)
    result = analyse(args.bv_file, args.out_dir)
    import json
    print(json.dumps(result, indent=2, default=str))


if __name__ == "__main__":
    main()
