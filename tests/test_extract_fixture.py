"""Pin the extraction surface against the *reference's* bv.hdf5 artifact
(VERDICT round-3 #3), not just our own schema.

The reference writer is Python 2 (binary_vectors.py) and cannot run
here, so ``_write_reference_bv`` hand-authors a tiny file that is
byte-layout-compatible with what that code produces — same compound
dtypes (py2 ``np.str_`` fields land on disk as fixed-width ``S50``/``S1``
bytes), same dataset names, same batch-synchronous row grouping
(binary_vectors.py:24-46, 88-135) — with every value, including the
quirky ``np.abs(argsort - nclasses)`` "Rank", computed BY HAND from
reading binary_vectors.py:93-99. Tests then check (a) our analysis tool
consumes the reference-laid-out file, (b) our extract.py output matches
it dtype-for-dtype and structure-for-structure, and (c) the rank formula
against the hand-computed golden."""

import os

import h5py
import jax
import numpy as np
import pytest

from multimodalgame_tpu.config import finalize_flags, make_flags, parse_args
from multimodalgame_tpu.extract import extract_binary, reference_rank

# --- Hand-authored conversation record -------------------------------
# 2 examples of class 2 (one batch — the reference asserts one target
# per batch), nclasses=6, sender_out_dim=8, T=2 adaptive exchanges.
# Example img_0 stops after round 0 (StopMask 1 then 0); img_1 stays
# alive both rounds (1, 1).
NCLASSES = 6
SOD = 8
TARGET = 2
EX_IDS = [b"img_0.jpg", b"img_1.jpg"]

# Per-round receiver prediction scores, chosen tie-free so argsort is
# unambiguous, and the resulting "Rank" hand-derived:
#   round 0, img_0: scores [.05,.30,.20,.11,.25,.13]
#     ascending order of indices: [0,3,5,2,4,1]; abs(.-6)=[6,3,1,4,2,5];
#     column TARGET=2 -> Rank 1
#   round 0, img_1: scores [.30,.05,.50,.10,.02,.01]
#     argsort [5,4,1,3,0,2]; abs(.-6)=[1,2,5,3,6,4]; col 2 -> Rank 5
# Round 1 swaps the two score rows, so the ranks swap: (5, 1).
PREDS_R0 = np.array([[0.05, 0.30, 0.20, 0.11, 0.25, 0.13],
                     [0.30, 0.05, 0.50, 0.10, 0.02, 0.01]], np.float32)
PREDS_R1 = PREDS_R0[::-1].copy()
RANK_R0 = np.array([1, 5], np.int32)   # hand-computed above
RANK_R1 = np.array([5, 1], np.int32)
STOP_MASK = {0: np.array([1.0, 1.0], np.float32),   # alive entering r0
             1: np.array([0.0, 1.0], np.float32)}   # img_0 stopped


def _comm_dtype(sender_out_dim):
    # Exactly binary_vectors.py:24-31 as py2 lays it out on disk.
    return np.dtype([("ExampleId", "S50"), ("AgentId", "S1"),
                     ("Index", "i"), ("Target", "i"), ("Rank", "i"),
                     ("BinaryProb", np.float32, (sender_out_dim,)),
                     ("BinaryVec", np.float32, (sender_out_dim,))])


def _preds_dtype(nclasses):
    # Exactly binary_vectors.py:35-45.
    return np.dtype([("ExampleId", "S50"), ("AgentId", "S1"),
                     ("Index", "i"), ("Target", "i"), ("Rank", "i"),
                     ("Predictions", np.float32, (nclasses,)),
                     ("StopProb", np.float32, (1,)),
                     ("StopVec", np.float32, (1,)),
                     ("StopMask", np.float32, (1,))])


def _write_reference_bv(path):
    """The reference writer's exact output for the conversation above:
    resizable (0,)-shaped datasets grown batch-by-batch, S rows (Index
    2t) appended before R rows (Index 2t+1) within each exchange, one
    Predictions row per example per exchange (binary_vectors.py:88-135)."""
    rng = np.random.RandomState(7)
    f = h5py.File(path, "w")
    comm = f.create_dataset("Communication", (0,), maxshape=(None,),
                            dtype=_comm_dtype(SOD))
    preds = f.create_dataset("Predictions", (0,), maxshape=(None,),
                             dtype=_preds_dtype(NCLASSES))

    def append(ds, rows):
        rows = list(rows)
        ds.resize(ds.shape[0] + len(rows), axis=0)
        ds[-len(rows):] = rows

    for t, (p, rank) in enumerate([(PREDS_R0, RANK_R0),
                                   (PREDS_R1, RANK_R1)]):
        probs = rng.rand(2, SOD).astype(np.float32)
        vecs = (probs > 0.5).astype(np.float32)
        targ = np.full(2, TARGET, np.int32)
        append(comm, zip(EX_IDS, [b"S"] * 2, [2 * t] * 2, targ, rank,
                         probs, vecs))
        rprobs = rng.rand(2, SOD).astype(np.float32)
        rvecs = (rprobs > 0.5).astype(np.float32)
        append(comm, zip(EX_IDS, [b"R"] * 2, [2 * t + 1] * 2, targ, rank,
                         rprobs, rvecs))
        sprob = rng.rand(2, 1).astype(np.float32)
        append(preds, zip(EX_IDS, [b"R"] * 2, [2 * t + 1] * 2, targ, rank,
                          p, sprob, (sprob > 0.5).astype(np.float32),
                          STOP_MASK[t][:, None]))
    f.close()
    return path


def test_reference_rank_hand_golden():
    """binary_vectors.py:99 against values derived by hand (see the
    module docstring's worked argsort traces). Note the quirk this pins:
    argsort(1)[:, t] is the index of the t-th *smallest* score, not the
    rank of class t."""
    np.testing.assert_array_equal(reference_rank(PREDS_R0, TARGET),
                                  [1, 5])
    np.testing.assert_array_equal(reference_rank(PREDS_R1, TARGET),
                                  [5, 1])
    # A one-row sanity case, fully traced: scores [.1,.4,.2,.3],
    # argsort [0,2,3,1], abs(.-4)=[4,2,1,3], target 1 -> 2.
    np.testing.assert_array_equal(
        reference_rank(np.array([[0.1, 0.4, 0.2, 0.3]]), 1), [2])


def test_analysis_consumes_reference_file(tmp_path):
    """tools/analyse_communication.py reads a file laid out by the
    *reference's* writer (not our own output) and reproduces the
    hand-computed statistics."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from analyse_communication import (conversation_lengths,
                                       final_round_messages, load_bv)

    path = _write_reference_bv(str(tmp_path / "ref_bv.hdf5"))
    comm, preds = load_bv(path)
    assert comm.shape[0] == 8 and preds.shape[0] == 4

    # img_0 was alive entering 1 round, img_1 entering 2 -> mean 1.5.
    lengths = conversation_lengths(preds)
    assert lengths == {TARGET: 1.5}

    # Final-round selection: img_0 terminated at Index 1 (its only alive
    # round), img_1 at Index 3 -> one sender message from round 0 and
    # one from round 1.
    finals = final_round_messages(comm, preds)
    assert finals["sender_vecs"].shape == (2, SOD)
    assert finals["receiver_vecs"].shape == (2, SOD)
    assert set(finals["sender_targets"]) == {TARGET}


def test_extract_output_matches_reference_layout(synthetic_dataset,
                                                 tmp_path):
    """extract.py's output against the reference-written fixture:
    identical dtypes (field names, order, offsets, byte layout) for both
    datasets, the same S-before-R row grouping per exchange, and Rank
    values self-consistent with the stored Predictions under the
    reference formula."""
    from multimodalgame_tpu.data.descriptions import load_descriptions
    from multimodalgame_tpu.game.agents import AgentModules, init_params
    from multimodalgame_tpu.game.config import GameConfig
    from multimodalgame_tpu.game.train import make_eval_exchange

    paths = synthetic_dataset
    f = make_flags()
    argv = [
        "-experiment_name", "refbv", "-model_type", "Adaptive",
        "-log_path", str(tmp_path / "logs"),
        "-batch_size", "8", "-batch_size_dev", "4",
        "-rec_w_dim", "8", "-sender_out_dim", "8",
        "-img_h_dim", "16", "-rec_hidden", "16", "-baseline_hid_dim", "16",
        "-max_exchange", "3",
        "-descr_train", paths["descr"], "-descr_dev", paths["descr"],
        "-train_file", paths["train"], "-dev_file", paths["dev"],
        "-wv_dim", "16", "-glove_path", paths["glove"],
    ]
    parse_args(f, argv)
    finalize_flags(f, argv)
    os.makedirs(f.log_path, exist_ok=True)

    cfg = GameConfig.from_flags(f)
    mods = AgentModules(cfg)
    pack = load_descriptions(paths["descr"], "fake", 16)
    params = init_params(mods, jax.random.PRNGKey(0),
                         num_classes=pack.num_classes)
    out = extract_binary(f, mods, params, make_eval_exchange(mods),
                         paths["dev"], 4, 0, False, pack)

    ref = _write_reference_bv(str(tmp_path / "ref_bv.hdf5"))
    with h5py.File(out) as fo, h5py.File(ref) as fr:
        assert set(fo) == set(fr) == {"Communication", "Predictions"}
        for name in ("Communication", "Predictions"):
            do, dr = fo[name].dtype, fr[name].dtype
            assert do == dr, name
            assert do.descr == dr.descr, name          # field-for-field
            assert do.itemsize == dr.itemsize, name    # byte layout
        comm = fo["Communication"][:]
        preds = fo["Predictions"][:]

    # Reference row grouping: within each (batch, exchange) block, a run
    # of S rows at Index 2t precedes the run of R rows at Index 2t+1.
    bsz = 4
    assert comm.shape[0] % (2 * bsz) == 0
    for blk in comm.reshape(-1, 2 * bsz):
        assert (blk["AgentId"][:bsz] == b"S").all()
        assert (blk["AgentId"][bsz:] == b"R").all()
        assert (blk["Index"][:bsz] % 2 == 0).all()
        assert (blk["Index"][bsz:] == blk["Index"][0] + 1).all()

    # Stored Rank is the reference formula applied to the stored
    # Predictions at the same exchange.
    for row in preds:
        expect = reference_rank(row["Predictions"][None, :],
                                int(row["Target"]))[0]
        assert row["Rank"] == expect

    # Non-degenerate record: adaptive exchanges produced >= 1 round per
    # batch and the ranks span more than one value across the dev set.
    assert preds.shape[0] * 2 == comm.shape[0]
    assert preds.shape[0] >= 6  # 6 single-class batches x >=1 round


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
