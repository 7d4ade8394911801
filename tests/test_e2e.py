"""End-to-end smoke tests: the full ``run()`` driver on synthetic data
(the SURVEY §4d fixture strategy), covering train/eval/extract modes."""

import json
import os

import h5py
import numpy as np
import pytest

from multimodalgame_tpu.config import finalize_flags, make_flags, parse_args
from multimodalgame_tpu.train import run

pytestmark = pytest.mark.slow  # see pytest.ini: `-m "not slow"` is the fast subset



def _flags(paths, tmp_path, extra=()):
    f = make_flags()
    argv = [
        "-experiment_name", "e2e",
        "-model_type", "Adaptive",
        "-log_path", str(tmp_path / "logs"),
        "-batch_size", "8", "-batch_size_dev", "8",
        "-rec_w_dim", "8", "-sender_out_dim", "8",
        "-img_h_dim", "16", "-rec_hidden", "16",
        "-baseline_hid_dim", "16",
        "-max_exchange", "3",
        "-entropy_rec", "0.01", "-entropy_sen", "0.01", "-entropy_s", "0.08",
        "-max_epoch", "2",
        "-top_k_dev", "2", "-top_k_train", "2",
        "-descr_train", paths["descr"], "-descr_dev", paths["descr"],
        "-train_file", paths["train"], "-dev_file", paths["dev"],
        "-wv_dim", "16", "-glove_path", paths["glove"],
        "-log_interval", "4", "-log_dev", "6",
        "-save_after", "2", "-save_interval", "4",
        "-exchange_samples", "1",
    ] + list(extra)
    parse_args(f, argv)
    finalize_flags(f, argv)
    os.makedirs(f.log_path, exist_ok=True)
    return f


def test_train_eval_extract_cycle(synthetic_dataset, tmp_path):
    paths = synthetic_dataset
    flags = _flags(paths, tmp_path)

    result = run(flags, max_steps=8)
    assert result["step"] == 8

    # Artifacts from training.
    assert os.path.exists(flags.log_file)
    assert os.path.exists(flags.json_file)
    assert os.path.exists(flags.checkpoint)
    log = open(flags.log_file).read()
    assert "Flag Values" in log
    assert "Training Accuracy" in log
    assert "Development Accuracy" in log
    assert "Loss Receiver (S)" in log  # adaptive-only loss line
    assert "Train:" in log and "Eval:" in log  # sparkline dumps
    json.loads(open(flags.json_file).read())  # valid JSON flag dump

    # eval_only from the checkpoint (model.py:1166-1180) — the default
    # one-program device sweep and the -nofast_driver host loop must
    # produce the same numbers (eval is deterministic).
    flags2 = _flags(paths, tmp_path, extra=["-eval_only"])
    out = run(flags2)
    assert 0.0 <= out["dev_acc"] <= 1.0
    assert os.path.exists(flags2.eval_csv_file)
    header, row = open(flags2.eval_csv_file).read().strip().split("\n")
    assert header.startswith("checkpoint,eval_file,topk")
    assert os.path.exists(flags2.conf_mat)
    cm = np.loadtxt(flags2.conf_mat, delimiter=",")
    assert cm.shape == (6, 6) or cm.size > 0

    flags2h = _flags(paths, tmp_path, extra=["-eval_only",
                                             "-nofast_driver"])
    out_h = run(flags2h)
    assert out_h["dev_acc"] == pytest.approx(out["dev_acc"], abs=1e-6)
    for k in out["extra"]:
        assert out_h["extra"][k] == pytest.approx(out["extra"][k],
                                                  abs=1e-4), k

    # binary_only extraction (model.py:1181-1187).
    flags3 = _flags(paths, tmp_path, extra=["-binary_only",
                                            "-batch_size_dev", "4"])
    out = run(flags3)
    with h5py.File(out["binary_output"]) as f:
        comm = f["Communication"]
        preds = f["Predictions"]
        assert comm.shape[0] > 0
        assert preds.shape[0] * 2 == comm.shape[0]
        assert set(comm.dtype.names) == {
            "ExampleId", "AgentId", "Index", "Target", "Rank",
            "BinaryProb", "BinaryVec"}
        assert set(np.unique(comm["AgentId"])) == {b"S", b"R"}
        # Sender rows at even indices, receiver at odd
        # (binary_vectors.py:103, 119).
        s_rows = comm["AgentId"] == b"S"
        assert (comm["Index"][s_rows] % 2 == 0).all()
        assert (comm["Index"][~s_rows] % 2 == 1).all()
        assert set(preds.dtype.names) == {
            "ExampleId", "AgentId", "Index", "Target", "Rank",
            "Predictions", "StopProb", "StopVec", "StopMask"}


def test_attention_preset_e2e(synthetic_dataset, tmp_path):
    """FixedAttention preset (visual attention over layer4_2 + fc
    context, model.py:1619-1626) trains and evaluates through the full
    driver."""
    paths = synthetic_dataset
    f = make_flags()
    argv = [
        "-experiment_name", "attn", "-model_type", "FixedAttention",
        "-log_path", str(tmp_path / "logs"),
        "-batch_size", "8", "-batch_size_dev", "8",
        "-rec_w_dim", "8", "-sender_out_dim", "8",
        "-img_h_dim", "16", "-rec_hidden", "16", "-baseline_hid_dim", "16",
        "-attn_dim", "16",
        "-max_exchange", "2", "-max_epoch", "1",
        "-top_k_dev", "2", "-top_k_train", "2",
        "-descr_train", paths["descr"], "-descr_dev", paths["descr"],
        "-train_file", paths["train"], "-dev_file", paths["dev"],
        "-wv_dim", "16", "-glove_path", paths["glove"],
        "-log_interval", "100", "-log_dev", "100",
        "-save_after", "100", "-save_interval", "100",
        "-exchange_samples", "0",
    ]
    parse_args(f, argv)
    finalize_flags(f, argv)
    assert f.img_feat == "layer4_2" and f.attn_extra_context
    os.makedirs(f.log_path, exist_ok=True)
    result = run(f, max_steps=3)
    assert result["step"] == 3
    assert "Development Accuracy" in open(f.log_file).read()


def test_eval_with_channel_corruption(synthetic_dataset, tmp_path):
    """Adversarial eval-time bit flipping (-bit_flip -corrupt_region,
    model.py:636-638, 814-820) runs end-to-end and degrades or alters
    the conversation record."""
    paths = synthetic_dataset
    flags = _flags(paths, tmp_path)
    run(flags, max_steps=5)
    flags2 = _flags(paths, tmp_path,
                    extra=["-eval_only", "-bit_flip",
                           "-corrupt_region", "0:4"])
    out_corrupt = run(flags2)
    flags3 = _flags(paths, tmp_path, extra=["-eval_only"])
    out_clean = run(flags3)
    assert 0.0 <= out_corrupt["dev_acc"] <= 1.0
    # Statistics exist for both runs; the corrupted channel typically
    # changes sender-message Hamming statistics.
    assert "hamming_sen_mean" in out_corrupt["extra"]
    assert "hamming_sen_mean" in out_clean["extra"]


def test_resume_from_checkpoint(synthetic_dataset, tmp_path):
    paths = synthetic_dataset
    flags = _flags(paths, tmp_path)
    run(flags, max_steps=5)  # periodic save fires at step 4
    # Second invocation auto-resumes from flags.checkpoint
    # (model.py:1149-1156).
    flags2 = _flags(paths, tmp_path)
    run(flags2, max_steps=6)
    log = open(flags2.log_file).read()
    assert "Loading from: " + flags2.checkpoint in log
