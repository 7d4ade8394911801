"""Config/flag-system parity tests (reference model.py:1595-1810)."""

import json

import pytest

from multimodalgame_tpu.config import (FlagError, finalize_flags, make_flags,
                                       parse_args)


def test_defaults_match_reference():
    f = make_flags()
    assert f.img_feat == "avgpool_512"
    assert f.img_feat_dim == 4096
    assert f.sender_out_dim == 50
    assert f.rec_w_dim == 50
    assert f.rec_hidden == 128
    assert f.baseline_hid_dim == 500
    assert f.learning_rate == 1e-4
    assert f.optim_type == "RMSprop"
    assert f.batch_size == 32
    assert f.batch_size_dev == 50
    assert f.max_exchange == 3
    assert f.max_epoch == 500
    assert f.top_k_dev == 6
    assert f.fixed_exchange is True
    assert f.use_binary is True
    assert f.s_prob_prod is True
    assert f.wv_type == "glove.6B"
    assert f.wv_dim == 100
    assert f.log_interval == 50
    assert f.log_dev == 1000
    assert f.save_after == 1000
    assert f.save_interval == 100
    assert f.exchange_samples == 3


def test_flag_surface_complete():
    # Every reference flag name must exist.
    names = set(make_flags()._defs)
    expected = {
        "branch", "sha", "debug", "save_after", "save_interval",
        "checkpoint", "conf_mat", "log_path", "log_file", "eval_csv_file",
        "json_file", "log_load", "eval_only", "binary_only",
        "binary_output", "cuda", "env", "visdom", "use_alpha",
        "experiment_name", "log_interval", "log_dev", "wv_type", "wv_dim",
        "descr_train", "descr_dev", "train_file", "dev_file", "images",
        "glove_path", "shuffle_train", "shuffle_dev", "model_type",
        "img_feat", "data_context", "sender_mix", "img_feat_dim",
        "img_h_dim", "baseline_hid_dim", "sender_out_dim", "rec_hidden",
        "rec_out_dim", "rec_w_dim", "rec_s_dim", "use_binary",
        "ignore_receiver", "ignore_code", "block_y", "first_rec",
        "flipout_rec", "flipout_sen", "flipout_dev", "s_prob_prod",
        "visual_attn", "attn_dim", "attn_extra_context",
        "attn_context_dim", "desc_attn", "desc_attn_dim", "top_k_dev",
        "top_k_train", "optim_type", "batch_size", "batch_size_dev",
        "learning_rate", "max_epoch", "entropy_s", "entropy_sen",
        "entropy_rec", "exchange_samples", "max_exchange",
        "fixed_exchange", "bit_flip", "corrupt_region",
    }
    assert expected <= names


@pytest.mark.parametrize("preset,fixed,attn,feat", [
    ("Fixed", True, False, "avgpool_512"),
    ("Adaptive", False, False, "avgpool_512"),
    ("FixedAttention", True, True, "layer4_2"),
    ("AdaptiveAttention", False, True, "layer4_2"),
])
def test_presets(preset, fixed, attn, feat):
    f = make_flags()
    argv = ["-model_type", preset, "-experiment_name", "t"]
    parse_args(f, argv)
    finalize_flags(f, argv)
    assert f.fixed_exchange is fixed
    assert f.visual_attn is attn
    assert f.img_feat == feat
    assert f.img_feat_dim == 512
    if attn:
        assert f.attn_extra_context is True
        assert f.attn_context_dim == 1000


def test_cli_overrides_preset():
    f = make_flags()
    argv = ["-model_type", "Fixed", "-img_feat", "fc",
            "-experiment_name", "t"]
    parse_args(f, argv)
    finalize_flags(f, argv)
    assert f.img_feat == "fc"  # CLI wins over preset (model.py:1754)


def test_bool_syntaxes():
    f = make_flags()
    parse_args(f, ["-use_binary", "-noshuffle_train", "-debug", "true",
                   "-visdom=false"])
    assert f.use_binary is True
    assert f.shuffle_train is False
    assert f.debug is True
    assert f.visdom is False
    # yes/no are valid boolean values in -flag value form too (the
    # lookahead must accept everything FlagDef.parse accepts).
    f2 = make_flags()
    parse_args(f2, ["-shuffle_train", "no", "-debug", "yes"])
    assert f2.shuffle_train is False
    assert f2.debug is True


def test_negated_bool_with_value_rejected():
    """gflags rejects --noflag=value; silently parsing it would invert
    the user's negation (-nofast_driver=true used to set
    fast_driver=True)."""
    f = make_flags()
    with pytest.raises(FlagError, match="does not take a value"):
        parse_args(f, ["-nofast_driver=true"])
    with pytest.raises(FlagError, match="does not take a value"):
        parse_args(f, ["--nouse_binary=false"])


def test_derived_paths():
    f = make_flags()
    argv = ["-experiment_name", "exp1"]
    parse_args(f, argv)
    finalize_flags(f, argv)
    assert f.log_file == "./logs/exp1.log"
    assert f.checkpoint == "./logs/exp1.pt"
    assert f.conf_mat == "./logs/exp1.conf_mat.txt"
    assert f.json_file == "./logs/exp1.json"
    assert f.eval_csv_file == "./logs/exp1.eval.csv"
    assert f.binary_output == "./logs/exp1.bv.hdf5"


def test_auto_experiment_name():
    f = make_flags()
    finalize_flags(f, [])
    assert f.experiment_name.startswith("mammal-so_50-wv_100-bs_32-")


def test_log_load_roundtrip(tmp_path):
    f = make_flags()
    argv = ["-experiment_name", "orig", "-max_exchange", "7"]
    parse_args(f, argv)
    finalize_flags(f, argv)
    p = tmp_path / "flags.json"
    p.write_text(json.dumps(f.flag_values_dict()))

    f2 = make_flags()
    argv2 = ["-log_load", str(p), "-max_epoch", "3"]
    parse_args(f2, argv2)
    finalize_flags(f2, argv2)
    assert f2.max_exchange == 7        # from JSON
    assert f2.max_epoch == 3           # CLI override wins
    assert f2.experiment_name == "orig"


def test_dim_invariant():
    f = make_flags()
    parse_args(f, ["-sender_out_dim", "16"])
    with pytest.raises(ValueError, match="same dim"):
        finalize_flags(f, [])


def test_exchange_samples_exceeding_batch_rejected():
    """More dumped conversations than batch rows would die at the first
    log boundary with an opaque reshape error (reference included) —
    fail loudly at setup instead."""
    f = make_flags()
    parse_args(f, ["-batch_size", "2", "-exchange_samples", "3"])
    with pytest.raises(ValueError, match="exchange_samples"):
        finalize_flags(f, [])


def test_continuous_channel_disables_samples():
    f = make_flags()
    argv = ["-nouse_binary", "-experiment_name", "t"]
    parse_args(f, argv)
    finalize_flags(f, argv)
    assert f.exchange_samples == 0  # model.py:1759-1760


def test_errors():
    for bad in (["-nope", "1"], ["-max_exchange"], ["-images", "zzz"]):
        with pytest.raises(FlagError):
            parse_args(make_flags(), bad)


def test_help_lists_every_flag(capsys):
    """-h/--help print a listing covering the full flag surface and exit
    cleanly (the reference's gflags help surface)."""
    f = make_flags()
    with pytest.raises(SystemExit) as e:
        parse_args(f, ["--help"])
    assert e.value.code == 0
    out = capsys.readouterr().out
    for name, d in f._defs.items():
        assert f"--[no]{name}" in out or f"--{name}" in out
        assert d.help, f"flag {name} has no help text"
