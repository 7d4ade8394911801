"""Serving API: checkpoint-backed batch prediction."""

import os

import numpy as np

from multimodalgame_tpu.config import finalize_flags, make_flags, parse_args
from multimodalgame_tpu.data.descriptions import load_descriptions
from multimodalgame_tpu.serve import Predictor
from multimodalgame_tpu.train import run


def test_predictor_from_trained_checkpoint(synthetic_dataset, tmp_path):
    paths = synthetic_dataset
    argv = ["-experiment_name", "srv", "-model_type", "Adaptive",
            "-log_path", str(tmp_path / "logs"),
            "-batch_size", "8", "-batch_size_dev", "8",
            "-rec_w_dim", "8", "-sender_out_dim", "8",
            "-img_h_dim", "16", "-rec_hidden", "16",
            "-baseline_hid_dim", "16", "-max_exchange", "3",
            "-descr_train", paths["descr"], "-descr_dev", paths["descr"],
            "-train_file", paths["train"], "-dev_file", paths["dev"],
            "-wv_dim", "16", "-glove_path", paths["glove"],
            "-log_interval", "100", "-log_dev", "100",
            "-save_after", "1", "-save_interval", "2",
            "-exchange_samples", "0"]
    flags = make_flags()
    parse_args(flags, argv)
    finalize_flags(flags, argv)
    os.makedirs(flags.log_path, exist_ok=True)
    run(flags, max_steps=3)

    desc_pack = load_descriptions(flags.descr_dev, flags.wv_type,
                                  flags.wv_dim, glove_path=flags.glove_path)
    pred = Predictor.from_checkpoint(flags, desc_pack)

    rng = np.random.RandomState(0)
    feats = rng.randn(8, 512).astype(np.float32)
    out = pred.predict(feats)
    assert out["prediction"].shape == (8,)
    assert out["log_probs"].shape == (8, desc_pack.num_classes)
    assert 1 <= out["n_steps"] <= 3
    assert out["sender_messages"].shape == (out["n_steps"], 8, 8)
    assert set(np.unique(out["sender_messages"])) <= {0.0, 1.0}
    assert (out["conversation_length"] <= 3).all()
    # Deterministic.
    out2 = pred.predict(feats)
    np.testing.assert_array_equal(out["log_probs"], out2["log_probs"])


def test_predictor_fixed_exchange_uses_last_step(synthetic_dataset):
    """Fixed-exchange serving must score the LAST step like training
    (game/train.py masks=None) and eval.py (y[-1]) — the untrained stop
    unit's masks would otherwise select arbitrary earlier steps."""
    import jax
    import jax.numpy as jnp

    from multimodalgame_tpu.game.agents import AgentModules, init_params
    from multimodalgame_tpu.game.config import GameConfig
    from multimodalgame_tpu.game.train import make_eval_exchange

    paths = synthetic_dataset
    pack = load_descriptions(paths["descr"], "fake", 16)
    cfg = GameConfig(img_feat_dim=512, img_h_dim=16, sender_out_dim=8,
                     rec_w_dim=8, rec_hidden=16, wv_dim=16,
                     max_exchange=3, baseline_hid_dim=16,
                     fixed_exchange=True)
    mods = AgentModules(cfg)
    params = init_params(mods, jax.random.PRNGKey(0),
                         num_classes=pack.num_classes)
    feats = np.random.RandomState(1).randn(8, 512).astype(np.float32)

    out = Predictor(cfg, params, pack).predict(feats)

    ex = make_eval_exchange(mods)(params, jnp.asarray(feats),
                                  jnp.asarray(pack.desc),
                                  jax.random.PRNGKey(0))
    expect = np.asarray(jax.nn.log_softmax(ex.y[-1], axis=-1))
    np.testing.assert_allclose(out["log_probs"], expect, rtol=1e-6,
                               atol=1e-6)


def test_serve_main_attention_context(synthetic_dataset, tmp_path,
                                      capsys):
    """serve.main() must feed the fc context vector to attention-with-
    context checkpoints (eval.py/extract.py contract) — it used to omit
    it and crash in Sender.precompute."""
    import json as _json

    from multimodalgame_tpu import serve

    paths = synthetic_dataset
    argv = ["-experiment_name", "srvattn", "-model_type", "FixedAttention",
            "-log_path", str(tmp_path / "logs"),
            "-batch_size", "8", "-batch_size_dev", "8",
            "-rec_w_dim", "8", "-sender_out_dim", "8",
            "-img_h_dim", "16", "-rec_hidden", "16",
            "-baseline_hid_dim", "16", "-attn_dim", "16",
            "-max_exchange", "2",
            "-descr_train", paths["descr"], "-descr_dev", paths["descr"],
            "-train_file", paths["train"], "-dev_file", paths["dev"],
            "-wv_dim", "16", "-glove_path", paths["glove"],
            "-log_interval", "100", "-log_dev", "100",
            "-save_after", "1", "-save_interval", "2",
            "-exchange_samples", "0"]
    flags = make_flags()
    parse_args(flags, argv)
    finalize_flags(flags, argv)
    assert flags.attn_extra_context
    os.makedirs(flags.log_path, exist_ok=True)
    run(flags, max_steps=3)

    serve.main(argv)
    lines = [l for l in capsys.readouterr().out.strip().splitlines() if l]
    assert len(lines) == 24  # 6 classes x 4 dev examples
    for line in lines:
        rec = _json.loads(line)
        assert {"example_id", "prediction", "label", "target"} <= set(rec)


def test_predictor_mesh_matches_single_device(synthetic_dataset, tmp_path):
    """Mesh-sharded serving returns identical predictions/messages to
    single-device serving (deterministic eval conversation; batch
    sharded, params replicated)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from multimodalgame_tpu.data.descriptions import load_descriptions
    from multimodalgame_tpu.game.agents import AgentModules, init_params
    from multimodalgame_tpu.game.config import GameConfig
    from multimodalgame_tpu.parallel.mesh import make_mesh
    from multimodalgame_tpu.serve import Predictor

    paths = synthetic_dataset
    pack = load_descriptions(paths["descr"], "fake", 16)
    cfg = GameConfig(img_feat_dim=512, img_h_dim=16, sender_out_dim=8,
                     rec_w_dim=8, rec_hidden=16, wv_dim=16,
                     max_exchange=3, baseline_hid_dim=16,
                     fixed_exchange=False)
    params = init_params(AgentModules(cfg), jax.random.PRNGKey(0),
                         num_classes=pack.num_classes)

    rng = np.random.RandomState(3)
    feats = rng.randn(16, 512).astype(np.float32)       # 16 % 8 == 0
    tail = rng.randn(6, 512).astype(np.float32)         # 6 % 8 != 0

    base = Predictor(cfg, params, pack)
    sharded = Predictor(cfg, params, pack, mesh=make_mesh(8))
    for x in (feats, tail):
        a, b = base.predict(x), sharded.predict(x)
        np.testing.assert_array_equal(a["prediction"], b["prediction"])
        np.testing.assert_allclose(a["log_probs"], b["log_probs"],
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_array_equal(a["sender_messages"],
                                      b["sender_messages"])
        assert a["n_steps"] == b["n_steps"]
