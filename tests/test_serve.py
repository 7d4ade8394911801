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
