"""Golden-trace regression tests (SURVEY §4b).

Cross-framework bit-parity with the py2/torch-0.x reference is impossible
(different RNGs); what *is* pinnable is this framework's own fixed-seed
behavior. These tests freeze the loss trajectory of a small deterministic
training run so any refactor that changes numerics — loss algebra, mask
handling, RNG threading, optimizer wiring — fails loudly. Regenerate the
goldens deliberately with:

    python -m tests.test_golden regen
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden_trace.json")


def _run_trace():
    from multimodalgame_tpu.game.agents import AgentModules, init_params
    from multimodalgame_tpu.game.config import GameConfig
    from multimodalgame_tpu.game.train import init_opt_states, make_train_step

    cfg = GameConfig(img_feat_dim=32, img_h_dim=16, sender_out_dim=8,
                     rec_w_dim=8, rec_hidden=16, wv_dim=12, max_exchange=3,
                     baseline_hid_dim=16, fixed_exchange=False,
                     entropy_s=0.08, entropy_sen=0.01, entropy_rec=0.01,
                     learning_rate=1e-3, optim_type="RMSprop")
    mods = AgentModules(cfg)
    params = init_params(mods, jax.random.PRNGKey(0), num_classes=5)
    opts = init_opt_states(cfg, params)
    step = make_train_step(mods, top_k=2, batch_denom=6)

    rng = np.random.RandomState(7)
    data = jnp.asarray(rng.randn(6, 32), jnp.float32)
    target = jnp.asarray(rng.randint(0, 5, size=6))
    desc = jnp.asarray(rng.randn(5, 12), jnp.float32)

    trace = []
    key = jax.random.PRNGKey(123)
    for i in range(5):
        key, sub = jax.random.split(key)
        params, opts, m = step(params, opts, data, target, desc, sub)
        trace.append({
            "loss_rec": float(m.loss_rec),
            "loss_sen": float(m.loss_sen),
            "nll": float(m.nll_loss),
            "bas_rec": float(m.loss_bas_rec),
            "bas_sen": float(m.loss_bas_sen),
            "accuracy": float(m.accuracy),
        })
    return trace


def test_fixed_seed_trace_matches_golden():
    assert os.path.exists(GOLDEN_PATH), \
        "golden file missing — run `python -m tests.test_golden regen`"
    golden = json.load(open(GOLDEN_PATH))
    trace = _run_trace()
    for i, (g, t) in enumerate(zip(golden, trace)):
        for k in g:
            np.testing.assert_allclose(
                t[k], g[k], rtol=2e-4, atol=1e-5,
                err_msg=f"step {i} field {k} drifted from golden")


if __name__ == "__main__":
    import sys
    jax.config.update("jax_platforms", "cpu")  # goldens are CPU-generated
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        trace = _run_trace()
        with open(GOLDEN_PATH, "w") as f:
            json.dump(trace, f, indent=2)
        print("wrote", GOLDEN_PATH)
