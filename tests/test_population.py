"""Population (vmapped multi-game) training tests — parallel/population.py
and the sweep driver (sweep.py)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalgame_tpu.config import finalize_flags, make_flags, parse_args
from multimodalgame_tpu.game.agents import AgentModules, init_params
from multimodalgame_tpu.game.config import GameConfig
from multimodalgame_tpu.game.train import (init_opt_states,
                                           make_multistep_train_step)
from multimodalgame_tpu.parallel.population import (
    init_population, init_population_opt_states, make_population_eval,
    make_population_train_step, member_params, split_population_keys)
from multimodalgame_tpu.sweep import parse_lr_scales, run_sweep

pytestmark = pytest.mark.slow  # see pytest.ini: `-m "not slow"` is the fast subset



@pytest.fixture(scope="module")
def setup():
    cfg = GameConfig(img_feat_dim=64, img_h_dim=16, sender_out_dim=8,
                     rec_w_dim=8, rec_hidden=16, wv_dim=12, max_exchange=3,
                     baseline_hid_dim=16, fixed_exchange=False,
                     entropy_s=0.08, entropy_sen=0.01, entropy_rec=0.01,
                     learning_rate=1e-3, optim_type="RMSprop")
    mods = AgentModules(cfg)
    K, B, C, N = 4, 8, 5, 3
    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.randn(K, B, 64), jnp.float32)
    target = jnp.asarray(rng.randint(0, C, size=(K, B)))
    desc = jnp.asarray(rng.randn(C, 12), jnp.float32)
    return mods, cfg, (K, B, C, N), data, target, desc


@pytest.mark.parametrize("pop_flat", [False, True],
                         ids=["stacked", "flat"])
def test_population_matches_independent_runs(setup, pop_flat):
    """Member i of the vmapped population reproduces an independent
    single-game run with the same init key and per-step sampling keys —
    for both carry layouts (stacked trees, the default; and the (N, P)
    flat-carry alternative, measured slower on TPU but kept validated —
    see population.make_population_train_step)."""
    mods, cfg, (K, B, C, N), data, target, desc = setup
    root = jax.random.PRNGKey(0)
    pop = init_population(mods, root, N, num_classes=C)
    pop_opts = init_population_opt_states(cfg, pop)
    chunk_pop = make_population_train_step(mods, top_k=2, batch_denom=B,
                                           flat=pop_flat)
    key = jax.random.PRNGKey(9)
    keys = split_population_keys(key, K, N)
    # the chunk donates its carries — keep the originals alive
    new_pop, _, pm = chunk_pop(jax.tree_util.tree_map(jnp.copy, pop),
                               pop_opts, data, target, desc, keys)
    assert pm.accuracy.shape == (K, N)

    # flat=False isolates vmap-vs-loop: same tree-carry math per member.
    chunk_one = make_multistep_train_step(mods, top_k=2, batch_denom=B,
                                          flat=False)
    init_keys = jax.random.split(root, N)
    for i in range(N):
        p = init_params(mods, init_keys[i], num_classes=C)
        for a, b in zip(jax.tree_util.tree_leaves(p),
                        jax.tree_util.tree_leaves(member_params(pop, i))):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)
        o = init_opt_states(cfg, p)
        p2, _, sm = chunk_one(p, o, data, target, desc, keys[:, i])
        np.testing.assert_allclose(np.asarray(sm.accuracy),
                                   np.asarray(pm.accuracy[:, i]),
                                   atol=1e-6)
        # vmapped matmuls/reductions round differently from looped ones
        # at f32; RMSprop's g/sqrt(nu) amplifies that ~1e-8 noise up to
        # a few 1e-3 in near-zero-gradient directions within K steps
        # (observed 2.1e-3 max after the fused-y2 reduction). Genuine
        # divergence is caught by the tight accuracy check above; this
        # bound only guards against gross parameter mixups.
        for a, b in zip(jax.tree_util.tree_leaves(p2),
                        jax.tree_util.tree_leaves(
                            member_params(new_pop, i))):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-3)


def test_lr_scale_zero_freezes_member(setup):
    mods, cfg, (K, B, C, N), data, target, desc = setup
    pop = init_population(mods, jax.random.PRNGKey(1), N, num_classes=C)
    pop_opts = init_population_opt_states(cfg, pop)
    chunk = make_population_train_step(mods, top_k=2, batch_denom=B)
    keys = split_population_keys(jax.random.PRNGKey(2), K, N)
    scales = jnp.asarray([0.0, 1.0, 2.0])
    new_pop, _, _ = chunk(jax.tree_util.tree_map(jnp.copy, pop), pop_opts,
                          data, target, desc, keys, scales)
    for a, b in zip(jax.tree_util.tree_leaves(member_params(pop, 0)),
                    jax.tree_util.tree_leaves(member_params(new_pop, 0))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # scaled members did move
    moved = any(
        float(jnp.abs(a - b).max()) > 0 for a, b in
        zip(jax.tree_util.tree_leaves(member_params(pop, 1)),
            jax.tree_util.tree_leaves(member_params(new_pop, 1))))
    assert moved


def test_population_eval_counts(setup):
    mods, cfg, (K, B, C, N), data, target, desc = setup
    pop = init_population(mods, jax.random.PRNGKey(3), N, num_classes=C)
    ev = make_population_eval(mods, top_k=C)  # top-C: everything correct
    c = ev(pop, data[0], target[0], desc,
           jax.random.split(jax.random.PRNGKey(4), N))
    np.testing.assert_array_equal(np.asarray(c), [B] * N)
    # k > num_classes clamps like the host argsort (losses.topk_accuracy
    # and fast_eval.py have the same clamp) instead of a trace error.
    ev_big = make_population_eval(mods, top_k=C + 3)
    c2 = ev_big(pop, data[0], target[0], desc,
                jax.random.split(jax.random.PRNGKey(4), N))
    np.testing.assert_array_equal(np.asarray(c2), [B] * N)


def test_sharded_population_matches_unsharded(setup):
    """The member axis sharded over an 8-device mesh (zero collectives)
    produces the same trajectories as single-device execution, and the
    compiled program really is partitioned (no cross-device math)."""
    from multimodalgame_tpu.parallel.mesh import make_mesh, replicate
    from multimodalgame_tpu.parallel.population import (
        shard_population, shard_population_keys)

    mods, cfg, (K, B, C, _), data, target, desc = setup
    N = 8
    pop = init_population(mods, jax.random.PRNGKey(5), N, num_classes=C)
    opts = init_population_opt_states(cfg, pop)
    chunk = make_population_train_step(mods, top_k=2, batch_denom=B)
    keys = split_population_keys(jax.random.PRNGKey(6), K, N)

    ref_pop, _, ref_m = chunk(jax.tree_util.tree_map(jnp.copy, pop),
                              jax.tree_util.tree_map(jnp.copy, opts),
                              data, target, desc, keys)

    mesh = make_mesh(8)
    sh_pop = shard_population(pop, mesh)
    sh_opts = shard_population(opts, mesh)
    sh_keys = shard_population_keys(keys, mesh)
    out_pop, _, sh_m = chunk(sh_pop, sh_opts, replicate(data, mesh),
                             replicate(target, mesh),
                             replicate(desc, mesh), sh_keys)

    # Output population stays sharded on the member axis.
    leaf = jax.tree_util.tree_leaves(out_pop)[0]
    assert len(leaf.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(sh_m.accuracy),
                               np.asarray(ref_m.accuracy), atol=1e-6)
    # partitioned programs round slightly differently; RMSprop amplifies
    # it in near-zero-gradient directions (same tolerance as the other
    # equivalence tests in this file)
    for a, b in zip(jax.tree_util.tree_leaves(ref_pop),
                    jax.tree_util.tree_leaves(out_pop)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3)


def test_parse_lr_scales():
    assert parse_lr_scales(None, 4) is None
    np.testing.assert_allclose(parse_lr_scales("0.5,1,2", 5),
                               [0.5, 1.0, 2.0, 0.5, 1.0])


def test_run_sweep_dataset_smaller_than_batch(synthetic_dataset,
                                              tmp_path):
    """A training set smaller than one batch yields zero steps but still
    finishes cleanly with a final dev eval (regression: the epoch-plan
    refill crashed on the (0,)-shaped empty plan)."""
    paths = synthetic_dataset
    f = make_flags()
    argv = [
        "-experiment_name", "sweeptiny", "-model_type", "Adaptive",
        "-log_path", str(tmp_path),
        "-batch_size", "4096", "-batch_size_dev", "8",
        "-rec_w_dim", "8", "-sender_out_dim", "8",
        "-img_h_dim", "16", "-rec_hidden", "16", "-baseline_hid_dim", "16",
        "-max_exchange", "2", "-max_epoch", "2",
        "-top_k_dev", "2", "-top_k_train", "2",
        "-descr_train", paths["descr"], "-descr_dev", paths["descr"],
        "-train_file", paths["train"], "-dev_file", paths["dev"],
        "-wv_dim", "16", "-glove_path", paths["glove"],
        "-population", "2",
    ]
    parse_args(f, argv)
    finalize_flags(f, argv)
    os.makedirs(f.log_path, exist_ok=True)
    summary = run_sweep(f, max_steps=4, eval_every=2)
    assert summary["steps"] == 0
    assert len(summary["members"]) == 2


def test_run_sweep_attention_preset(synthetic_dataset, tmp_path):
    """The population sweep covers the attention presets too: visual
    attention over layer4_2 + fc context (FixedAttention flags)."""
    paths = synthetic_dataset
    f = make_flags()
    argv = [
        "-experiment_name", "sweepattn", "-model_type", "FixedAttention",
        "-log_path", str(tmp_path),
        "-batch_size", "8", "-batch_size_dev", "8",
        "-rec_w_dim", "8", "-sender_out_dim", "8",
        "-img_h_dim", "16", "-rec_hidden", "16", "-baseline_hid_dim", "16",
        "-attn_dim", "16",
        "-max_exchange", "2", "-max_epoch", "1",
        "-top_k_dev", "2", "-top_k_train", "2",
        "-descr_train", paths["descr"], "-descr_dev", paths["descr"],
        "-train_file", paths["train"], "-dev_file", paths["dev"],
        "-wv_dim", "16", "-glove_path", paths["glove"],
        "-population", "2",
    ]
    parse_args(f, argv)
    finalize_flags(f, argv)
    assert f.img_feat == "layer4_2" and f.attn_extra_context
    os.makedirs(f.log_path, exist_ok=True)
    summary = run_sweep(f, max_steps=3, eval_every=3)
    assert summary["steps"] == 3
    assert len(summary["members"]) == 2
    assert all(np.isfinite(m["final_dev_acc"])
               for m in summary["members"])


def test_run_sweep_end_to_end(synthetic_dataset, tmp_path, capsys):
    """Tiny sweep through the CLI flag surface: trains, evaluates every
    member, writes the winner checkpoint, prints JSONL."""
    paths = synthetic_dataset
    f = make_flags()
    argv = [
        "-experiment_name", "sweep", "-model_type", "Adaptive",
        "-log_path", str(tmp_path),
        "-batch_size", "8", "-batch_size_dev", "8",
        "-rec_w_dim", "8", "-sender_out_dim", "8",
        "-img_h_dim", "16", "-rec_hidden", "16", "-baseline_hid_dim", "16",
        "-max_exchange", "3", "-max_epoch", "2",
        "-top_k_dev", "2", "-top_k_train", "2",
        "-descr_train", paths["descr"], "-descr_dev", paths["descr"],
        "-train_file", paths["train"], "-dev_file", paths["dev"],
        "-wv_dim", "16", "-glove_path", paths["glove"],
        "-population", "3", "-lr_scales", "0.5,1",
    ]
    parse_args(f, argv)
    finalize_flags(f, argv)
    os.makedirs(f.log_path, exist_ok=True)

    summary = run_sweep(f, max_steps=6, eval_every=3)
    assert summary["population"] == 3
    assert summary["steps"] == 6
    assert len(summary["members"]) == 3
    assert 0 <= summary["winner"] < 3
    assert os.path.exists(f.checkpoint + "_best")

    lines = [json.loads(ln) for ln in
             capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 4  # 3 member lines + summary
    assert lines[1]["lr_scale"] == 1.0  # cycled "0.5,1" -> member 1

    # Winner checkpoint loads in the standard single-game layout.
    from multimodalgame_tpu.game.agents import init_params as ip
    from multimodalgame_tpu.utils.checkpoint import load_checkpoint
    cfg = GameConfig.from_flags(f)
    mods = AgentModules(cfg)
    from multimodalgame_tpu.data.descriptions import load_descriptions
    pack = load_descriptions(paths["descr"], "fake", 16)
    params = ip(mods, jax.random.PRNGKey(0), num_classes=pack.num_classes)
    opts = init_opt_states(cfg, params)
    data, params, opts = load_checkpoint(f.checkpoint + "_best", params,
                                         opts)
    assert data["step"] == 6


def test_run_sweep_population_one_uses_flat_path(synthetic_dataset,
                                                 tmp_path, capsys,
                                                 monkeypatch):
    """-population 1 routes through the driver's flat-carry indexed
    chunk (VERDICT round-3 #6) — the population trainer (whose member
    vmap axis disables the flat carry, ~2x slower at N=1) must not be
    built — with identical outputs: member JSONL, summary schema, and a
    single-game winner checkpoint."""
    import multimodalgame_tpu.sweep as sweep_mod

    def _boom(*a, **k):
        raise AssertionError("population trainer built for N=1")

    monkeypatch.setattr(sweep_mod, "make_population_train_step", _boom)

    paths = synthetic_dataset
    f = make_flags()
    argv = [
        "-experiment_name", "sweep1", "-model_type", "Adaptive",
        "-log_path", str(tmp_path),
        "-batch_size", "8", "-batch_size_dev", "8",
        "-rec_w_dim", "8", "-sender_out_dim", "8",
        "-img_h_dim", "16", "-rec_hidden", "16", "-baseline_hid_dim", "16",
        "-max_exchange", "3", "-max_epoch", "2",
        "-top_k_dev", "2", "-top_k_train", "2",
        "-descr_train", paths["descr"], "-descr_dev", paths["descr"],
        "-train_file", paths["train"], "-dev_file", paths["dev"],
        "-wv_dim", "16", "-glove_path", paths["glove"],
        "-population", "1", "-lr_scales", "0.5",
    ]
    parse_args(f, argv)
    finalize_flags(f, argv)
    os.makedirs(f.log_path, exist_ok=True)

    summary = run_sweep(f, max_steps=6, eval_every=3)
    assert summary["population"] == 1
    assert summary["steps"] == 6
    assert summary["winner"] == 0
    assert len(summary["members"]) == 1
    assert summary["members"][0]["lr_scale"] == 0.5
    assert np.isfinite(summary["members"][0]["final_dev_acc"])

    lines = [json.loads(ln) for ln in
             capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 2  # 1 member line + summary

    # Winner checkpoint loads in the standard single-game layout.
    from multimodalgame_tpu.data.descriptions import load_descriptions
    from multimodalgame_tpu.game.agents import init_params as ip
    from multimodalgame_tpu.utils.checkpoint import load_checkpoint
    cfg = GameConfig.from_flags(f)
    mods = AgentModules(cfg)
    pack = load_descriptions(paths["descr"], "fake", 16)
    params = ip(mods, jax.random.PRNGKey(0), num_classes=pack.num_classes)
    opts = init_opt_states(cfg, params)
    data, params, opts = load_checkpoint(f.checkpoint + "_best", params,
                                         opts)
    assert data["step"] == 6
