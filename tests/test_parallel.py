"""Multi-chip data-parallel tests on the virtual 8-device CPU mesh
(SURVEY §4c)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalgame_tpu.game.agents import AgentModules, init_params
from multimodalgame_tpu.game.config import GameConfig
from multimodalgame_tpu.game.train import init_opt_states, make_train_step
from multimodalgame_tpu.parallel.mesh import (make_mesh,
                                              make_sharded_train_step,
                                              replicate, shard_batch)


def _setup():
    cfg = GameConfig(img_feat_dim=32, img_h_dim=16, sender_out_dim=8,
                     rec_w_dim=8, rec_hidden=16, wv_dim=12, max_exchange=3,
                     baseline_hid_dim=16, fixed_exchange=False,
                     entropy_s=0.08, entropy_sen=0.01, entropy_rec=0.01)
    mods = AgentModules(cfg)
    params = init_params(mods, jax.random.PRNGKey(0), num_classes=5)
    opts = init_opt_states(cfg, params)
    rng = np.random.RandomState(0)
    B = 16
    data = jnp.asarray(rng.randn(B, 32), jnp.float32)
    target = jnp.asarray(rng.randint(0, 5, size=B))
    desc = jnp.asarray(rng.randn(5, 12), jnp.float32)
    return cfg, mods, params, opts, data, target, desc


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_sharded_matches_single_device():
    """A data-parallel step over 8 devices must produce the same updated
    parameters and metrics as the single-device step."""
    cfg, mods, params, opts, data, target, desc = _setup()
    key = jax.random.PRNGKey(7)

    step1 = make_train_step(mods, top_k=2, batch_denom=16)
    p1, o1, m1 = step1(
        jax.tree_util.tree_map(lambda x: x.copy(), params),
        jax.tree_util.tree_map(lambda x: x.copy(), opts),
        data, target, desc, key)

    mesh = make_mesh(8)
    stepN = make_sharded_train_step(mods, top_k=2, batch_denom=16,
                                    mesh=mesh)
    pN, oN, mN = stepN(replicate(params, mesh), replicate(opts, mesh),
                       shard_batch(data, mesh), shard_batch(target, mesh),
                       replicate(desc, mesh), replicate(key, mesh))

    np.testing.assert_allclose(float(m1.loss_rec), float(mN.loss_rec),
                               rtol=2e-5)
    np.testing.assert_allclose(float(m1.loss_sen), float(mN.loss_sen),
                               rtol=2e-5)
    np.testing.assert_allclose(float(m1.accuracy), float(mN.accuracy))
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(pN)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_batch_actually_sharded():
    cfg, mods, params, opts, data, target, desc = _setup()
    mesh = make_mesh(8)
    sharded = shard_batch(data, mesh)
    assert len(sharded.sharding.device_set) == 8
    repl = replicate(desc, mesh)
    assert len(repl.sharding.device_set) == 8
    # Each device holds 1/8 of the batch rows.
    shard = sharded.addressable_shards[0]
    assert shard.data.shape[0] == data.shape[0] // 8


def test_mesh_validates_device_count():
    with pytest.raises(ValueError):
        make_mesh(10_000)


@pytest.mark.slow
def test_dryrun_multichip_entry():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_sharded_step_desc_attention(synthetic_dataset):
    """Data-parallel step with word-level description attention: the
    padded word set replicates, per-example attention shards with the
    batch, and the sharded update matches single-device execution."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from multimodalgame_tpu.data.descriptions import load_descriptions
    from multimodalgame_tpu.game.agents import AgentModules, init_params
    from multimodalgame_tpu.game.config import GameConfig
    from multimodalgame_tpu.game.train import init_opt_states, make_train_step
    from multimodalgame_tpu.parallel.mesh import (make_mesh,
                                                  make_sharded_train_step,
                                                  replicate, shard_batch)

    pack = load_descriptions(synthetic_dataset["descr"], "fake", 16)
    cfg = GameConfig(img_feat_dim=32, img_h_dim=16, sender_out_dim=8,
                     rec_w_dim=8, rec_hidden=16, wv_dim=16, max_exchange=3,
                     baseline_hid_dim=16, fixed_exchange=False,
                     desc_attn=True, desc_attn_dim=6,
                     entropy_s=0.08, entropy_sen=0.01, entropy_rec=0.01)
    mods = AgentModules(cfg)
    params = init_params(mods, jax.random.PRNGKey(0),
                         num_classes=pack.num_classes,
                         max_words=max(pack.desc_set_lens))
    opts = init_opt_states(cfg, params)

    rng = np.random.RandomState(2)
    data = jnp.asarray(rng.randn(16, 32), jnp.float32)
    target = jnp.asarray(rng.randint(0, pack.num_classes, size=16))
    desc = jnp.asarray(pack.desc)
    padded = jnp.asarray(pack.desc_set_padded)
    pmask = jnp.asarray(pack.desc_set_mask)
    key = jax.random.PRNGKey(9)

    base_step = make_train_step(mods, top_k=2, batch_denom=16, fast=False)
    b_params, _, bm = base_step(params, opts, data, target, desc, key,
                                desc_set_padded=padded,
                                desc_set_mask=pmask)

    mesh = make_mesh(8)
    params2 = init_params(mods, jax.random.PRNGKey(0),
                          num_classes=pack.num_classes,
                          max_words=max(pack.desc_set_lens))
    opts2 = init_opt_states(cfg, params2)
    sstep = make_sharded_train_step(mods, top_k=2, batch_denom=16,
                                    mesh=mesh, fast=False)
    s_params, _, sm = sstep(
        replicate(params2, mesh), replicate(opts2, mesh),
        shard_batch(data, mesh), shard_batch(target, mesh),
        replicate(desc, mesh), replicate(key, mesh),
        desc_set_padded=replicate(padded, mesh),
        desc_set_mask=replicate(pmask, mesh))

    np.testing.assert_allclose(float(sm.loss_rec), float(bm.loss_rec),
                               rtol=2e-5, atol=1e-6)
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(b_params),
            jax.tree_util.tree_leaves_with_path(s_params)):
        label = jax.tree_util.keystr(pa)
        # Analytically-zero-gradient biases (softmax shift invariance:
        # y2.bias under log_softmax, d_attn.bias under the word softmax)
        # random-walk on reduction-order noise under RMSprop — their
        # values legitimately differ between shardings.
        if "y2']['bias" in label or "d_attn']['bias" in label:
            continue
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6,
            err_msg=label)


def test_host_view_many_matches_host_view():
    """The pipelined batch fetch must return exactly what per-array
    host_view does, across plain numpy, single-device arrays, sharded
    global arrays, and fully-replicated global arrays (order preserved,
    including the empty call)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from multimodalgame_tpu.parallel.distributed import (host_view,
                                                         host_view_many)

    mesh = make_mesh(8)
    sharded = jax.device_put(
        jnp.arange(16, dtype=jnp.float32),
        NamedSharding(mesh, P("data")))
    replicated = jax.device_put(jnp.arange(4, dtype=jnp.float32) * 3,
                                NamedSharding(mesh, P()))
    single = jnp.full((3,), 7.0)
    plain = np.arange(5)

    xs = [sharded, replicated, single, plain, sharded]
    got = host_view_many(xs)
    want = [host_view(x) for x in xs]
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
    assert host_view_many([]) == []
