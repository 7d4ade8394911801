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


def test_dryrun_multichip_entry():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)
