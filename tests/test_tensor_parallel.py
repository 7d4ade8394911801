"""Tensor-parallel (2-D data x model mesh) tests on the virtual
8-device CPU platform (SURVEY §4c; parallel/tensor.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from multimodalgame_tpu.game.agents import AgentModules, init_params
from multimodalgame_tpu.game.config import GameConfig
from multimodalgame_tpu.game.train import init_opt_states, make_train_step
from multimodalgame_tpu.parallel.mesh import (make_sharded_train_step,
                                              replicate, shard_batch)
from multimodalgame_tpu.parallel.tensor import (MODEL_AXIS,
                                                init_tp_opt_states,
                                                make_mesh_2d,
                                                shard_params_tp,
                                                tp_param_specs)


def _setup(optim_type="RMSprop"):
    cfg = GameConfig(img_feat_dim=32, img_h_dim=16, sender_out_dim=8,
                     rec_w_dim=8, rec_hidden=16, wv_dim=12, max_exchange=3,
                     baseline_hid_dim=16, fixed_exchange=False,
                     entropy_s=0.08, entropy_sen=0.01, entropy_rec=0.01,
                     optim_type=optim_type)
    mods = AgentModules(cfg)
    params = init_params(mods, jax.random.PRNGKey(0), num_classes=5)
    rng = np.random.RandomState(0)
    B = 16
    data = jnp.asarray(rng.randn(B, 32), jnp.float32)
    target = jnp.asarray(rng.randint(0, 5, size=B))
    desc = jnp.asarray(rng.randn(5, 12), jnp.float32)
    return cfg, mods, params, data, target, desc


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
@pytest.mark.parametrize("shape,optim", [((2, 4), "RMSprop"),
                                         ((4, 2), "Adam")])
def test_tp_matches_single_device(shape, optim):
    """Two tensor-parallel steps on a (data, model) mesh must produce
    the same trajectory as single-device execution — the psums and
    clip-norm reductions XLA inserts change only summation order."""
    cfg, mods, params, data, target, desc = _setup(optim)
    keys = [jax.random.PRNGKey(7), jax.random.PRNGKey(8)]

    step1 = make_train_step(mods, top_k=2, batch_denom=16)
    p1 = jax.tree_util.tree_map(lambda x: x.copy(), params)
    o1 = init_opt_states(cfg, p1)
    for k in keys:
        p1, o1, m1 = step1(p1, o1, data, target, desc, k)

    mesh = make_mesh_2d(*shape)
    pN = shard_params_tp(params, mesh)
    oN = init_tp_opt_states(cfg, pN, mesh)
    stepN = make_sharded_train_step(mods, top_k=2, batch_denom=16,
                                    mesh=mesh)
    dN, tN = shard_batch(data, mesh), shard_batch(target, mesh)
    descN = replicate(desc, mesh)
    for k in keys:
        pN, oN, mN = stepN(pN, oN, dN, tN, descN, replicate(k, mesh))

    np.testing.assert_allclose(float(m1.loss_rec), float(mN.loss_rec),
                               rtol=2e-5)
    np.testing.assert_allclose(float(m1.loss_sen), float(mN.loss_sen),
                               rtol=2e-5)
    np.testing.assert_allclose(float(m1.accuracy), float(mN.accuracy))
    flat1 = jax.tree_util.tree_leaves_with_path(p1)
    flatN = jax.tree_util.tree_leaves(pN)
    assert len(flat1) == len(flatN)
    # atol 1e-4, not 2e-5 as in the 1-step dp test: RMSprop's
    # 1/(sqrt(nu)+eps) amplifies reduction-order noise while nu is tiny,
    # and two steps compound it. Measured: the plain data-parallel path
    # shows the same ~3e-5 drift on the same scalar-bias leaf.
    for (path, a), b in zip(flat1, flatN):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4,
            err_msg=jax.tree_util.keystr(path))


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
@pytest.mark.parametrize("shape,optim", [((2, 4), "RMSprop"),
                                         ((4, 2), "Adam")])
def test_tp_class_sharded_desc_matches_single_device(shape, optim):
    """The receiver-prediction-head tensor parallelism (desc sharded on
    the class axis over the model mesh axis, parallel/tensor.py
    class_axis_placer) produces the single-device trajectory: the
    softmax-normalizer and confidence-mixing collectives GSPMD inserts
    change only reduction order. D=8 divides both model-axis sizes."""
    from multimodalgame_tpu.parallel.tensor import class_axis_placer

    cfg = GameConfig(img_feat_dim=32, img_h_dim=16, sender_out_dim=8,
                     rec_w_dim=8, rec_hidden=16, wv_dim=12, max_exchange=3,
                     baseline_hid_dim=16, fixed_exchange=False,
                     entropy_s=0.08, entropy_sen=0.01, entropy_rec=0.01,
                     optim_type=optim)
    mods = AgentModules(cfg)
    params = init_params(mods, jax.random.PRNGKey(0), num_classes=8)
    rng = np.random.RandomState(0)
    B = 16
    data = jnp.asarray(rng.randn(B, 32), jnp.float32)
    target = jnp.asarray(rng.randint(0, 8, size=B))
    desc = jnp.asarray(rng.randn(8, 12), jnp.float32)
    keys = [jax.random.PRNGKey(7), jax.random.PRNGKey(8)]

    step1 = make_train_step(mods, top_k=2, batch_denom=B)
    p1 = jax.tree_util.tree_map(lambda x: x.copy(), params)
    o1 = init_opt_states(cfg, p1)
    for k in keys:
        p1, o1, m1 = step1(p1, o1, data, target, desc, k)

    mesh = make_mesh_2d(*shape)
    n_model = mesh.shape[MODEL_AXIS]
    pN = shard_params_tp(params, mesh)
    oN = init_tp_opt_states(cfg, pN, mesh)
    stepN = make_sharded_train_step(mods, top_k=2, batch_denom=B,
                                    mesh=mesh)
    descN = class_axis_placer(mesh)(desc)
    assert descN.addressable_shards[0].data.shape == (8 // n_model, 12)
    for k in keys:
        pN, oN, mN = stepN(pN, oN, shard_batch(data, mesh),
                           shard_batch(target, mesh), descN,
                           replicate(k, mesh))

    np.testing.assert_allclose(float(m1.loss_rec), float(mN.loss_rec),
                               rtol=2e-5)
    np.testing.assert_allclose(float(m1.accuracy), float(mN.accuracy))
    for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(p1),
                            jax.tree_util.tree_leaves(pN)):
        label = jax.tree_util.keystr(path)
        if "y2']['bias" in label:
            # Zero-gradient leaf: RMSprop's eps denominator turns pure
            # reduction-order noise into a visible random walk (same
            # exclusion as the mesh/multihost driver tests).
            continue
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, err_msg=label)


def test_class_axis_placer_ragged_falls_back():
    """A class count the model axis doesn't divide replicates (the
    reference's canonical D=30 game on a 4-way model axis), and None
    passes through (no desc_attn tensors)."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    from multimodalgame_tpu.parallel.tensor import class_axis_placer

    mesh = make_mesh_2d(2, 4)
    place = class_axis_placer(mesh)
    ragged = place(jnp.ones((30, 12)))   # 30 % 4 != 0
    assert ragged.addressable_shards[0].data.shape == (30, 12)
    sharded = place(jnp.ones((8, 3, 12)))  # padded word set rank-3
    assert sharded.addressable_shards[0].data.shape == (2, 3, 12)
    assert place(None) is None


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_params_actually_model_sharded():
    """The Megatron leaves are physically split over the model axis —
    at placement, in the optimizer accumulators, and (propagated by
    GSPMD) in the updated parameters a step returns."""
    cfg, mods, params, data, target, desc = _setup()
    mesh = make_mesh_2d(2, 4)
    pN = shard_params_tp(params, mesh)

    k = pN["sender"]["image_layer"]["kernel"]        # column-parallel
    assert k.addressable_shards[0].data.shape == (32, 16 // 4)
    b = pN["sender"]["binary_layer"]["kernel"]       # row-parallel
    assert b.addressable_shards[0].data.shape == (16 // 4, 8)
    gru = pN["receiver"]["rnn"]["w_hh"]              # replicated
    assert gru.addressable_shards[0].data.shape == gru.shape

    oN = init_tp_opt_states(cfg, pN, mesh)
    # RMSprop nu mirrors the param placement (GSPMD propagation). Find
    # the accumulator leaf by shape rather than hard-coding optax's
    # chain-state nesting.
    nus = [x for x in jax.tree_util.tree_leaves(oN["sender"])
           if getattr(x, "shape", None) == (32, 16)]
    assert nus, "no accumulator mirrors the image_layer kernel"
    for nu in nus:
        assert nu.addressable_shards[0].data.shape == (32, 16 // 4)

    stepN = make_sharded_train_step(mods, top_k=2, batch_denom=16,
                                    mesh=mesh)
    pN, oN, _ = stepN(pN, oN, shard_batch(data, mesh),
                      shard_batch(target, mesh), replicate(desc, mesh),
                      replicate(jax.random.PRNGKey(7), mesh))
    k2 = pN["sender"]["image_layer"]["kernel"]
    assert k2.addressable_shards[0].data.shape == (32, 16 // 4)


def test_specs_fall_back_when_not_divisible():
    """A dim the model axis doesn't divide is replicated, not an error
    (e.g. the reference's baseline_hid_dim=500 on an 8-way model axis)."""
    cfg, mods, params, *_ = _setup()
    specs = tp_param_specs(params, 8)  # img_h 16 ok; baseline hid 16 ok
    assert specs["sender"]["image_layer"]["kernel"] == P(None, MODEL_AXIS)
    specs3 = tp_param_specs(params, 3)  # divides nothing here
    flat = jax.tree_util.tree_leaves(
        specs3, is_leaf=lambda x: isinstance(x, P))
    assert all(s == P() for s in flat)
    # Heads/GRU are replicated under every policy.
    assert specs["receiver"]["rnn"]["w_hh"] == P()
    assert specs["sender"]["binary_layer"]["bias"] == P()


def test_mesh_2d_validates_device_count():
    with pytest.raises(ValueError):
        make_mesh_2d(64, 64)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_axis_placer_gates_on_data_axis_extent():
    """On a 2-D (data, model) mesh, axis_placer must shard a batch axis
    that divides the DATA-axis extent even when it does not divide the
    full device count — gating on mesh.size silently replicated every
    batch row of e.g. a (4, 2) mesh with batch 12 (advisor round-3 #1)."""
    from multimodalgame_tpu.parallel.mesh import BATCH_AXIS, axis_placer

    mesh = make_mesh_2d(4, 2)
    place = axis_placer(mesh, axis=-1)
    rows = np.arange(12, dtype=np.int32)  # 12 % 8 != 0, 12 % 4 == 0
    placed = place(rows)
    spec = placed.sharding.spec
    assert tuple(spec) == (BATCH_AXIS,)
    assert placed.addressable_shards[0].data.shape == (12 // 4,)
    # Ragged vs the data axis still replicates.
    odd = place(np.arange(7, dtype=np.int32))
    assert odd.addressable_shards[0].data.shape == (7,)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_opt_placement_check_catches_non_aliasing_state():
    """An optimizer state whose dict keys do not alias the param tree
    must FAIL placement loudly instead of silently replicating every
    accumulator (advisor round-3 #3)."""
    from multimodalgame_tpu.parallel.tensor import place_opt_states_tp

    cfg, mods, params, *_ = _setup()
    mesh = make_mesh_2d(2, 4)
    specs = tp_param_specs(params, 4)

    # Matrix accumulators hidden under keys that address nothing in the
    # param tree -> every leaf would fall back to replicated.
    bogus = {"sender": {"exp_avg_sq": {"layer0": np.zeros((32, 16),
                                                          np.float32)}}}
    with pytest.raises(ValueError, match="no optimizer accumulator"):
        place_opt_states_tp(bogus, mesh, specs)

    # The real optax state still places (and reports sharded leaves).
    opts = init_opt_states(cfg, params)
    placed = place_opt_states_tp(opts, mesh, specs)
    nus = [x for x in jax.tree_util.tree_leaves(placed["sender"])
           if getattr(x, "shape", None) == (32, 16)]
    assert nus and all(
        nu.addressable_shards[0].data.shape == (32, 4) for nu in nus)
