"""Compiled-HLO collective audit (VERDICT round-3 #2).

The parallel layers claim XLA derives exactly the right collectives from
placement alone (parallel/mesh.py, parallel/tensor.py docstrings). The
numeric equality tests cannot distinguish "sharded with one grad
all-reduce" from "silently re-replicated with all-gathers everywhere" —
both compute the same numbers. These tests lower + compile the product
programs on the 8-device mesh and assert on the HLO itself: which
collective ops exist and how many bytes they move, so a placement
regression fails loudly here."""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from multimodalgame_tpu.game.agents import AgentModules, init_params
from multimodalgame_tpu.game.config import GameConfig
from multimodalgame_tpu.game.train import (init_opt_states,
                                           make_multistep_train_step_indexed)
from multimodalgame_tpu.parallel.mesh import (BATCH_AXIS, make_mesh,
                                              make_sharded_train_step,
                                              replicate, shard_batch)

N_DEV = 8

_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "u64": 8,
                "s64": 8, "u32": 4, "s32": 4, "u16": 2, "s16": 2,
                "u8": 1, "s8": 1, "pred": 1}

# Collective-op mnemonics in compiled HLO text (async ops appear as
# -start/-done pairs; counting -start avoids double counting).
_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
                "collective-permute", "all-to-all")


def collective_ops(hlo_text: str):
    """Every collective in the compiled module as (kind, bytes_out).

    Parses instruction lines like
    ``%all-reduce.7 = f32[1536]{0} all-reduce(...)`` (and tuple-shaped
    variants) across all computations, including while-loop bodies.
    """
    out = []
    for ln in hlo_text.splitlines():
        m = re.search(r"=\s+((?:\([^)]*\)|\S+))\s+(" +
                      "|".join(_COLLECTIVES) + r")(?:-start)?\(", ln)
        if not m or "-done(" in ln:
            continue
        shape_txt, kind = m.group(1), m.group(2)
        nbytes = 0
        for dt, dims in re.findall(r"(\w+)\[([\d,]*)\]", shape_txt):
            if dt not in _DTYPE_BYTES:
                continue
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            nbytes += n * _DTYPE_BYTES[dt]
        out.append((kind, nbytes))
    return out


def _setup(optim="RMSprop"):
    cfg = GameConfig(img_feat_dim=32, img_h_dim=16, sender_out_dim=8,
                     rec_w_dim=8, rec_hidden=16, wv_dim=12, max_exchange=3,
                     baseline_hid_dim=16, fixed_exchange=False,
                     entropy_s=0.08, entropy_sen=0.01, entropy_rec=0.01,
                     optim_type=optim)
    mods = AgentModules(cfg)
    params = init_params(mods, jax.random.PRNGKey(0), num_classes=5)
    return cfg, mods, params


def _param_bytes(params):
    return sum(np.prod(np.shape(x)) * 4
               for x in jax.tree_util.tree_leaves(params))


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_dp_chunk_collectives_are_one_grad_allreduce_per_step():
    """The data-parallel chunked driver step: per scan step, collective
    traffic is the gradient all-reduce plus scalar loss/metric psums —
    and nothing re-gathers the batch (no all-gather/all-to-all of
    per-example data)."""
    cfg, mods, params = _setup()
    opts = init_opt_states(cfg, params)
    mesh = make_mesh(N_DEV)
    rep = NamedSharding(mesh, P())
    row2d = NamedSharding(mesh, P(None, BATCH_AXIS))

    N, B, K = 64, 16, 2
    rng = np.random.RandomState(0)
    feats = jax.device_put(jnp.asarray(rng.randn(N, 32), jnp.float32), rep)
    targets = jax.device_put(jnp.asarray(rng.randint(0, 5, size=N)), rep)
    desc = jax.device_put(jnp.asarray(rng.randn(5, 12), jnp.float32), rep)
    idx = jax.device_put(jnp.asarray(
        rng.randint(0, N, size=(K, B)), jnp.int32), row2d)
    params_r = replicate(params, mesh)
    opts_r = replicate(opts, mesh)

    chunk = make_multistep_train_step_indexed(mods, top_k=2, batch_denom=B)
    text = chunk.lower(params_r, opts_r, feats, targets, idx, desc,
                       jax.random.PRNGKey(1)).compile().as_text()
    ops = collective_ops(text)
    kinds = {k for k, _ in ops}

    # The gradient sum must be an all-reduce (psum), present at least
    # once (inside the scan body's single trace).
    assert "all-reduce" in kinds, ops
    # No batch re-gather: nothing may all-gather or all-to-all
    # per-example data back to every device.
    assert "all-gather" not in kinds, ops
    assert "all-to-all" not in kinds, ops
    # Byte bound: collective volume per traced step <= grad vector
    # (= all params once) + slack for the batch-global loss reductions
    # (scalars: masked-advantage mean/std, mask sums, n_steps, metrics).
    pbytes = _param_bytes(params)
    total = sum(b for _, b in ops)
    assert total <= 1.5 * pbytes, (total, pbytes, ops)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_tp_step_has_row_parallel_psum_and_no_param_regather():
    """The 2-D (data, model) tensor-parallel step: the row-parallel psum
    exists, and no collective re-gathers a full Megatron-sharded
    parameter (which would mean GSPMD silently re-replicated the weights
    instead of keeping them sharded)."""
    from multimodalgame_tpu.parallel.tensor import (init_tp_opt_states,
                                                    make_mesh_2d,
                                                    shard_params_tp)
    cfg, mods, params = _setup()
    mesh = make_mesh_2d(4, 2)
    pN = shard_params_tp(params, mesh)
    oN = init_tp_opt_states(cfg, pN, mesh)

    B = 16
    rng = np.random.RandomState(0)
    data = shard_batch(jnp.asarray(rng.randn(B, 32), jnp.float32), mesh)
    target = shard_batch(jnp.asarray(rng.randint(0, 5, size=B)), mesh)
    desc = replicate(jnp.asarray(rng.randn(5, 12), jnp.float32), mesh)
    key = replicate(jax.random.PRNGKey(1), mesh)

    step = make_sharded_train_step(mods, top_k=2, batch_denom=B, mesh=mesh)
    text = step.lower(pN, oN, data, target, desc, key).compile().as_text()
    ops = collective_ops(text)
    kinds = {k for k, _ in ops}

    assert "all-reduce" in kinds, ops
    # The largest Megatron-sharded parameter in this config is the
    # sender image_layer kernel (32 x 16 f32 = 2048 B full). A
    # placement regression that re-replicates sharded params would
    # all-gather each one (and its gradient/accumulators) every step.
    sharded_full = 32 * 16 * 4
    gathers = [b for k, b in ops if k == "all-gather"]
    assert all(b < sharded_full for b in gathers), ops
    # Global collective byte volume stays bounded by the replicated
    # gradient vector + activation psums (batch x img_h activations).
    pbytes = _param_bytes(params)
    act_bytes = B * 16 * 4 * cfg.max_exchange * 4
    total = sum(b for _, b in ops)
    assert total <= 1.5 * pbytes + act_bytes, (total, pbytes, ops)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_tp_class_sharded_head_stays_sharded():
    """Class-axis tensor parallelism of the receiver prediction head
    (desc sharded dim 0 over the model axis, parallel/tensor.py): the
    compiled per-device program must hold only its class shard —

    * the ``(B, D, hid)`` relu intermediate (the big game's declared
      bandwidth center) appears ONLY at its local class width; its
      full-width form appearing anywhere means GSPMD silently
      re-replicated the head and the sharding saves nothing;
    * nothing all-gathers the full description matrix (sized here to be
      the largest single tensor, so a root re-replication is
      unambiguous in the byte audit);
    * total collective bytes stay bounded by the grad all-reduce plus
      the per-turn softmax/mixing collectives the placement predicts.
    """
    from multimodalgame_tpu.parallel.tensor import (class_axis_placer,
                                                    init_tp_opt_states,
                                                    make_mesh_2d,
                                                    shard_params_tp)
    # wv_dim=256 makes desc (10, 256) the largest tensor; D=10 over a
    # 2-way model axis gives distinctive local shapes (D/2 = 5).
    cfg = GameConfig(img_feat_dim=32, img_h_dim=16, sender_out_dim=8,
                     rec_w_dim=8, rec_hidden=16, wv_dim=256,
                     max_exchange=3, baseline_hid_dim=16,
                     fixed_exchange=False, entropy_s=0.08,
                     entropy_sen=0.01, entropy_rec=0.01)
    mods = AgentModules(cfg)
    params = init_params(mods, jax.random.PRNGKey(0), num_classes=10)
    mesh = make_mesh_2d(4, 2)
    pN = shard_params_tp(params, mesh)
    oN = init_tp_opt_states(cfg, pN, mesh)

    B = 16
    rng = np.random.RandomState(0)
    data = shard_batch(jnp.asarray(rng.randn(B, 32), jnp.float32), mesh)
    target = shard_batch(jnp.asarray(rng.randint(0, 10, size=B)), mesh)
    desc = class_axis_placer(mesh)(
        jnp.asarray(rng.randn(10, 256), jnp.float32))
    key = replicate(jax.random.PRNGKey(1), mesh)

    step = make_sharded_train_step(mods, top_k=2, batch_denom=B, mesh=mesh)
    text = step.lower(pN, oN, data, target, desc, key).compile().as_text()

    # Local shapes: batch 16/4 = 4 per data shard, classes 10/2 = 5 per
    # model shard, hid 16. The head intermediate exists only locally.
    assert "f32[4,5,16]" in text, "class-local (B,D,hid) head missing"
    assert "f32[4,10,16]" not in text, (
        "full-width (B,D,hid) intermediate materialized — the head was "
        "silently re-replicated")

    ops = collective_ops(text)
    desc_full = 10 * 256 * 4
    gathers = [b for k, b in ops if k == "all-gather"]
    assert all(b < desc_full for b in gathers), ops
    # Volume bound: grad all-reduce (<= params once) + per-turn
    # softmax/mixing/score collectives (O(B*(D+hid)) each) + scalar
    # metric psums.
    pbytes = _param_bytes(params)
    turn_bytes = B * (10 + 16 + 256) * 4 * cfg.max_exchange * 4
    total = sum(b for _, b in ops)
    assert total <= 1.5 * pbytes + turn_bytes, (total, pbytes, ops)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_population_chunk_has_zero_collectives():
    """Members are independent: the population-sharded chunk must
    compile to NO collectives at all — any all-reduce/all-gather here
    means the member axis leaked into a cross-member reduction."""
    from multimodalgame_tpu.parallel.population import (
        init_population, init_population_opt_states,
        make_population_train_step, shard_population,
        shard_population_keys, split_population_keys)
    cfg, mods, _ = _setup()
    mesh = make_mesh(N_DEV)
    n_pop, K, B = 2 * N_DEV, 2, 8
    pparams = shard_population(
        init_population(mods, jax.random.PRNGKey(0), n_pop,
                        num_classes=5), mesh)
    popts = shard_population(init_population_opt_states(cfg, pparams),
                             mesh)
    rng = np.random.RandomState(0)
    data = replicate(jnp.asarray(rng.randn(K, B, 32), jnp.float32), mesh)
    target = replicate(jnp.asarray(rng.randint(0, 5, size=(K, B))), mesh)
    desc = replicate(jnp.asarray(rng.randn(5, 12), jnp.float32), mesh)
    keys = shard_population_keys(
        split_population_keys(jax.random.PRNGKey(1), K, n_pop), mesh)

    chunk = make_population_train_step(mods, top_k=2, batch_denom=B)
    text = chunk.lower(pparams, popts, data, target, desc,
                       keys).compile().as_text()
    ops = collective_ops(text)
    assert ops == [], ops
