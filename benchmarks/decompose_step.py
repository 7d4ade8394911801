"""Decompose the fused multi-step train chunk's per-step cost on TPU.

Measures, with the marginal-cost method (PERFORMANCE.md — time n1 and n2
chunks ending in a forced host transfer and divide the difference):

  full      — the production chunk (grads + 4 optimizers + metrics)
  no_opt    — grads computed, optimizer updates skipped
  no_metric — full updates, ScanMetrics replaced by one scalar
  fwd_only  — phase A sampled conversation alone (no grad, no update)

Run: python benchmarks/decompose_step.py
"""

from __future__ import annotations

import functools
import json
import os
import time

import numpy as np

import jax                                                  # noqa: E402

from multimodalgame_tpu.utils import compile_cache          # noqa: E402

compile_cache.configure(jax, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import jax.numpy as jnp                                     # noqa: E402

from multimodalgame_tpu.game.agents import AgentModules, init_params  # noqa: E402
from multimodalgame_tpu.game.config import GameConfig       # noqa: E402
from multimodalgame_tpu.game.exchange import exchange       # noqa: E402
from multimodalgame_tpu.game.train import (                 # noqa: E402
    AGENT_NAMES, _loss_fn_for, build_optimizer, init_opt_states,
    make_multistep_train_step)

BATCH = 64
K = 50


def flagship_cfg():
    return GameConfig(
        img_feat="avgpool_512", img_feat_dim=512, img_h_dim=256,
        sender_out_dim=32, rec_w_dim=32, rec_hidden=64, wv_dim=100,
        max_exchange=10, fixed_exchange=False,
        entropy_s=0.08, entropy_sen=0.01, entropy_rec=0.01,
        learning_rate=1e-4, optim_type="RMSprop")


def staged_inputs(num_classes=30):
    rng = np.random.RandomState(0)
    data = jnp.asarray(np.broadcast_to(
        rng.randn(BATCH, 512), (K, BATCH, 512)).copy(), jnp.float32)
    target = jnp.asarray(np.broadcast_to(
        rng.randint(0, num_classes, size=BATCH), (K, BATCH)).copy())
    desc = jnp.asarray(rng.randn(num_classes, 100), jnp.float32)
    return data, target, desc


def time_chunks(run, sync, n1=4, n2=24):
    """Marginal per-chunk seconds between n1 and n2 repetitions.

    ``run(seed)`` must enqueue one chunk asynchronously (chained through
    donated carries so the device executes them back-to-back); ``sync()``
    forces one host transfer. The single end-of-trial sync is a constant
    offset and cancels in the subtraction."""
    run(0)
    sync()  # warmup/compile

    def trial(n):
        t0 = time.perf_counter()
        for i in range(n):
            run(i + 1)
        sync()
        return time.perf_counter() - t0

    t_small = min(trial(n1) for _ in range(3))
    t_big = min(trial(n2) for _ in range(3))
    return (t_big - t_small) / (n2 - n1)


def make_variant(modules, variant):
    tx = build_optimizer(modules.cfg)
    loss_fn = _loss_fn_for(modules, "auto")

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def chunk(params, opt_states, data, target, desc, keys):
        def body(carry, xs):
            params, opt_states = carry
            b_data, b_target, key = xs
            grads, m = jax.grad(
                lambda p: loss_fn(p, b_data, b_target, desc, key,
                                  None, None, None, 6, BATCH),
                has_aux=True)(params)
            new_params = dict(params)
            new_opts = dict(opt_states)
            grad_dep = 0.0
            if variant != "no_opt":
                import optax
                for name in AGENT_NAMES:
                    updates, new_opts[name] = tx.update(
                        grads[name], opt_states[name], params[name])
                    new_params[name] = optax.apply_updates(
                        params[name], updates)
            else:
                # The output must depend on the grads or XLA dead-code-
                # eliminates the whole backward pass and "no_opt" times
                # forward-only (inflating the optimizer estimate by the
                # entire VJP cost).
                grad_dep = sum(jnp.sum(l) for l in
                               jax.tree_util.tree_leaves(grads))
            out = (m.loss_rec + grad_dep if variant == "no_metric" else
                   (m.loss_rec + grad_dep, m.loss_sen, m.nll_loss,
                    m.loss_bas_rec, m.loss_bas_sen, m.accuracy))
            return (new_params, new_opts), out

        (p, o), metrics = jax.lax.scan(body, (params, opt_states),
                                       (data, target, keys))
        return p, o, metrics

    return chunk


def main():
    cfg = flagship_cfg()
    modules = AgentModules(cfg)
    data, target, desc = staged_inputs()
    params0 = init_params(modules, jax.random.PRNGKey(0), num_classes=30)
    results = {}

    # fwd_only: phase A sampled conversation alone.
    @jax.jit
    def fwd_chunk(params, data, desc, keys):
        def body(_, xs):
            b_data, key = xs
            ex = exchange(modules, params, b_data, desc, key, train=True)
            return 0, ex.stop_masks.sum()
        _, s = jax.lax.scan(body, 0, (data, keys))
        return s

    last = [None]

    def run_fwd(seed):
        last[0] = fwd_chunk(params0, data, desc,
                            jax.random.split(jax.random.PRNGKey(seed), K))

    results["fwd_only"] = time_chunks(run_fwd,
                                      lambda: float(last[0][-1]))

    for variant in ("full", "no_opt", "no_metric"):
        chunk = make_variant(modules, variant)
        state = [jax.tree_util.tree_map(jnp.copy, params0), None]
        state[1] = init_opt_states(cfg, state[0])

        def run(seed, chunk=chunk, state=state):
            state[0], state[1], m = chunk(
                state[0], state[1], data, target, desc,
                jax.random.split(jax.random.PRNGKey(seed), K))
            last[0] = m[0] if isinstance(m, tuple) else m

        results[variant] = time_chunks(run, lambda: float(last[0][-1]))

    per_step = {k: v / K * 1e6 for k, v in results.items()}
    print(json.dumps({
        "per_step_us": {k: round(v, 1) for k, v in per_step.items()},
        "steps_per_sec_full": round(1e6 / per_step["full"], 1),
        "optimizer_us": round(per_step["full"] - per_step["no_opt"], 1),
        "metrics_us": round(per_step["full"] - per_step["no_metric"], 1),
        "grad_us": round(per_step["no_opt"] - per_step["fwd_only"], 1),
    }))


if __name__ == "__main__":
    main()
