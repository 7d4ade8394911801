"""Benchmark entry point (driver-invoked).

Measures training throughput of the flagship Adaptive model at the
reference README's canonical scale (batch 64, 32-bit messages, sender
hidden 256, receiver hidden 64, max_exchange 10, 30 classes) on the
available accelerator using the device-side multi-step trainer
(``make_multistep_train_step`` — one compiled program per K updates), and
reports the ratio against the measured eager-torch CPU baseline
(benchmarks/torch_reference_bench.py, cached in BASELINE_MEASURED.json).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.abspath(__file__))

# Persistent XLA compilation cache: first run (or a new topology) pays the
# compile; subsequent runs start instantly.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_REPO, ".jax_cache"))


def measure_tpu_steps_per_sec(chunk_steps: int = 50,
                              num_chunks: int = 20) -> float:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    from multimodalgame_tpu.game.agents import AgentModules, init_params
    from multimodalgame_tpu.game.config import GameConfig
    from multimodalgame_tpu.game.train import (init_opt_states,
                                               make_multistep_train_step)

    cfg = GameConfig(
        img_feat="avgpool_512", img_feat_dim=512, img_h_dim=256,
        sender_out_dim=32, rec_w_dim=32, rec_hidden=64, wv_dim=100,
        max_exchange=10, fixed_exchange=False,
        entropy_s=0.08, entropy_sen=0.01, entropy_rec=0.01,
        learning_rate=1e-4, optim_type="RMSprop")
    modules = AgentModules(cfg)
    num_classes, batch = 30, 64

    params = init_params(modules, jax.random.PRNGKey(0),
                         num_classes=num_classes)
    opt_states = init_opt_states(cfg, params)
    chunk = make_multistep_train_step(modules, top_k=6, batch_denom=batch)

    rng = np.random.RandomState(0)
    data = jnp.asarray(
        np.broadcast_to(rng.randn(batch, 512),
                        (chunk_steps, batch, 512)).copy(), jnp.float32)
    target = jnp.asarray(
        np.broadcast_to(rng.randint(0, num_classes, size=batch),
                        (chunk_steps, batch)).copy())
    desc = jnp.asarray(rng.randn(num_classes, 100), jnp.float32)

    def keys(seed):
        return jax.random.split(jax.random.PRNGKey(seed), chunk_steps)

    # Warmup / compile. Force a host transfer for synchronization —
    # block_until_ready is unreliable under the axon tunnel.
    params, opt_states, m = chunk(params, opt_states, data, target, desc,
                                  keys(100))
    float(m.loss_rec[-1])

    t0 = time.perf_counter()
    for i in range(num_chunks):
        params, opt_states, m = chunk(params, opt_states, data, target,
                                      desc, keys(i))
    float(m.loss_rec[-1])  # forces execution of the full chunk chain
    elapsed = time.perf_counter() - t0
    return num_chunks * chunk_steps / elapsed


def load_or_measure_baseline() -> float:
    path = os.path.join(_REPO, "BASELINE_MEASURED.json")
    if os.path.exists(path):
        with open(path) as f:
            return float(json.load(f)["value"])
    bench = os.path.join(_REPO, "benchmarks", "torch_reference_bench.py")
    out = subprocess.run([sys.executable, bench, "10"],
                         capture_output=True, text=True, timeout=600)
    return float(json.loads(out.stdout.strip().splitlines()[-1])["value"])


def main() -> None:
    value = measure_tpu_steps_per_sec()
    baseline = load_or_measure_baseline()
    print(json.dumps({
        "metric": "adaptive_train_steps_per_sec",
        "value": round(value, 2),
        "unit": "steps/s",
        "vs_baseline": round(value / baseline, 2),
    }))


if __name__ == "__main__":
    main()
