"""Multi-host (multi-process) data parallelism, tested without hardware:
two CPU processes with 2 virtual devices each form a 4-device global mesh
over gloo collectives and must reproduce the single-process result
exactly (VERDICT round-1 item #5)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # see pytest.ini: `-m "not slow"` is the fast subset


_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _worker_env(n_local: int) -> dict:
    env = dict(os.environ)
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_local}"
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    # Hermetic CPU workers: some images boot a TPU PJRT client into
    # every python process via a sitecustomize hook gated on this env
    # var (ignoring JAX_PLATFORMS). Two simultaneous TPU clients hang
    # the shared device tunnel, so drop the trigger — these workers
    # must never touch an accelerator.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    return env


@pytest.fixture(scope="module")
def two_process_metrics():
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "multimodalgame_tpu.parallel.distributed",
             "--coordinator", f"127.0.0.1:{port}",
             "--num-processes", "2", "--process-id", str(i)],
            env=_worker_env(2), cwd=_REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for i in range(2)]
    outs = []
    try:
        for p in procs:
            stdout, stderr = p.communicate(timeout=300)
            assert p.returncode == 0, f"worker failed:\n{stderr[-3000:]}"
            outs.append(json.loads(stdout.strip().splitlines()[-1]))
    finally:
        # A timed-out/failed handshake must not strand workers holding
        # the coordinator port (the CLAUDE.md leaked-worker hazard).
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    return outs


def test_two_process_dryrun_agrees_across_processes(two_process_metrics):
    a, b = sorted(two_process_metrics, key=lambda o: o["process_id"])
    assert a["global_devices"] == b["global_devices"] == 4
    # Metrics are replicated outputs of one SPMD program — identical.
    assert a["loss_rec"] == pytest.approx(b["loss_rec"], abs=1e-7)
    assert a["loss_sen"] == pytest.approx(b["loss_sen"], abs=1e-7)
    assert a["accuracy"] == pytest.approx(b["accuracy"], abs=1e-7)


def test_two_process_dryrun_matches_single_process(two_process_metrics):
    """The 2-process global mesh computes the same step as one process
    with the same 4-device mesh and the same global batch."""
    import jax
    import jax.numpy as jnp

    from multimodalgame_tpu.game.agents import AgentModules, init_params
    from multimodalgame_tpu.game.config import GameConfig
    from multimodalgame_tpu.game.train import init_opt_states
    from multimodalgame_tpu.parallel.mesh import (make_mesh,
                                                  make_sharded_train_step,
                                                  replicate, shard_batch)

    # Mirror dryrun_multihost's config/batch exactly.
    cfg = GameConfig(
        img_feat="avgpool_512", img_feat_dim=512, img_h_dim=32,
        sender_out_dim=32, rec_w_dim=32, rec_hidden=16, wv_dim=100,
        max_exchange=3, fixed_exchange=False,
        entropy_s=0.08, entropy_sen=0.01, entropy_rec=0.01,
        learning_rate=1e-4, optim_type="RMSprop")
    modules = AgentModules(cfg)
    num_classes, batch = 5, 8

    mesh = make_mesh(4)
    params = replicate(
        init_params(modules, jax.random.PRNGKey(0),
                    num_classes=num_classes), mesh)
    opts = replicate(init_opt_states(cfg, jax.device_get(params)), mesh)

    rng = np.random.RandomState(0)
    data = shard_batch(jnp.asarray(rng.randn(batch, 512), jnp.float32),
                       mesh)
    target = shard_batch(jnp.asarray(rng.randint(0, num_classes,
                                                 size=batch)), mesh)
    desc = replicate(jnp.asarray(rng.randn(num_classes, 100), jnp.float32),
                     mesh)
    key = replicate(jax.random.PRNGKey(1), mesh)

    step = make_sharded_train_step(modules, top_k=3, batch_denom=batch,
                                   mesh=mesh)
    _, _, m = step(params, opts, data, target, desc, key)

    got = two_process_metrics[0]
    assert float(m.loss_rec) == pytest.approx(got["loss_rec"], abs=2e-5)
    assert float(m.loss_sen) == pytest.approx(got["loss_sen"], abs=2e-5)
    assert float(m.accuracy) == pytest.approx(got["accuracy"], abs=1e-6)
