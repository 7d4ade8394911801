"""Multi-host product driver (VERDICT round-3 #1): the chunked CLI
training driver running across 2 CPU processes (4 virtual devices each —
an 8-device global mesh over gloo collectives) must reproduce the
single-process ``-mesh 8`` run: same final checkpoint parameters, same
log artifacts, through several log/dev/save windows including the
deferred-payload, dev-sweep, and device-snapshot checkpoint paths.

All 2-process work rides ONE consolidated launch (``multihost_jobs``,
six jobs per worker — VERDICT round-4 #6): this module used to dominate
the full suite's tail with four sequential launches at up to 900 s
each."""

import json
import os
import re
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
    # Hermetic CPU workers (CLAUDE.md): never boot a TPU client.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    return env


def _base_argv(paths, log_path):
    return [
        "-experiment_name", "mh", "-model_type", "Adaptive",
        "-log_path", log_path,
        "-batch_size", "8", "-batch_size_dev", "8",
        "-rec_w_dim", "8", "-sender_out_dim", "8",
        "-img_h_dim", "16", "-rec_hidden", "16", "-baseline_hid_dim", "16",
        "-max_exchange", "3", "-max_epoch", "2",
        "-top_k_dev", "2", "-top_k_train", "2",
        "-descr_train", paths["descr"], "-descr_dev", paths["descr"],
        "-train_file", paths["train"], "-dev_file", paths["dev"],
        "-wv_dim", "16", "-glove_path", paths["glove"],
        # 12 steps (2 epochs x 6 batches): log at 0/4/8, dev at 0/6,
        # periodic device-snapshot save at 11 (the final step), sparkline
        # payloads on.
        "-log_interval", "4", "-log_dev", "6",
        "-save_after", "1", "-save_interval", "11",
        "-exchange_samples", "1",
        "-mesh", "8",
    ]


# Two flavors: plain data parallelism, and the 2-D (data, model) mesh —
# multi-host tensor parallelism (round 4): Megatron shards placed via
# put_global, checkpoints reassembled from local shards.
_EXTRA = {"dp": [], "tp": ["-mesh_model", "2"]}


def _set(argv, flag, value):
    argv = list(argv)
    argv[argv.index(flag) + 1] = str(value)
    return argv


@pytest.fixture(scope="module")
def multihost_jobs(synthetic_dataset, tmp_path_factory):
    """ONE 2-process launch running the entire multi-host surface
    in-process per worker (VERDICT round-4 #6 — this module used to cost
    four sequential 2-process launches): the dp and tp 12-step product
    runs, then the orbax save/resume protocol's two phases for each
    mesh. Jobs execute in the same deterministic order in both
    processes (collectives stay in lockstep); process spawn, jax
    import, gloo init and dataset staging amortize across all six.

    Returns ``{"main": {flavor: log_path},
               "orbax": {flavor: (log_path, p1_ckpt)}}``.
    """
    root = tmp_path_factory.mktemp("mh_all")
    port = _free_port()
    proc_flags = [["-coordinator", f"127.0.0.1:{port}",
                   "-num_processes", "2", "-process_id", str(i)]
                  for i in range(2)]
    jobs = {0: [], 1: []}
    paths = {"main": {}, "orbax": {}}
    for flavor in sorted(_EXTRA):
        log_path = str(root / ("main_" + flavor))
        os.makedirs(log_path, exist_ok=True)
        paths["main"][flavor] = log_path
        for i in range(2):
            jobs[i].append(_base_argv(synthetic_dataset, log_path)
                           + _EXTRA[flavor] + proc_flags[i])
    for flavor in sorted(_EXTRA):
        log_path = str(root / ("orbax_" + flavor))
        os.makedirs(log_path, exist_ok=True)
        # Process 1's checkpoint path deliberately does NOT exist (real
        # hosts have separate filesystems): the resume verdict and state
        # must be process 0's, broadcast.
        p1_ckpt = str(root / ("p1_fs_" + flavor) / "ckpt")
        os.makedirs(os.path.dirname(p1_ckpt), exist_ok=True)
        paths["orbax"][flavor] = (log_path, p1_ckpt)
        for i in range(2):
            base = (_set(_base_argv(synthetic_dataset, log_path),
                         "-save_interval", 5)
                    + ["-ckpt_format", "orbax"] + _EXTRA[flavor]
                    + proc_flags[i])
            if i == 1:
                base = base + ["-checkpoint", p1_ckpt]
            # Phase A: 1 epoch, periodic orbax save at t=5. Phase B:
            # auto-resume at 5, replay max_epoch=2 full epochs to t=17.
            jobs[i].append(_set(base, "-max_epoch", 1))
            jobs[i].append(_set(base, "-max_epoch", 2))
    worker = os.path.join(_REPO, "tests", "_mh_worker.py")
    procs = []
    for i in range(2):
        jobs_file = str(root / f"jobs_{i}.json")
        with open(jobs_file, "w") as f:
            json.dump(jobs[i], f)
        procs.append(subprocess.Popen(
            [sys.executable, worker, jobs_file],
            env=_worker_env(4), cwd=_REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    errs = []
    try:
        for p in procs:
            _, stderr = p.communicate(timeout=1800)
            errs.append(stderr)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    for p, stderr in zip(procs, errs):
        assert p.returncode == 0, f"worker failed:\n{stderr[-4000:]}"
    return paths


def _log_body(path):
    """(line-kind, numeric values) pairs from 'Starting epoch: 0' on,
    timestamps stripped — the comparable artifact stream (mesh banner
    excluded: it names the platform). Same normalization as
    test_mesh_driver._log_numbers."""
    rows = []
    for ln in open(path).read().splitlines():
        if "Data-parallel mesh" in ln or ln.rstrip().endswith("model (cpu)"):
            continue
        msg = ln.split(": ", 1)[-1]
        kind = re.sub(r"[-+]?\d+\.?\d*(e[-+]?\d+)?", "#", msg)
        # Wall-clock timing lines are run-specific by nature: compare
        # their structure (kind) but not their values.
        vals = ([] if "step timing" in ln else
                [float(v) for v in re.findall(
                    r"[-+]?\d+\.\d+(?:e[-+]?\d+)?", msg)])
        rows.append((ln, kind, vals))
    start = next(i for i, (raw, _, _) in enumerate(rows)
                 if "Starting epoch" in raw)
    return [(k, v) for _, k, v in rows[start:]]


@pytest.mark.parametrize("flavor", sorted(_EXTRA))
def test_multihost_matches_single_process(multihost_jobs, synthetic_dataset,
                                          tmp_path, flavor):
    """Final checkpoint parameters and the full log-artifact stream of
    the 2-process run match a single-process run of the same config and
    mesh shape (up to cross-process psum reassociation) — for both the
    data-parallel mesh and the 2-D (data, model) tensor-parallel one
    (whose checkpoints exercise the cross-process Megatron-shard
    reassembly in utils/checkpoint.py)."""
    import jax

    from multimodalgame_tpu.config import (finalize_flags, make_flags,
                                           parse_args)
    from multimodalgame_tpu.data.descriptions import load_descriptions
    from multimodalgame_tpu.game.agents import AgentModules, init_params
    from multimodalgame_tpu.game.config import GameConfig
    from multimodalgame_tpu.game.train import init_opt_states
    from multimodalgame_tpu.train import run
    from multimodalgame_tpu.utils.checkpoint import load_checkpoint

    mh_log_path = multihost_jobs["main"][flavor]
    extra = _EXTRA[flavor]

    # Single-process reference with the same flags (own artifact dir).
    argv = _base_argv(synthetic_dataset, str(tmp_path / "one")) + extra
    f_one = make_flags()
    parse_args(f_one, argv)
    finalize_flags(f_one, argv)
    os.makedirs(f_one.log_path, exist_ok=True)
    r_one = run(f_one)
    assert r_one["step"] == 12

    # Load both step-11 periodic checkpoints (written after the final
    # optimizer update; process 0 owns the multi-host file).
    f_mh = make_flags()
    argv_mh = _base_argv(synthetic_dataset, mh_log_path) + extra
    parse_args(f_mh, argv_mh)
    finalize_flags(f_mh, argv_mh)
    cfg = GameConfig.from_flags(f_mh)
    mods = AgentModules(cfg)
    pack = load_descriptions(synthetic_dataset["descr"], "fake", 16)
    template_p = init_params(mods, jax.random.PRNGKey(0),
                             num_classes=pack.num_classes)
    template_o = init_opt_states(cfg, template_p)
    data_mh, p_mh, _ = load_checkpoint(f_mh.checkpoint, template_p,
                                       template_o)
    data_one, p_one, _ = load_checkpoint(f_one.checkpoint, template_p,
                                         template_o)
    assert data_mh["step"] == data_one["step"] == 11

    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(p_one),
            jax.tree_util.tree_leaves_with_path(p_mh)):
        label = jax.tree_util.keystr(pa)
        if "y2']['bias" in label:  # zero-gradient noise walk (mesh tests)
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-5, err_msg=label)

    # Log artifacts: process 0's stream matches the single-process run
    # line-kind-for-line-kind with near-identical numbers; process 1
    # produced the identical stream to its own file.
    body_one = _log_body(f_one.log_file)
    body_p0 = _log_body(f_mh.log_file)
    body_p1 = _log_body(f_mh.log_file + ".p1")
    assert [k for k, _ in body_p0] == [k for k, _ in body_one]
    assert body_p1 == body_p0
    for (k, va), (_, vb) in zip(body_p0, body_one):
        assert len(va) == len(vb), k
        np.testing.assert_allclose(va, vb, rtol=2e-2, atol=2e-3,
                                   err_msg=k)

    # The best checkpoint exists and only process 0 wrote artifacts
    # other than the per-process logs.
    assert os.path.exists(f_mh.checkpoint + "_best")
    assert os.path.exists(f_mh.log_file + ".p1")
    assert not os.path.exists(f_mh.checkpoint + ".p1")


def test_multihost_flag_validation(synthetic_dataset, tmp_path):
    from multimodalgame_tpu.config import (finalize_flags, make_flags,
                                           parse_args)
    from multimodalgame_tpu.train import run

    def flags_for(extra):
        argv = _base_argv(synthetic_dataset, str(tmp_path / "v"))
        argv = [a for a in argv]  # copy
        f = make_flags()
        parse_args(f, argv + extra)
        finalize_flags(f, argv + extra)
        return f

    with pytest.raises(ValueError, match="coordinator"):
        run(flags_for(["-num_processes", "2"]))
    # (-mesh_model + -num_processes is a SUPPORTED combination since
    # round 4 — exercised end-to-end by the "tp" multihost_jobs flavor.)


def test_multihost_orbax_resume(multihost_jobs, synthetic_dataset,
                                tmp_path):
    """Orbax checkpoints + auto-resume under multi-process, for both the
    data-parallel and the 2-D tensor-parallel mesh:

    * only process 0 calls into orbax, whose save/restore open with
      global sync barriers — restricted to the active set {0}
      (utils/checkpoint.py), else the first periodic save deadlocks
      waiting on processes that never call it;
    * the resume decision and the loaded state are process 0's,
      broadcast: process 1's checkpoint path deliberately does NOT
      exist (hosts have separate filesystems), yet both processes
      resume at the same step with process 0's exact params and
      best_dev_acc (a per-process exists() gate would diverge the job);
    * pinned equal to a single-process -mesh 8 run that saved and
      resumed at the same point (the RNG chain restarts at resume, so
      the reference must resume too).

    Resume semantics are the REFERENCE's replay contract (reference
    model.py:1149-1156 restores step only; model.py:1190 counts epochs
    0..max_epoch-1 regardless — mirrored at game/driver.py and
    train.py): phase A trains 1 epoch (steps 0..5, periodic orbax save
    at t=5); phase B restores step=5 and replays max_epoch=2 FULL
    epochs (t=5..16), finishing at step 17 with periodic saves at 5,
    10 and 15 — NOT a global-schedule resume that would stop at 12.

    The 2-process phases ride the module's single consolidated launch
    (``multihost_jobs``); this test only verifies their artifacts
    against an in-process single-process reference.
    """
    pytest.importorskip("orbax.checkpoint")
    import jax

    from multimodalgame_tpu.config import (finalize_flags, make_flags,
                                           parse_args)
    from multimodalgame_tpu.data.descriptions import load_descriptions
    from multimodalgame_tpu.game.agents import AgentModules, init_params
    from multimodalgame_tpu.game.config import GameConfig
    from multimodalgame_tpu.game.train import init_opt_states
    from multimodalgame_tpu.train import run
    from multimodalgame_tpu.utils.checkpoint import load_checkpoint

    orbax = ["-ckpt_format", "orbax"]

    # Single-process reference (computed once; DP and TP agree within
    # the cross-mesh tolerance): save at t=5 of a 1-epoch run, resume,
    # replay 2 full epochs, finish at t=17 (last periodic save t=15).
    one_path = str(tmp_path / "one")
    os.makedirs(one_path, exist_ok=True)
    argv_a = _set(_set(_base_argv(synthetic_dataset, one_path),
                       "-max_epoch", 1), "-save_interval", 5) + orbax
    f_a = make_flags()
    parse_args(f_a, argv_a)
    finalize_flags(f_a, argv_a)
    r_a = run(f_a)
    assert r_a["step"] == 6
    argv_b = _set(argv_a, "-max_epoch", 2)
    f_b = make_flags()
    parse_args(f_b, argv_b)
    finalize_flags(f_b, argv_b)
    r_one = run(f_b)
    assert r_one["step"] == 17
    assert "Loaded at step: 5" in open(f_b.log_file).read()

    cfg = GameConfig.from_flags(f_b)
    mods = AgentModules(cfg)
    pack = load_descriptions(synthetic_dataset["descr"], "fake", 16)
    template_p = init_params(mods, jax.random.PRNGKey(0),
                             num_classes=pack.num_classes)
    template_o = init_opt_states(cfg, template_p)
    data_one, p_one, _ = load_checkpoint(f_b.checkpoint, template_p,
                                         template_o)
    assert data_one["step"] == 15

    for variant, extra in sorted(_EXTRA.items()):
        root, p1_ckpt = multihost_jobs["orbax"][variant]
        f_mh = make_flags()
        argv_mh = _set(_set(_base_argv(synthetic_dataset, root),
                            "-max_epoch", 2), "-save_interval", 5) + orbax
        parse_args(f_mh, argv_mh + extra)
        finalize_flags(f_mh, argv_mh + extra)
        assert os.path.isdir(f_mh.checkpoint), variant
        data_mh, p_mh, _ = load_checkpoint(f_mh.checkpoint, template_p,
                                           template_o)
        assert data_mh["step"] == 15, variant
        for (pa, a), (_, b) in zip(
                jax.tree_util.tree_leaves_with_path(p_one),
                jax.tree_util.tree_leaves_with_path(p_mh)):
            label = variant + jax.tree_util.keystr(pa)
            if "y2']['bias" in label:  # zero-gradient noise walk
                continue
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-3, atol=1e-5, err_msg=label)
        # Process 1 followed process 0's broadcast resume verdict even
        # though ITS checkpoint path never existed — and never wrote it.
        p1_log = open(f_mh.log_file + ".p1").read()
        assert "Loading from: " + p1_ckpt in p1_log, variant
        assert "Loaded at step: 5" in p1_log, variant
        assert not os.path.exists(p1_ckpt), variant
