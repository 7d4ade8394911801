"""Test configuration: force an 8-device virtual CPU platform so
multi-chip sharding paths are exercised without TPU hardware (the standard
JAX fake-backend technique, SURVEY §4c)."""

import os

# This image preloads jax at interpreter startup (an `axon` usercustomize
# hook), so setting JAX_PLATFORMS via os.environ here is too late — the
# config already read the environment. XLA_FLAGS is still honored because
# the backend itself initializes lazily, and jax.config.update works any
# time before first device use.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: OFF unless JAX_COMPILATION_CACHE_DIR is
# explicitly set — reloading XLA:CPU AOT entries ABORTS the process on
# some hosts, even entries the same machine wrote (compile_cache.py).
from multimodalgame_tpu.utils import compile_cache  # noqa: E402

compile_cache.configure(jax, os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def synthetic_dataset(tmp_path_factory):
    from multimodalgame_tpu.data.synthetic import build_synthetic_dataset
    root = tmp_path_factory.mktemp("synth")
    return build_synthetic_dataset(str(root), num_classes=6,
                                   train_per_class=8, dev_per_class=4,
                                   wv_dim=16, seed=0)


