"""Persistent XLA compilation cache policy: OFF unless explicitly
requested.

Two hard-won findings (round 4, after the work moved to a new machine):

* XLA:CPU cache entries are ahead-of-time compiled executables whose
  cache key does not include host CPU features — loading another
  machine's entry executes illegal instructions and hard-ABORTS the
  process (``Fatal Python error: Aborted``), preceded only by a
  ``cpu_aot_loader.cc`` warning that pytest's capture swallows.
* Worse, on some hosts reloading an entry written BY THE SAME MACHINE
  aborts identically (reproduced deterministically: compile-and-pass,
  rerun-and-abort on this box's jaxlib). The deserialization path
  itself is not trustworthy.

Since the TPU backend used here pays full jit compiles regardless of
the persistent cache (see CLAUDE.md), the cache buys nothing that
justifies a process-killing failure mode. Policy: :func:`configure` is
a no-op unless ``JAX_COMPILATION_CACHE_DIR`` is explicitly set — an
explicit override says "I know this directory is valid for this
machine" and is honored as-is, but still scoped by a host fingerprint
when it points at a shared location is the caller's concern.
"""

from __future__ import annotations

import hashlib
import os
import platform


def host_fingerprint() -> str:
    """A short stable id for this machine's instruction-set capabilities
    (arch + CPU feature flags). Kept for callers that want to scope an
    opt-in cache directory per machine."""
    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        feats = platform.processor()
    digest = hashlib.sha256(
        (platform.machine() + ":" + feats).encode()).hexdigest()[:12]
    return digest


def cache_dir(repo_root: str) -> "str | None":
    """The cache directory to use, or None for "leave the cache off".

    ``JAX_COMPILATION_CACHE_DIR`` (explicit opt-in) is honored as-is;
    otherwise the persistent cache stays disabled — see the module
    docstring for why."""
    return os.environ.get("JAX_COMPILATION_CACHE_DIR") or None


def configure(jax, repo_root: str) -> None:
    """Apply the cache policy (call any time before first device use)."""
    d = cache_dir(repo_root)
    if d is None:
        return
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
