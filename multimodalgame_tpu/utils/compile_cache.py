"""Host-scoped persistent XLA compilation cache.

The repo's `.jax_cache` is shared across work sessions, but sessions hop
between machines with different CPU capabilities. XLA:CPU cache entries
are ahead-of-time compiled FOR THE MACHINE THAT WROTE THEM (the cache
key does not include host CPU features), so loading one on a host
missing those features executes illegal instructions — observed as a
hard `Fatal Python error: Aborted` (SIGABRT/SIGILL) the moment a cached
program's output is materialized, preceded only by a
`cpu_aot_loader.cc` warning that scrolls past. Scoping the cache
directory by a fingerprint of the host's CPU feature flags makes caches
from different machines coexist instead of poisoning each other. (TPU
entries are device code and would be shareable, but this backend pays
full jit compiles regardless — see CLAUDE.md — so nothing is lost by
scoping them too.)
"""

from __future__ import annotations

import hashlib
import os
import platform


def host_fingerprint() -> str:
    """A short stable id for this machine's instruction-set capabilities
    (arch + CPU feature flags)."""
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


def cache_dir(repo_root: str) -> str:
    """The host-scoped cache directory under ``<repo_root>/.jax_cache``.

    Honors an explicit ``JAX_COMPILATION_CACHE_DIR`` override (used
    as-is: an override names ONE machine's cache by definition)."""
    override = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if override:
        return override
    return os.path.join(repo_root, ".jax_cache", host_fingerprint())


def configure(jax, repo_root: str) -> None:
    """Point jax's persistent compilation cache at the host-scoped
    directory (call any time before first device use)."""
    jax.config.update("jax_compilation_cache_dir", cache_dir(repo_root))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
