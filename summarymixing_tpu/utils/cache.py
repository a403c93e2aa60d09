"""Persistent-compile-cache path selection (one copy for every entry
point: recipes/_env.py, __graft_entry__.py, benchmarks).

TPU runs share the repo-level `.jax_cache` (compiles through the remote
service take minutes — CLAUDE.md). CPU runs must NOT share it across
machines: XLA:CPU AOT artifacts are machine-feature specific and the
loader only *warns* about mismatches before risking SIGILL. The cache
key is therefore hostname + a fingerprint of /proc/cpuinfo flags —
containers here migrate between physical hosts that keep the same
hostname (observed: cpu_aot_loader feature-mismatch warnings after a
migration), so hostname alone is not a stable key.
"""

from __future__ import annotations

import hashlib
import os
import platform


def cpu_cache_dir() -> str:
    """Per-(host, CPU-generation) JAX compile cache dir under /tmp."""
    try:
        fp = "na"
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    fp = hashlib.md5(line.encode()).hexdigest()[:8]
                    break
    except OSError:
        fp = "na"
    return os.path.join("/tmp", f"jax_cache_cpu_{platform.node()}_{fp}")


def repo_cache_dir(repo_root: str) -> str:
    """The shared on-disk cache for TPU compiles."""
    return os.path.join(repo_root, ".jax_cache")
