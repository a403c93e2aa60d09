"""Persistent-compile-cache path selection (one copy for every entry
point: recipes/_env.py, __graft_entry__.py, benchmarks).

TPU runs share the repo-level `.jax_cache` (compiles through the remote
service take minutes — CLAUDE.md). CPU runs use NO persistent cache at
all: XLA:CPU AOT artifacts record compile-time tuning pseudo-features
(+prefer-no-gather/-scatter) that never appear in host feature
detection, so every cache load logs a SIGILL-risk error regardless of
how the cache is keyed (a hostname+cpuinfo key was tried and the spam
persisted), and CPU compiles of recipe-sized shapes take seconds.
"""

from __future__ import annotations

import os


def repo_cache_dir(repo_root: str) -> str:
    """The shared on-disk cache for TPU compiles."""
    return os.path.join(repo_root, ".jax_cache")
