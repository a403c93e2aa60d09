"""Shared environment bootstrap for every recipe entry point.

Import this BEFORE anything that touches a jax backend (each entry point
does `import _env` right after putting this directory on sys.path). One
copy of three things that previously drifted across four scripts:

- puts the repo root on sys.path so `summarymixing_tpu` imports work
  when scripts run from anywhere;
- honours JAX_PLATFORMS even under the axon sitecustomize, which
  overrides the env var with its own jax.config setting (see
  .claude/skills/verify);
- sets the persistent compilation cache (compiles through the remote
  service take minutes; CLAUDE.md). CPU AOT artifacts are host-CPU
  specific (XLA warns about SIGILL on feature mismatch), so CPU runs
  use a per-host cache under /tmp while TPU runs share the repo cache.
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import jax  # noqa: E402

if os.environ.get("JAX_PLATFORMS"):
    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

from summarymixing_tpu.utils.cache import repo_cache_dir  # noqa: E402

if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    # No persistent cache on CPU: XLA:CPU AOT artifacts record
    # compile-time tuning pseudo-features (+prefer-no-gather/-scatter)
    # that never appear in host feature detection, so every cache LOAD
    # logs a SIGILL-risk error regardless of cache keying — and CPU
    # compiles of recipe-sized shapes take seconds anyway (same
    # rationale as __graft_entry__._setup_compile_cache).
    _cache = None
else:
    _cache = repo_cache_dir(_REPO)
if _cache is not None:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
