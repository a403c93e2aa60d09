"""Test configuration: force CPU JAX with a virtual 8-device mesh so
multi-chip sharding tests run anywhere (SURVEY.md §4 item 6).

Note: this environment pre-imports jax via a sitecustomize hook that
force-registers a TPU platform and overrides JAX_PLATFORMS — env vars alone
are NOT enough; we must override jax.config before first backend use.
"""

import os

import re

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
else:
    # an ambient count != 8 would make every 8-device mesh test fail
    # far from the cause; override it rather than keep it
    os.environ["XLA_FLAGS"] = re.sub(
        r"--xla_force_host_platform_device_count=\d+",
        "--xla_force_host_platform_device_count=8", _flags)
# The ambient environment carries JAX_PLATFORMS=axon (the TPU tunnel);
# recipe modules honour that env var at import time, so an in-process
# `import recipes.*` would flip the backend back to the TPU mid-suite.
# Pin the env var as well as the config.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Parity tests compare against torch fp32; keep matmuls at full precision.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(666)
