"""Fused cgMLP-branch Pallas kernel vs the flax ConvolutionBranch oracle
(interpret mode on CPU; the on-chip benchmark lives in
benchmarks/pallas_csgu_bench.py)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from summarymixing_tpu.ops.convolution import ConvolutionBranch
from summarymixing_tpu.ops.pallas_csgu import fused_convolution_branch

gelu_tanh = functools.partial(jax.nn.gelu, approximate=True)


def _branch(d=16, units=32, k=5):
    return ConvolutionBranch(
        input_size=d, linear_units=units, kernel_size=k,
        activation=gelu_tanh, dropout_rate=0.0,
    )


@pytest.mark.parametrize("t,tile", [(24, 8), (20, 8), (8, 8)])
def test_fused_matches_flax(rng, t, tile):
    d, units, k = 16, 32, 5
    branch = _branch(d, units, k)
    x = jnp.asarray(rng.standard_normal((2, t, d)), jnp.float32)
    params = branch.init(jax.random.PRNGKey(0), x)["params"]
    want = branch.apply({"params": params}, x)
    got = fused_convolution_branch(x, None, params, kernel_size=k,
                                   tile=tile, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_fused_respects_pad_mask(rng):
    d, units, k, t = 16, 32, 5, 16
    branch = _branch(d, units, k)
    x = jnp.asarray(rng.standard_normal((2, t, d)), jnp.float32)
    params = branch.init(jax.random.PRNGKey(0), x)["params"]
    lens = jnp.asarray([16, 9])
    mask = (jnp.arange(t)[None, :] < lens[:, None]).astype(jnp.float32)
    want = branch.apply({"params": params}, x, pad_mask=mask)
    got = fused_convolution_branch(x, mask, params, kernel_size=k, tile=8,
                                   interpret=True)
    # valid frames must match; the flax path also masks the conv INPUT so
    # frames near the boundary agree exactly
    for b in range(2):
        n = int(lens[b])
        np.testing.assert_allclose(np.asarray(got)[b, :n],
                                   np.asarray(want)[b, :n],
                                   atol=2e-5, rtol=2e-5)


def test_fused_padding_invariance(rng):
    """Output for valid frames must not change when padding grows."""
    d, units, k = 16, 32, 5
    branch = _branch(d, units, k)
    x = jnp.asarray(rng.standard_normal((1, 12, d)), jnp.float32)
    params = branch.init(jax.random.PRNGKey(0), x)["params"]
    mask12 = jnp.ones((1, 12), jnp.float32)
    y12 = fused_convolution_branch(x, mask12, params, kernel_size=k,
                                   tile=8, interpret=True)
    x24 = jnp.pad(x, ((0, 0), (0, 12), (0, 0)),
                  constant_values=7.7)  # poison padding
    mask24 = jnp.pad(mask12, ((0, 0), (0, 12)))
    y24 = fused_convolution_branch(x24, mask24, params, kernel_size=k,
                                   tile=8, interpret=True)
    np.testing.assert_allclose(np.asarray(y24)[:, :12], np.asarray(y12),
                               atol=2e-5, rtol=2e-5)
