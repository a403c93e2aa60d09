"""Pallas fused SummaryMixing kernel vs the pure-jnp reference and vs the
flax SummaryMixing module (interpret mode on CPU; the real-TPU run is
covered by bench/verify drives)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from summarymixing_tpu.ops.pallas_summary import (
    _jnp_reference,
    _pallas_forward,
    fused_summary_mixing,
    params_to_weights,
)
from summarymixing_tpu.ops.summary_mixing import SummaryMixing

from jax.experimental import pallas as pl


def _random_weights(rng, d=32, h=24, o=16, out=32):
    def w(*shape):
        return jnp.asarray(rng.standard_normal(shape) * 0.2, jnp.float32)
    return (
        w(d, h), w(h), w(h, o), w(o),          # local W1,b1,W2,b2
        w(d, h), w(h), w(h, o), w(o),          # summary S1,c1,S2,c2
        w(o, out), w(o, out), w(out),          # merge M1,M2,mb
    )


def test_kernel_matches_jnp_reference_interpret(rng):
    b, t, d = 2, 10, 32
    x = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    lens = np.array([10, 6])
    pad = jnp.asarray(
        (np.arange(t)[None, :] < lens[:, None]).astype(np.float32)
    )[..., None]
    weights = _random_weights(rng)
    want = _jnp_reference(x, pad, weights)
    with jax.disable_jit():
        import jax.experimental.pallas as _pl
        # interpret mode: run the kernel without a TPU
        from summarymixing_tpu.ops import pallas_summary as ps
        import functools
        orig = ps.pl.pallas_call
        ps.pl.pallas_call = functools.partial(orig, interpret=True)
        try:
            got = ps._pallas_forward(x, pad, weights)
        finally:
            ps.pl.pallas_call = orig
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_jnp_reference_matches_flax_module(rng):
    """The kernel's math (via its jnp twin) == the flax SummaryMixing cell
    with the same params (full mode, nhead=1)."""
    b, t, d, out = 2, 8, 32, 32
    cell = SummaryMixing(
        enc_dim=d, nhead=1, local_proj_hid_dim=(24,), local_proj_out_dim=16,
        summary_hid_dim=(24,), summary_out_dim=16, mode="SummaryMixing",
    )
    x = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    lens = np.array([8, 5])
    pad2d = jnp.asarray(
        (np.arange(t)[None, :] < lens[:, None]).astype(np.float32)
    )
    params = cell.init(jax.random.PRNGKey(0), x, pad_mask=pad2d)
    want = cell.apply(params, x, pad_mask=pad2d)

    weights = params_to_weights(params["params"], dtype=jnp.float32)
    got = _jnp_reference(x, pad2d[..., None], weights)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_custom_vjp_grad_matches_jnp(rng):
    b, t, d = 1, 6, 32
    x = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    pad = jnp.ones((b, t, 1), jnp.float32)
    weights = _random_weights(rng)

    def loss_ref(x, weights):
        return jnp.sum(_jnp_reference(x, pad, weights) ** 2)

    g_ref = jax.grad(loss_ref)(x, weights)

    # VJP of the fused op must equal the reference VJP (backward IS the
    # reference path by construction; this checks the plumbing)
    from summarymixing_tpu.ops import pallas_summary as ps
    import functools
    orig = ps.pl.pallas_call
    ps.pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        def loss_fused(x, weights):
            return jnp.sum(fused_summary_mixing(x, pad, weights) ** 2)
        g_fused = jax.grad(loss_fused)(x, weights)
    finally:
        ps.pl.pallas_call = orig
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               atol=1e-5, rtol=1e-5)
