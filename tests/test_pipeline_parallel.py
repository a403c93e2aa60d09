"""Pipeline parallelism: staged GPipe schedule == sequential layer stack.

The reference is DP-only (SURVEY.md §2.4); parallel/pipeline.py adds the
depth-scaling path. These tests run on the 8-virtual-CPU-device mesh and
assert the ppermute microbatch schedule produces exactly the sequential
result, composed with data parallelism on the same mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from summarymixing_tpu.models.branchformer import BranchformerEncoder
from summarymixing_tpu.parallel.pipeline import (
    make_pipeline_mesh,
    pipeline_branchformer_encode,
)


def _encoder(num_layers=8):
    return BranchformerEncoder(
        num_layers=num_layers, d_model=16, nhead=2, kernel_size=5,
        dropout_rate=0.0, attention_type="SummaryMixing",
        csgu_linear_units=32, local_proj_hid_dim=(16,),
        local_proj_out_dim=16, summary_hid_dim=(16,), summary_out_dim=16,
        mode="SummaryMixing", scan_layers=True,
    )


def _data(rng, b=8, t=24, d=16):
    x = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    # lengths that differ BETWEEN microbatches, not only within one: a
    # repeating within-microbatch pattern made every microbatch's pad
    # identical and hid a bug where stages applied the ingest step's pad
    # to every in-flight microbatch
    lens = t - (np.arange(b) % (t // 2))
    pad = (jnp.arange(t)[None, :] < jnp.asarray(lens)[:, None]).astype(
        jnp.float32
    )  # [B, T], the encoder-level mask convention (asr.py length_to_mask)
    return x, pad


@pytest.mark.parametrize("n_micro,b", [(4, 8), (8, 16)])
def test_pipeline_matches_sequential(rng, n_micro, b):
    enc = _encoder(num_layers=8)
    x, pad = _data(rng, b=b)
    params = enc.init(jax.random.PRNGKey(0), x, None, pad)["params"]
    ref = enc.apply({"params": params}, x, None, pad)

    mesh = make_pipeline_mesh(n_data=2, n_pipe=4)
    pp = pipeline_branchformer_encode(enc, mesh, n_micro=n_micro)
    out = pp(params, x, None, pad)

    assert out.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-6
    )


def test_pipeline_single_stage_degenerates(rng):
    """n_pipe=1: the schedule reduces to plain microbatched execution."""
    enc = _encoder(num_layers=3)
    x, pad = _data(rng, b=16)
    params = enc.init(jax.random.PRNGKey(0), x, None, pad)["params"]
    ref = enc.apply({"params": params}, x, None, pad)

    mesh = make_pipeline_mesh(n_data=8, n_pipe=1)
    out = pipeline_branchformer_encode(enc, mesh, n_micro=2)(
        params, x, None, pad
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-6
    )


def test_pipeline_rejects_bad_partitions(rng):
    enc = _encoder(num_layers=6)
    x, pad = _data(rng, b=8)
    params = enc.init(jax.random.PRNGKey(0), x, None, pad)["params"]
    mesh = make_pipeline_mesh(n_data=2, n_pipe=4)
    pp = pipeline_branchformer_encode(enc, mesh, n_micro=4)
    with pytest.raises(ValueError, match="not divisible by pipe"):
        pp(params, x, None, pad)  # 6 layers over 4 stages
    with pytest.raises(ValueError, match="not divisible by n_micro"):
        pipeline_branchformer_encode(_encoder(4), mesh, n_micro=3)(
            _encoder(4).init(jax.random.PRNGKey(0), x, None, pad)["params"],
            x, None, pad,
        )


def test_pipeline_training_mode_dropout(rng):
    """rng= threads training-mode dropout: independent per (microbatch,
    layer), deterministic given the key, different from the eval path,
    and with finite gradients."""
    enc = BranchformerEncoder(
        num_layers=4, d_model=16, nhead=2, kernel_size=5,
        dropout_rate=0.3, attention_type="SummaryMixing",
        csgu_linear_units=32, local_proj_hid_dim=(16,),
        local_proj_out_dim=16, summary_hid_dim=(16,), summary_out_dim=16,
        mode="SummaryMixing", scan_layers=True,
    )
    x, pad = _data(rng, b=8)
    params = enc.init(jax.random.PRNGKey(0), x, None, pad)["params"]
    mesh = make_pipeline_mesh(n_data=2, n_pipe=4)
    pp = pipeline_branchformer_encode(enc, mesh, n_micro=4)

    key = jax.random.PRNGKey(42)
    out_train = pp(params, x, None, pad, rng=key)
    out_train2 = pp(params, x, None, pad, rng=key)
    out_eval = pp(params, x, None, pad)
    np.testing.assert_array_equal(np.asarray(out_train),
                                  np.asarray(out_train2))
    assert not np.allclose(np.asarray(out_train), np.asarray(out_eval))
    # different key -> different masks
    out_k2 = pp(params, x, None, pad, rng=jax.random.PRNGKey(7))
    assert not np.allclose(np.asarray(out_train), np.asarray(out_k2))

    g = jax.grad(
        lambda p: jnp.sum(pp(p, x, None, pad, rng=key) ** 2)
    )(params)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))


def test_pipeline_under_jit_and_grad(rng):
    """The schedule is jittable and differentiable (all lax ops): a loss
    through the pipelined stack has finite grads matching the sequential
    stack's."""
    enc = _encoder(num_layers=4)
    x, pad = _data(rng, b=4)
    params = enc.init(jax.random.PRNGKey(0), x, None, pad)["params"]
    mesh = make_pipeline_mesh(n_data=2, n_pipe=4)
    pp = pipeline_branchformer_encode(enc, mesh, n_micro=2)

    def loss_pp(p):
        return jnp.sum(pp(p, x, None, pad) ** 2)

    def loss_seq(p):
        return jnp.sum(enc.apply({"params": p}, x, None, pad) ** 2)

    g_pp = jax.jit(jax.grad(loss_pp))(params)
    g_seq = jax.grad(loss_seq)(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5
        ),
        g_pp, g_seq,
    )
