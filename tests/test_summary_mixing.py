"""SummaryMixing cell tests: torch-oracle parity, shape, and mask properties.

Mirrors and extends the reference test strategy
(reference tests/unittests/test_summary_mixing.py — shape test :5-57,
golden-value test :60-153) per SURVEY.md §4.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from summarymixing_tpu.ops.summary_mixing import SummaryMixing, laplace_weights

from torch_oracle import (
    draw_summary_mixing,
    summary_mixing_forward,
    to_flax_params,
)

MODES = [
    "SummaryMixing",
    "SummaryMixing-lite",
    "SummaryMixing-fast",
    "SummaryMixing-expdecay",
]


def make_cell(mode, nhead, fea=8, local_out=32, summary_out=None):
    summary_out = summary_out or fea
    return SummaryMixing(
        enc_dim=fea,
        nhead=nhead,
        local_proj_hid_dim=(32,),
        local_proj_out_dim=local_out,
        summary_hid_dim=(64,),
        summary_out_dim=summary_out,
        mode=mode,
    )


@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize("nhead", [1, 4])
def test_shape(mode, nhead, rng):
    batch, time, fea = 8, 10, 64
    x = jnp.asarray(rng.standard_normal((batch, time, fea)), jnp.float32)
    cell = make_cell(mode, nhead, fea=fea)
    params = cell.init(jax.random.PRNGKey(0), x)
    out = cell.apply(params, x)
    assert out.shape == (batch, time, fea)


@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize("nhead", [1, 2])
@pytest.mark.parametrize("masked", ["none", "pad", "pad+sum"])
def test_torch_oracle_parity(mode, nhead, masked, rng):
    """JAX forward == independent torch implementation of the published
    equations, for every mode x head count x mask case. "pad" exercises
    the padded masked-MEAN path on its own (for lite and fast this is
    the only padded path the sum_mask case can't reach)."""
    batch, time, fea = 3, 7, 8
    local_out, summary_out = 32, fea
    x_np = rng.standard_normal((batch, time, fea)).astype(np.float32)

    p = draw_summary_mixing(
        1234 + nhead, fea, nhead, [32], local_out, [64], summary_out, mode
    )
    if masked == "pad+sum" and mode == "SummaryMixing-lite":
        # deliberate deviation: the reference's lite path silently IGNORES
        # sum_mask (no per-step weighting exists); this build raises
        # instead of training non-causally (see test below). The padded
        # mean itself is covered by the "pad" case.
        pytest.skip("lite + sum_mask raises by design")
    sum_mask_t = pad_t = sum_mask_j = pad_j = None
    if masked != "none":
        lens = np.array([time, time - 2, time - 4])
        pm = (np.arange(time)[None, :] < lens[:, None]).astype(np.float32)
        pad_t, pad_j = torch.tensor(pm), jnp.asarray(pm)
    if masked == "pad+sum":
        # random binary context mask with nonzero rows
        sm = (rng.random((time, time)) < 0.6).astype(np.float32)
        sm[np.arange(time), np.arange(time)] = 1.0
        sum_mask_t, sum_mask_j = torch.tensor(sm), jnp.asarray(sm)

    cell = make_cell(mode, nhead, fea=fea, local_out=local_out)
    variables = to_flax_params(p)
    got = cell.apply(
        variables, jnp.asarray(x_np), sum_mask=sum_mask_j, pad_mask=pad_j
    )

    if masked == "pad" and mode == "SummaryMixing-expdecay":
        # deliberate deviation: the reference normalises expdecay
        # summaries by the raw decay rowsum, attenuating short
        # utterances in proportion to bucket padding; this build embeds
        # padding into the decay columns (padding-invariant — see
        # SummaryMixing._mix). Oracle parity therefore holds per row on
        # the TRUNCATED unpadded sequence, where the two agree exactly.
        for i, L in enumerate(lens):
            want_i = summary_mixing_forward(
                torch.tensor(x_np[i:i + 1, :L]), p).numpy()
            np.testing.assert_allclose(np.asarray(got)[i, :L], want_i[0],
                                       atol=2e-5, rtol=2e-5)
        return

    want = summary_mixing_forward(
        torch.tensor(x_np), p, sum_mask=sum_mask_t, pad_mask=pad_t
    ).numpy()
    if masked == "pad":
        # padded positions carry no contract; compare valid steps
        for i, L in enumerate(lens):
            np.testing.assert_allclose(np.asarray(got)[i, :L], want[i, :L],
                                       atol=2e-5, rtol=2e-5)
        return
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize(
    "mode", ["SummaryMixing", "SummaryMixing-lite", "SummaryMixing-fast"])
def test_padding_invariance(mode, rng):
    """Outputs at valid steps must not change when trailing padding grows.
    Critical property: the mean divides by real length
    (reference summary_mixing.py:218-219); any mask slip silently changes
    results (SURVEY.md §7 'hard parts')."""
    batch, time, fea = 2, 6, 8
    x = rng.standard_normal((batch, time, fea)).astype(np.float32)
    cell = make_cell(mode, 2, fea=fea)
    params = cell.init(jax.random.PRNGKey(0), jnp.asarray(x))

    lens = np.array([time, time - 2])
    pad = (np.arange(time)[None, :] < lens[:, None]).astype(np.float32)
    out1 = cell.apply(params, jnp.asarray(x), pad_mask=jnp.asarray(pad))

    extra = 5
    x_padded = np.concatenate(
        [x, rng.standard_normal((batch, extra, fea)).astype(np.float32)], axis=1
    )
    pad2 = (np.arange(time + extra)[None, :] < lens[:, None]).astype(np.float32)
    out2 = cell.apply(params, jnp.asarray(x_padded), pad_mask=jnp.asarray(pad2))

    for b in range(batch):
        np.testing.assert_allclose(
            np.asarray(out1)[b, : lens[b]],
            np.asarray(out2)[b, : lens[b]],
            atol=1e-5,
            rtol=1e-5,
        )


def test_sum_mask_all_ones_equals_no_mask(rng):
    """A full-context sum_mask must reproduce the plain masked-mean path
    (mask-mode equivalence, SURVEY.md §4 item 3). Valid only for unpadded
    input: the reference sum_mask path normalises by mask rowsum, not by
    real length (summary_mixing.py:233-235)."""
    batch, time, fea = 2, 5, 8
    x = jnp.asarray(rng.standard_normal((batch, time, fea)), jnp.float32)
    cell = make_cell("SummaryMixing", 2, fea=fea)
    params = cell.init(jax.random.PRNGKey(0), x)
    out_none = cell.apply(params, x)
    out_ones = cell.apply(params, x, sum_mask=jnp.ones((time, time)))
    np.testing.assert_allclose(
        np.asarray(out_none), np.asarray(out_ones), atol=1e-5, rtol=1e-5
    )


def test_lite_broadcasts_over_time(rng):
    """Lite mode output is constant across time (reference golden structure,
    test_summary_mixing.py:134-141)."""
    x = jnp.asarray(rng.standard_normal((2, 4, 8)), jnp.float32)
    cell = make_cell("SummaryMixing-lite", 1)
    params = cell.init(jax.random.PRNGKey(0), x)
    out = np.asarray(cell.apply(params, x))
    for t in range(1, 4):
        np.testing.assert_allclose(out[:, t], out[:, 0], atol=1e-6)


def test_laplace_weights():
    w = np.asarray(laplace_weights(4, 0.995))
    idx = np.arange(4)
    want = 0.995 ** np.abs(idx[None, :] - idx[:, None])
    np.testing.assert_allclose(w, want, rtol=1e-6)


def test_expdecay_matches_explicit_sum_mask(rng):
    """expdecay == full mode called with the laplace matrix as sum_mask."""
    batch, time, fea = 2, 6, 8
    x_np = rng.standard_normal((batch, time, fea)).astype(np.float32)
    p = draw_summary_mixing(7, fea, 1, [32], 32, [64], fea, "SummaryMixing-expdecay")
    cell_exp = make_cell("SummaryMixing-expdecay", 1, fea=fea)
    out_exp = cell_exp.apply(to_flax_params(p), jnp.asarray(x_np))

    p_full = dict(p, mode="SummaryMixing")
    cell_full = make_cell("SummaryMixing", 1, fea=fea)
    out_full = cell_full.apply(
        to_flax_params(p_full),
        jnp.asarray(x_np),
        sum_mask=laplace_weights(time, 0.995),
    )
    np.testing.assert_allclose(
        np.asarray(out_exp), np.asarray(out_full), atol=1e-6
    )


def test_invalid_mode():
    with pytest.raises(ValueError):
        cell = SummaryMixing(enc_dim=8, nhead=1, mode="bogus")
        cell.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 8)))


def test_dropout_active_in_training(rng):
    x = jnp.asarray(rng.standard_normal((2, 4, 8)), jnp.float32)
    cell = make_cell("SummaryMixing", 1, fea=8)
    params = cell.init(jax.random.PRNGKey(0), x)
    o1 = cell.apply(
        params, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)}
    )
    o2 = cell.apply(
        params, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(2)}
    )
    assert not np.allclose(np.asarray(o1), np.asarray(o2))
    # deterministic path is reproducible
    o3 = cell.apply(params, x)
    o4 = cell.apply(params, x)
    np.testing.assert_allclose(np.asarray(o3), np.asarray(o4))


def test_fully_masked_rows_do_not_nan(rng):
    """Padded frames whose whole context window is padding (chunked mask +
    short utterance) must not produce NaNs that poison valid frames
    (regression: summary_matmul divided by a zero rowsum)."""
    from summarymixing_tpu.ops.masks import chunked_context_mask, combine_padding

    # t=32 with 10 valid frames: rows 24-31 see ONLY padding (their
    # chunk + left context covers frames 16-31), so the combined mask
    # genuinely has zero rowsums — t=24 never did, and the clamp under
    # test was unexercised
    t, chunk, left = 32, 8, 1
    x = jnp.asarray(rng.standard_normal((1, t, 8)), jnp.float32)
    pad = (jnp.arange(t) < 10).astype(jnp.float32)[None, :]
    sm = combine_padding(chunked_context_mask(t, chunk, left), pad)
    assert float(jnp.min(jnp.sum(sm, axis=-1))) == 0.0  # the 0/0 rows exist
    cell = make_cell("SummaryMixing", 1, fea=8)
    params = cell.init(jax.random.PRNGKey(0), x)
    out = cell.apply(params, x, sum_mask=sm, pad_mask=pad)
    assert np.isfinite(np.asarray(out)).all()
    # two stacked applications (the contamination path)
    out2 = cell.apply(params, out, sum_mask=sm, pad_mask=pad)
    assert np.isfinite(np.asarray(out2)[0, :10]).all()


def test_lite_rejects_sum_mask(rng):
    """SummaryMixing-lite has no per-step weighting, so a causal/chunked
    sum_mask cannot be honoured; the reference silently ignores it
    (summary_mixing.py:286-310 takes no sum_mask) — this build raises so a
    'causal' config can never train non-causally by accident."""
    x = jnp.asarray(rng.standard_normal((2, 5, 8)), jnp.float32)
    cell = make_cell("SummaryMixing-lite", 1, fea=8)
    params = cell.init(jax.random.PRNGKey(0), x)
    with pytest.raises(ValueError, match="lite"):
        cell.apply(params, x, sum_mask=jnp.ones((5, 5)))


def test_expdecay_padding_invariance(rng):
    """exp-decay summaries must not depend on how much trailing padding the
    bucket adds (the reference normalises by the decay mass of ALL columns
    including padding, summary_mixing.py:233-235 — deviation documented in
    the cell)."""
    batch, time, fea = 2, 6, 8
    x = rng.standard_normal((batch, time, fea)).astype(np.float32)
    cell = make_cell("SummaryMixing-expdecay", 1, fea=fea)
    params = cell.init(jax.random.PRNGKey(0), jnp.asarray(x))
    lens = np.array([time, time - 3])
    pad = (np.arange(time)[None, :] < lens[:, None]).astype(np.float32)
    out1 = cell.apply(params, jnp.asarray(x), pad_mask=jnp.asarray(pad))

    extra = 4
    x2 = np.concatenate(
        [x, rng.standard_normal((batch, extra, fea)).astype(np.float32)], 1)
    pad2 = (np.arange(time + extra)[None, :] < lens[:, None]).astype(
        np.float32)
    out2 = cell.apply(params, jnp.asarray(x2), pad_mask=jnp.asarray(pad2))
    for b in range(batch):
        np.testing.assert_allclose(np.asarray(out1)[b, : lens[b]],
                                   np.asarray(out2)[b, : lens[b]],
                                   atol=1e-5, rtol=1e-5)


def test_parallel_linear_init_matches_torch_bounds(rng):
    """kaiming_uniform(a=sqrt(5)) bounds on the reference's tensor layouts
    (VanillaNN.py:85-97): kernel [n_split, in, out] -> 1/sqrt(in*out)
    (torch fan_in = size(1)*prod(size()[2:])), bias [n_split, out] ->
    1/sqrt(out)."""
    from summarymixing_tpu.ops.linear import ParallelLinear

    pl = ParallelLinear(features=64, n_split=4)
    p = pl.init(jax.random.PRNGKey(0), jnp.ones((2, 5, 32)))["params"]
    k, b = np.asarray(p["kernel"]), np.asarray(p["bias"])
    kb = 1.0 / np.sqrt(8 * 16)       # split_in=8, split_out=16
    bb = 1.0 / np.sqrt(16)
    assert np.abs(k).max() <= kb * 1.0001 and np.abs(k).max() > kb * 0.9
    assert np.abs(b).max() <= bb * 1.0001 and np.abs(b).max() > bb * 0.8
