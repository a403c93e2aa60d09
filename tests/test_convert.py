"""Weight-converter tests: a synthetic SpeechBrain-style state dict built
from the torch oracle converts into flax params that reproduce the oracle's
outputs."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import pytest

from summarymixing_tpu.ops.summary_mixing import SummaryMixing
from summarymixing_tpu.utils.convert import (
    convert_conv2d,
    convert_depthwise_conv1d,
    convert_linear,
    convert_summary_mixing,
)
from summarymixing_tpu.utils.init import xavier_normal_overwrite

from torch_oracle import draw_summary_mixing, summary_mixing_forward


def oracle_to_state_dict(p, prefix="mixer"):
    """Lay the oracle weights out with SpeechBrain's naming
    (VanillaNN blocks `linear`, `linear_0`, ...; plain Linear under `.w`)."""
    sd = {}

    def put(name, layers, nhead):
        for i, lp in enumerate(layers):
            block = "linear" if i == 0 else f"linear_{i - 1}"
            if nhead == 1:
                sd[f"{prefix}.{name}.{block}.w.weight"] = lp["w"].numpy()
                sd[f"{prefix}.{name}.{block}.w.bias"] = lp["b"].numpy()
            else:
                sd[f"{prefix}.{name}.{block}.weights"] = lp["w"].numpy()
                sd[f"{prefix}.{name}.{block}.biases"] = lp["b"].numpy()

    nhead = p["nhead"]
    if p["mode"] in ("SummaryMixing", "SummaryMixing-expdecay"):
        put("local_proj", p["local"], nhead)
        put("summary_proj", p["summary"], nhead)
        put("summary_local_merging", p["merge"], 1)
    elif p["mode"] == "SummaryMixing-fast":
        put("global_proj", p["global"], 1)
        put("summary_local_merging", p["merge"], 1)
    else:
        put("summary_proj", p["summary"], nhead)
    return sd


@pytest.mark.parametrize("mode", ["SummaryMixing", "SummaryMixing-lite",
                                  "SummaryMixing-fast"])
@pytest.mark.parametrize("nhead", [1, 2])
def test_convert_summary_mixing(mode, nhead, rng):
    fea, local_out, summary_out = 8, 32, 8
    x_np = rng.standard_normal((2, 6, fea)).astype(np.float32)
    p = draw_summary_mixing(42, fea, nhead, [32], local_out, [64],
                            summary_out, mode)
    want = summary_mixing_forward(torch.tensor(x_np), p).numpy()

    sd = oracle_to_state_dict(p)
    tree = convert_summary_mixing("mixer", sd, nhead, mode)
    cell = SummaryMixing(
        enc_dim=fea, nhead=nhead, local_proj_hid_dim=(32,),
        local_proj_out_dim=local_out, summary_hid_dim=(64,),
        summary_out_dim=summary_out, mode=mode,
    )
    got = cell.apply({"params": tree}, jnp.asarray(x_np))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=2e-5)


def test_convert_linear_and_convs(rng):
    w = rng.standard_normal((6, 4)).astype(np.float32)
    b = rng.standard_normal(6).astype(np.float32)
    x = rng.standard_normal((2, 4)).astype(np.float32)
    flax_p = convert_linear(w, b)
    np.testing.assert_allclose(x @ flax_p["kernel"] + flax_p["bias"],
                               x @ w.T + b, rtol=1e-6)

    cw = rng.standard_normal((8, 3, 3, 3)).astype(np.float32)
    conv = convert_conv2d(cw)
    assert conv["kernel"].shape == (3, 3, 3, 8)

    dw = rng.standard_normal((16, 1, 5)).astype(np.float32)
    assert convert_depthwise_conv1d(dw).shape == (5, 16)


def test_xavier_overwrite(rng):
    params = {
        "a": {"kernel": jnp.zeros((4, 8)), "bias": jnp.zeros((8,))},
        "conv": {"kernel": jnp.zeros((3, 3, 2, 4))},
    }
    out = xavier_normal_overwrite(jax.random.PRNGKey(0), params)
    assert float(jnp.abs(out["a"]["kernel"]).sum()) > 0
    assert float(jnp.abs(out["conv"]["kernel"]).sum()) > 0
    assert float(jnp.abs(out["a"]["bias"]).sum()) == 0.0  # 1-D untouched
