"""Independent PyTorch oracle for SummaryMixing parity testing.

This is a clean-room implementation of the SummaryMixing equations from
https://arxiv.org/abs/2307.07421 as realised by the reference
(`/root/reference/speechbrain/nnet/summary_mixing.py:190-310`), used ONLY in
tests as a numerical cross-check for the JAX implementation. It shares no
code or structure with the reference (plain weight dicts, no nn.Module).

Note on the reference's pinned golden values
(reference tests/unittests/test_summary_mixing.py:95-150): those depend on
the exact torch RNG consumption order inside SpeechBrain's lazy Sequential
container at the authors' version, which is not reconstructible without
installing their environment (verified: stock nn.Linear/kaiming ordering does
not reproduce them). We therefore validate against this oracle with freshly
drawn weights, which is a strictly stronger check (many seeds, all modes,
masked + unmasked paths), and pin our own goldens for regression.
"""

import math

import numpy as np
import torch
import torch.nn.functional as Fn


def draw_dense(gen, in_f, out_f):
    bound = 1.0 / math.sqrt(in_f)
    w = (torch.rand(out_f, in_f, generator=gen) * 2 - 1) * bound
    b = (torch.rand(out_f, generator=gen) * 2 - 1) * bound
    return {"w": w, "b": b}


def draw_parallel(gen, n_split, split_in, split_out):
    bound = 1.0 / math.sqrt(split_in)
    w = (torch.rand(n_split, split_in, split_out, generator=gen) * 2 - 1) * bound
    b = (torch.rand(n_split, split_out, generator=gen) * 2 - 1) * bound
    return {"w": w, "b": b}


def draw_mlp(gen, in_dim, dims, n_split):
    layers = []
    cur = in_dim
    for d in dims:
        if n_split > 1:
            layers.append(draw_parallel(gen, n_split, cur // n_split, d // n_split))
        else:
            layers.append(draw_dense(gen, cur, d))
        cur = d
    return layers


def mlp_forward(x, layers, n_split):
    """Trailing GELU after every layer; head axis kept un-flattened between
    split layers, flattened at the last one."""
    if n_split == 1:
        for p in layers:
            x = Fn.gelu(x @ p["w"].T + p["b"])
        return x
    b_, t_ = x.shape[0], x.shape[1]
    if x.dim() == 3:
        x = x.view(b_, t_, n_split, -1)
    for i, p in enumerate(layers):
        x = torch.einsum("btmf,mfh->btmh", x, p["w"]) + p["b"]
        if i == len(layers) - 1:
            x = x.reshape(b_, t_, -1)
        x = Fn.gelu(x)
    return x


def draw_summary_mixing(
    seed, enc_dim, nhead, local_hid, local_out, summary_hid, summary_out, mode
):
    gen = torch.Generator().manual_seed(seed)
    p = {"mode": mode, "nhead": nhead, "local_out": local_out}
    if mode in ("SummaryMixing", "SummaryMixing-expdecay"):
        p["local"] = draw_mlp(gen, enc_dim, list(local_hid) + [local_out], nhead)
        p["summary"] = draw_mlp(gen, enc_dim, list(summary_hid) + [summary_out], nhead)
        p["merge"] = draw_mlp(gen, local_out + summary_out, [summary_out], 1)
    elif mode == "SummaryMixing-fast":
        p["global"] = draw_mlp(gen, enc_dim, [2 * local_out], 1)
        p["merge"] = draw_mlp(gen, 2 * local_out, [summary_out], 1)
    else:  # lite
        p["summary"] = draw_mlp(gen, enc_dim, list(summary_hid) + [summary_out], nhead)
    return p


def laplace(t, decay=0.995):
    idx = torch.arange(t)
    return torch.exp(torch.abs(idx[None, :] - idx[:, None]).float() * math.log(decay))


def summary_mixing_forward(x, p, sum_mask=None, pad_mask=None):
    """Forward per the reference equations; dropout in eval mode (identity)."""
    mode, nhead = p["mode"], p["nhead"]
    t = x.shape[1]
    if pad_mask is None:
        pad = torch.ones(x.shape[0], t, 1)
    else:
        pad = pad_mask.reshape(x.shape[0], t, 1).float()

    def pool(summ, mask):
        if mask is None:
            return (summ.sum(dim=1) / pad.sum(dim=1)).unsqueeze(1).expand(-1, t, -1)
        return torch.matmul(mask, summ) / mask.sum(dim=1).unsqueeze(-1)

    if mode in ("SummaryMixing", "SummaryMixing-expdecay"):
        local = mlp_forward(x, p["local"], nhead) * pad
        summ = mlp_forward(x, p["summary"], nhead) * pad
        if mode == "SummaryMixing-expdecay":
            dec = laplace(t)
            sum_mask = dec if sum_mask is None else dec * sum_mask
        pooled = pool(summ, sum_mask)
        return mlp_forward(torch.cat([local, pooled], dim=-1), p["merge"], 1)
    if mode == "SummaryMixing-fast":
        proj = mlp_forward(x, p["global"], 1) * pad
        local, summ = torch.split(proj, p["local_out"], dim=-1)
        pooled = pool(summ, sum_mask)
        return mlp_forward(torch.cat([local, pooled], dim=-1), p["merge"], 1)
    # lite
    summ = mlp_forward(x, p["summary"], nhead) * pad
    return (summ.sum(dim=1) / pad.sum(dim=1)).unsqueeze(1).expand(-1, t, -1)


def to_flax_params(p):
    """Convert oracle weights to the flax param tree of
    summarymixing_tpu.ops.summary_mixing.SummaryMixing."""

    def conv_mlp(layers, n_split):
        out = {}
        for i, lp in enumerate(layers):
            w, b = lp["w"], lp["b"]
            if n_split == 1:
                out[f"layer_{i}"] = {
                    "kernel": np.asarray(w.T.contiguous()),
                    "bias": np.asarray(b),
                }
            else:
                out[f"layer_{i}"] = {"kernel": np.asarray(w), "bias": np.asarray(b)}
        return out

    mode, nhead = p["mode"], p["nhead"]
    tree = {}
    if mode in ("SummaryMixing", "SummaryMixing-expdecay"):
        tree["local_proj"] = conv_mlp(p["local"], nhead)
        tree["summary_proj"] = conv_mlp(p["summary"], nhead)
        tree["summary_local_merging"] = conv_mlp(p["merge"], 1)
    elif mode == "SummaryMixing-fast":
        tree["global_proj"] = conv_mlp(p["global"], 1)
        tree["summary_local_merging"] = conv_mlp(p["merge"], 1)
    else:
        tree["summary_proj"] = conv_mlp(p["summary"], nhead)
    return {"params": tree}
