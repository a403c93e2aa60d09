"""PyTorch (SpeechBrain) checkpoint -> flax parameter conversion, for
numerical-parity evaluation with reference-trained models (SURVEY.md §5
"checkpoint/resume": weight converter).

The reference ships models as SpeechBrain `model.ckpt` state dicts (a
torch.nn.ModuleList of [CNN, Transformer, seq_lin, ctc_lin], reference
branchformer_summarymixing.yaml:214-215). Conversion rules:

- torch nn.Linear weight [out, in] -> flax Dense kernel [in, out] (transpose)
- ParallelLinear weights [m, in/m, out/m] -> ParallelLinear kernel (as-is)
- torch Conv2d [out, in, kh, kw] -> flax Conv [kh, kw, in, out]
- torch Conv1d depthwise [C, 1, K] -> depthwise kernel [K, C]
- LayerNorm weight/bias -> scale/bias

`convert_summary_mixing` handles the cell subtree; `load_torch_checkpoint`
loads a raw state-dict file (torch.load, host-side)."""

from __future__ import annotations

from typing import Dict

import numpy as np


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.numpy() for k, v in sd.items()}


def convert_linear(weight: np.ndarray, bias: np.ndarray | None = None) -> dict:
    out = {"kernel": np.ascontiguousarray(weight.T)}
    if bias is not None:
        out["bias"] = np.asarray(bias)
    return out


def convert_parallel_linear(weights: np.ndarray, biases: np.ndarray) -> dict:
    return {"kernel": np.asarray(weights), "bias": np.asarray(biases)}


def convert_layernorm(weight: np.ndarray, bias: np.ndarray) -> dict:
    return {"scale": np.asarray(weight), "bias": np.asarray(bias)}


def convert_conv2d(weight: np.ndarray, bias: np.ndarray | None = None) -> dict:
    # [out, in, kh, kw] -> [kh, kw, in, out]
    out = {"kernel": np.ascontiguousarray(weight.transpose(2, 3, 1, 0))}
    if bias is not None:
        out["bias"] = np.asarray(bias)
    return out


def convert_depthwise_conv1d(weight: np.ndarray) -> np.ndarray:
    # torch depthwise Conv1d [C, 1, K] -> [K, C]
    return np.ascontiguousarray(weight[:, 0, :].T)


def _mlp_from_torch(prefix: str, sd: Dict[str, np.ndarray], n_split: int) -> dict:
    """Convert a VanillaNN (reference VanillaNN.py) subtree. SpeechBrain
    Sequential names blocks `linear`, `linear_0`, ... with the underlying
    torch module at `.w` for plain Linear and direct weights for
    ParallelLinear."""
    out = {}
    i = 0
    while True:
        block = "linear" if i == 0 else f"linear_{i - 1}"
        plain_w = f"{prefix}.{block}.w.weight"
        par_w = f"{prefix}.{block}.weights"
        if plain_w in sd:
            out[f"layer_{i}"] = convert_linear(
                sd[plain_w], sd.get(f"{prefix}.{block}.w.bias")
            )
        elif par_w in sd:
            out[f"layer_{i}"] = convert_parallel_linear(
                sd[par_w], sd[f"{prefix}.{block}.biases"]
            )
        else:
            break
        i += 1
    if not out:
        raise KeyError(f"no VanillaNN layers found under {prefix!r}")
    return out


def convert_summary_mixing(
    prefix: str, sd: Dict[str, np.ndarray], nhead: int, mode: str
) -> dict:
    """Convert a reference SummaryMixing cell (summary_mixing.py:112-157)
    state-dict subtree into the flax SummaryMixing param tree."""
    tree = {}
    if mode in ("SummaryMixing", "SummaryMixing-expdecay"):
        tree["local_proj"] = _mlp_from_torch(f"{prefix}.local_proj", sd, nhead)
        tree["summary_proj"] = _mlp_from_torch(f"{prefix}.summary_proj", sd, nhead)
        tree["summary_local_merging"] = _mlp_from_torch(
            f"{prefix}.summary_local_merging", sd, 1
        )
    elif mode == "SummaryMixing-fast":
        tree["global_proj"] = _mlp_from_torch(f"{prefix}.global_proj", sd, 1)
        tree["summary_local_merging"] = _mlp_from_torch(
            f"{prefix}.summary_local_merging", sd, 1
        )
    else:
        tree["summary_proj"] = _mlp_from_torch(f"{prefix}.summary_proj", sd, nhead)
    return tree
