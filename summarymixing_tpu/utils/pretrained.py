"""Pretrained-component transfer (the reference Pretrainer equivalent,
branchformer yaml:353-360 / transducer yaml:415-423: collect `loadables`
{lm, tokenizer} from paths and load them before training/decoding).

This environment has no network egress, so loadables are local paths; HF
URIs raise a clear error. Torch checkpoints go through utils.convert."""

from __future__ import annotations

import os
import pickle
from dataclasses import dataclass, field
from typing import Any, Callable, Dict

import numpy as np


@dataclass
class Pretrainer:
    """collect_in: directory where loadables are expected; loadables maps
    names to file paths; custom_loaders maps names to load functions
    (default: orbax/msgpack/np/pickle by extension)."""

    collect_in: str
    loadables: Dict[str, str] = field(default_factory=dict)
    custom_loaders: Dict[str, Callable[[str], Any]] = field(default_factory=dict)

    def resolve(self, name: str) -> str:
        path = self.loadables[name]
        if path.startswith(("http://", "https://", "hf://")):
            raise RuntimeError(
                f"loadable {name!r} points at a remote source ({path}); this "
                "environment has no network egress — download it out of band "
                f"and place it under {self.collect_in}"
            )
        if not os.path.isabs(path):
            path = os.path.join(self.collect_in, path)
        if not os.path.exists(path):
            raise FileNotFoundError(f"loadable {name!r}: {path} not found")
        return path

    def load(self, name: str) -> Any:
        path = self.resolve(name)
        if name in self.custom_loaders:
            return self.custom_loaders[name](path)
        if path.endswith((".ckpt", ".pt", ".pth")):
            from summarymixing_tpu.utils.convert import load_torch_checkpoint

            return load_torch_checkpoint(path)
        if path.endswith(".npz"):
            return dict(np.load(path, allow_pickle=True))
        if path.endswith((".pkl", ".pickle")):
            with open(path, "rb") as f:
                return pickle.load(f)
        if path.endswith(".model"):  # sentencepiece model file
            from summarymixing_tpu.data.tokenizer import SentencePieceTokenizer

            return SentencePieceTokenizer(path)
        raise ValueError(f"don't know how to load {path}")

    def collect(self) -> Dict[str, Any]:
        return {name: self.load(name) for name in self.loadables}
