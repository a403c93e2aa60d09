"""Tokenizers: character-level (AISHELL-style) built in, SentencePiece
(unigram 5000/1000/350, the LibriSpeech/CommonVoice recipes' tokenizer —
yaml:193) loaded through the `sentencepiece` package when available.

The reference depends on the SentencePiece C++ library via its Python
wheel (SURVEY.md §2.3); tokenization is host-side data prep, not model
code, so the wheel is used as-is when installed. When it is not (this
image does not ship it), `.model` files still load through the in-repo
pure-python ModelProto reader (data/sentencepiece_model.py) — the
published-tokenizer route of the reference's Pretrainer (yaml:353-360)
works either way."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Sequence

try:  # pragma: no cover - environment dependent
    import sentencepiece as _spm

    HAS_SENTENCEPIECE = True
except ImportError:  # pragma: no cover
    _spm = None
    HAS_SENTENCEPIECE = False


@dataclass
class CharTokenizer:
    """Character tokenizer with reserved ids: 0=blank/pad, 1=bos, 2=eos,
    3=unk (matching the recipes' blank_index/bos_index/eos_index layout)."""

    vocab: Dict[str, int] = field(default_factory=dict)
    blank_id: int = 0
    bos_id: int = 1
    eos_id: int = 2
    unk_id: int = 3

    @classmethod
    def build(cls, texts: Sequence[str]) -> "CharTokenizer":
        chars = sorted({c for t in texts for c in t})
        vocab = {c: i + 4 for i, c in enumerate(chars)}
        return cls(vocab=vocab)

    @property
    def vocab_size(self) -> int:
        return len(self.vocab) + 4

    def encode(self, text: str) -> List[int]:
        return [self.vocab.get(c, self.unk_id) for c in text]

    def decode(self, ids: Sequence[int]) -> str:
        # cached inverse map (rebuilt per hypothesis otherwise — O(vocab)
        # in the eval scoring loop); keyed by the vocab OBJECT (replacing
        # self.vocab with a different same-size mapping invalidates it)
        # AND its size (growing the same dict in place invalidates too)
        cached = getattr(self, "_inv", None)
        if (cached is None or cached[0] is not self.vocab
                or len(cached[1]) != len(self.vocab)):
            inv = {i: c for c, i in self.vocab.items()}
            cached = (self.vocab, inv)
            object.__setattr__(self, "_inv", cached)
        inv = cached[1]
        return "".join(inv.get(i, "") for i in ids if i >= 4)


class SentencePieceTokenizer:
    """Tokenizer over a trained sentencepiece ``.model`` file.

    Uses the sentencepiece wheel when installed; otherwise falls back to
    the in-repo pure-python ModelProto reader
    (data/sentencepiece_model.py), so PUBLISHED tokenizers — the
    reference Pretrainer's tokenizer.ckpt (branchformer yaml:353-360) —
    load with no native dependency. Ids follow the model file's own
    layout in both paths."""

    def __init__(self, model_path: str):
        if HAS_SENTENCEPIECE:  # pragma: no cover - wheel not in this image
            self.sp = _spm.SentencePieceProcessor()
            self.sp.load(model_path)
        else:
            from summarymixing_tpu.data.sentencepiece_model import (
                SentencePieceModel,
            )

            self.sp = None
            self._model = SentencePieceModel.load(model_path)

    @property
    def vocab_size(self) -> int:
        if self.sp is not None:  # pragma: no cover
            return self.sp.get_piece_size()
        return self._model.vocab_size

    def encode(self, text: str) -> List[int]:
        if self.sp is not None:  # pragma: no cover
            return self.sp.encode_as_ids(text)
        return self._model.encode(text)

    def decode(self, ids: Sequence[int]) -> str:
        if self.sp is not None:  # pragma: no cover
            return self.sp.decode_ids(list(ids))
        return self._model.decode(ids)


def load_tokenizer(kind: str, **kwargs):
    if kind == "char":
        return CharTokenizer(**kwargs)
    if kind == "sentencepiece":
        return SentencePieceTokenizer(**kwargs)
    raise ValueError(f"unknown tokenizer kind {kind!r}")
