"""In-repo subword tokenizer training (replaces the reference's
SentencePiece C++ dependency, LibriSpeech yaml:193 token_type unigram)."""

import os

import pytest

from summarymixing_tpu.data.subword import (
    SubwordTokenizer,
    train_bpe,
    train_subword,
    train_unigram,
)

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the dog barks at the quick fox",
    "a lazy dog sleeps all day",
    "the brown fox is quick and the dog is lazy",
    "quick quick quick brown brown fox",
] * 10


def test_unigram_roundtrip_and_size():
    tok = train_unigram(CORPUS, vocab_size=80)
    assert tok.vocab_size <= 80
    for text in CORPUS[:5]:
        ids = tok.encode(text)
        assert all(0 <= i < tok.vocab_size for i in ids)
        assert tok.decode(ids) == text
    # ids 0..2 reserved
    assert tok.unk_id == 0 and tok.bos_id == 1 and tok.eos_id == 2
    assert min(tok.encode("the quick")) >= 3


def test_unigram_learns_multichar_pieces():
    tok = train_unigram(CORPUS, vocab_size=80)
    multi = [p for p in tok.pieces if len(p) > 1]
    assert multi, "no multi-char pieces learned"
    # the most frequent words should segment into very few pieces
    assert len(tok.encode("the")) <= 2
    assert len(tok.encode("quick")) <= 3


def test_unigram_deterministic():
    a = train_unigram(CORPUS, vocab_size=60)
    b = train_unigram(CORPUS, vocab_size=60)
    assert a.pieces == b.pieces


def test_unigram_character_coverage_and_unk():
    tok = train_unigram(CORPUS, vocab_size=80)
    # every training character survives as a piece -> no unk on train text
    for text in CORPUS[:3]:
        assert tok.unk_id not in tok.encode(text)
    # unseen char encodes to unk and decode drops it
    ids = tok.encode("zebra?")
    assert tok.unk_id in ids


def test_unigram_persistence(tmp_path):
    tok = train_unigram(CORPUS, vocab_size=60)
    path = os.path.join(tmp_path, "tok.json")
    tok.save(path)
    tok2 = SubwordTokenizer.load(path)
    for text in CORPUS[:3]:
        assert tok.encode(text) == tok2.encode(text)
    assert tok2.vocab_size == tok.vocab_size


def test_unigram_tiny_vocab_chars_only_fits_budget():
    """At a vocab_size that exactly covers the charset, training succeeds
    with chars only and never exceeds the budget (ids >= output_neurons
    would be silently clamped by XLA gathers downstream)."""
    n_chars = len({c for t in CORPUS for c in t})
    tok = train_unigram(CORPUS, vocab_size=n_chars + 3)
    assert tok.vocab_size <= n_chars + 3
    ids = tok.encode("the quick brown fox")
    assert tok.decode(ids) == "the quick brown fox"


def test_trainers_reject_vocab_smaller_than_charset():
    """SentencePiece parity: a budget below the mandatory charset is an
    error, not a silent overflow past the model's output_neurons."""
    for trainer in (train_unigram, train_bpe):
        with pytest.raises(ValueError, match="too small"):
            trainer(CORPUS, vocab_size=10)


def test_bpe_roundtrip():
    tok = train_bpe(CORPUS, vocab_size=70)
    assert tok.vocab_size <= 70
    for text in CORPUS[:4]:
        assert tok.decode(tok.encode(text)) == text
    assert any(len(p) > 1 for p in tok.pieces)


def test_train_subword_dispatch():
    assert train_subword(CORPUS, 50, "unigram").model_type == "unigram"
    assert train_subword(CORPUS, 50, "bpe").model_type == "bpe"
    with pytest.raises(ValueError):
        train_subword(CORPUS, 50, "wordpiece")
