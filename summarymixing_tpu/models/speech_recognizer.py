"""The full speech-recognition model graph the recipes assemble: CNN
frontend -> TransformerASR -> CTC head (+ attention-decoder head).

Capability parity with the recipe object graph
(branchformer_summarymixing.yaml:147-201 "modules:" CNN / Transformer /
ctc_lin / seq_lin): one flax module so a single jit covers the whole
differentiable graph. Feature extraction (Fbank) and InputNormalization stay
OUTSIDE (pure functions / explicit stats in the train step) because their
state is not trainable parameters."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from summarymixing_tpu.ops.convolution import ConvolutionFrontEnd
from summarymixing_tpu.models.asr import DynChunkTrainConfig, TransformerASR

Array = jax.Array


class SpeechRecognizer(nn.Module):
    """features [B, T, n_mels] -> (ctc_log_probs, enc_out, dec_out, seq_logits)."""

    asr: TransformerASR
    vocab_size: int
    frontend_channels: Sequence[int] = (64, 32)
    frontend_strides: Sequence[int] = (2, 2)
    frontend_dropout: float = 0.1
    dtype: jnp.dtype | None = None
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.cnn = ConvolutionFrontEnd(
            out_channels=tuple(self.frontend_channels),
            strides=tuple(self.frontend_strides),
            dropout_rate=self.frontend_dropout,
            name="cnn",
            **common,
        )
        self.ctc_lin = nn.Dense(self.vocab_size, name="ctc_lin", **common)
        if self.asr.num_decoder_layers > 0:
            self.seq_lin = nn.Dense(self.vocab_size, name="seq_lin", **common)

    def subsampled_length(self, feat_lengths: Array) -> Array:
        return ConvolutionFrontEnd.subsampled_length(
            feat_lengths, self.frontend_strides
        )

    def __call__(
        self,
        feats: Array,
        feat_lengths: Array,
        tokens_bos: Optional[Array] = None,
        pad_idx: int = 0,
        dynchunktrain: Optional[DynChunkTrainConfig] = None,
        deterministic: bool = True,
    ):
        """feats [B, T, F]; feat_lengths [B] absolute. Returns dict with
        ctc_log_probs [B, T', V], enc_out, dec_out, seq_log_probs."""
        x = self.cnn(feats, deterministic=deterministic)
        out_len = self.subsampled_length(feat_lengths)
        wav_len_rel = out_len.astype(jnp.float32) / x.shape[1]

        enc_out, dec_out = self.asr(
            x,
            tgt=tokens_bos,
            wav_len=wav_len_rel,
            pad_idx=pad_idx,
            dynchunktrain=dynchunktrain,
            deterministic=deterministic,
        )
        ctc_log_probs = jax.nn.log_softmax(self.ctc_lin(enc_out), axis=-1)
        seq_log_probs = None
        if dec_out is not None:
            seq_log_probs = jax.nn.log_softmax(self.seq_lin(dec_out), axis=-1)
        return {
            "enc_out": enc_out,
            "enc_lengths": out_len,
            "ctc_log_probs": ctc_log_probs,
            "dec_out": dec_out,
            "seq_log_probs": seq_log_probs,
        }

    def encode(
        self,
        feats: Array,
        feat_lengths: Array,
        dynchunktrain: Optional[DynChunkTrainConfig] = None,
        deterministic: bool = True,
    ) -> Tuple[Array, Array]:
        """Inference default deterministic=True; the transducer TRAIN
        step passes False so the frontend/encoder dropout actually runs
        (it silently didn't, training without its main regularizer)."""
        x = self.cnn(feats, deterministic=deterministic)
        out_len = self.subsampled_length(feat_lengths)
        wav_len_rel = out_len.astype(jnp.float32) / x.shape[1]
        enc = self.asr.encode(x, wav_len_rel, dynchunktrain,
                              deterministic=deterministic)
        return enc, out_len

    def ctc_head(self, enc_out: Array) -> Array:
        return jax.nn.log_softmax(self.ctc_lin(enc_out), axis=-1)

    # -- streaming (reference TransformerASR.py:562-679 contract) -----------
    def frontend(self, feats: Array, input_frame_offset=None) -> Array:
        """CNN subsampling only: [B, T, F] -> [B, T/4, F'] encoder input.
        `input_frame_offset` makes a chunk's stream-start zero padding
        exact (ops/convolution.py::ConvolutionFrontEnd, streaming.py)."""
        return self.cnn(feats, deterministic=True,
                        input_frame_offset=input_frame_offset)

    def streaming_init(self, batch: int, dynchunk, dtype=jnp.float32):
        return self.asr.init_streaming_state(batch, dynchunk, dtype)

    def encode_streaming_chunk(self, src_chunk: Array, state):
        """One chunk of CNN output frames -> (enc_chunk, new state)."""
        return self.asr.encode_streaming(src_chunk, state)

    def decode_step(self, tgt: Array, enc_out: Array, enc_len: Array) -> Array:
        """Last-position decoder hidden -> seq log-probs [B, V]."""
        h = self.asr.decode_step(tgt, enc_out, enc_len)
        return jax.nn.log_softmax(self.seq_lin(h), axis=-1)

    def decode_position(
        self, tgt: Array, enc_out: Array, enc_len: Array, pos
    ) -> Array:
        """Next-token log-probs at position `pos` of a (padded) prefix —
        the step function for fixed-shape beam search (causality makes
        positions > pos irrelevant)."""
        dec = self.asr.decode_prefix(tgt, enc_out, enc_len)
        return jax.nn.log_softmax(self.seq_lin(dec[:, pos]), axis=-1)

    def decode_cache_init(self, enc_out: Array, max_len: int, rows=None):
        return self.asr.decode_cache_init(enc_out, max_len, rows)

    def decode_step_cached(self, tok_t: Array, pos, cache, enc_pad_mask=None):
        """KV-cached step: tok_t [B] -> (log-probs [B, V], cache')."""
        h, cache = self.asr.decode_step_cached(tok_t, pos, cache, enc_pad_mask)
        return jax.nn.log_softmax(self.seq_lin(h), axis=-1), cache
