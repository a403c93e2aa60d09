"""Language models for shallow fusion.

Capability parity:
- TransformerLM <- speechbrain TransformerLM as configured by
  branchformer_summarymixing.yaml:183-191 (768d, 12 heads, 12 encoder
  layers, d_ffn 3072, GELU, normalize_before False, causal self-attention,
  no decoder) used by TransformerLMScorer (yaml:233-246, lm_weight 0.6).
- RNNLM <- speechbrain RNNLM (transducer yaml:339-348: emb 128, 2x2048 LSTM,
  1x512 DNN block) fused by TransducerBeamSearcher.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from summarymixing_tpu.ops.linear import gelu_exact
from summarymixing_tpu.ops.masks import lookahead_mask
from summarymixing_tpu.ops.positional import positional_encoding
from summarymixing_tpu.models.transformer import (
    NormalizedEmbedding,
    TransformerEncoder,
)

Array = jax.Array


class TransformerLM(nn.Module):
    vocab: int
    d_model: int = 768
    nhead: int = 12
    num_layers: int = 12
    d_ffn: int = 3072
    dropout_rate: float = 0.0
    activation: Callable = gelu_exact
    normalize_before: bool = False
    max_length: int = 2500
    # "linear": single Dense head (in-repo trained LMs). "sb": the
    # SpeechBrain TransformerLM output_proj ModuleList — Linear(d, d) ->
    # LayerNorm(eps 1e-6) -> Linear(d, vocab) — required to host converted
    # published lm.ckpt weights (utils/convert.py::convert_transformer_lm)
    output_proj: str = "linear"
    dtype: jnp.dtype | None = None
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.emb = NormalizedEmbedding(
            d_model=self.d_model, vocab=self.vocab,
            param_dtype=self.param_dtype, name="emb",
        )
        self.encoder = TransformerEncoder(
            num_layers=self.num_layers,
            d_model=self.d_model,
            d_ffn=self.d_ffn,
            nhead=self.nhead,
            dropout_rate=self.dropout_rate,
            activation=self.activation,
            normalize_before=self.normalize_before,
            attention_type="regularMHA",
            name="encoder",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        if self.output_proj == "sb":
            self.out_proj = nn.Dense(self.d_model, dtype=self.dtype,
                                     param_dtype=self.param_dtype,
                                     name="out_proj")
            self.out_norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                         param_dtype=self.param_dtype,
                                         name="out_norm")
        elif self.output_proj != "linear":
            raise ValueError(f"unknown output_proj {self.output_proj!r}")
        self.out = nn.Dense(self.vocab, dtype=self.dtype,
                            param_dtype=self.param_dtype, name="out")

    def _head(self, x: Array) -> Array:
        if self.output_proj == "sb":
            x = self.out_norm(self.out_proj(x))
        return self.out(x)

    def __call__(
        self,
        tokens: Array,
        pad_mask: Optional[Array] = None,
        deterministic: bool = True,
    ) -> Array:
        """tokens [B, U] -> logits [B, U, vocab] (next-token)."""
        u = tokens.shape[1]
        x = self.emb(tokens)
        x = x + positional_encoding(u, self.d_model, x.dtype)
        x = self.encoder(x, src_mask=lookahead_mask(u), pad_mask=pad_mask,
                         deterministic=deterministic)
        return self._head(x)

    # -- KV-cached scoring for beam-search fusion -----------------------------
    def init_cache(self, batch: int, max_len: int, dtype=jnp.float32):
        return self.encoder.init_cache(batch, max_len, dtype)

    def step(self, tok_t: Array, pos, cache):
        """tok_t [B] at position pos -> (logits [B, vocab], cache')."""
        x = self.emb(tok_t[:, None])[:, 0]
        table = positional_encoding(self.max_length, self.d_model, x.dtype)
        pe = jax.lax.dynamic_slice(table, (0, pos, 0), (1, 1, self.d_model))
        x = x + pe[0, 0]
        h, cache = self.encoder.step(x, pos, cache)
        return self._head(h), cache


class RNNLM(nn.Module):
    """Embedding -> LSTM stack -> DNN -> logits, with explicit carried state
    for step-wise fusion in transducer search."""

    vocab: int
    embedding_dim: int = 128
    rnn_layers: int = 2
    rnn_neurons: int = 2048
    dnn_neurons: int = 512
    dropout_rate: float = 0.0
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.emb = nn.Embed(self.vocab, self.embedding_dim,
                            param_dtype=self.param_dtype, name="emb")
        self.cells = [
            nn.OptimizedLSTMCell(self.rnn_neurons, param_dtype=self.param_dtype,
                                 name=f"lstm_{i}")
            for i in range(self.rnn_layers)
        ]
        self.dnn = nn.Dense(self.dnn_neurons, param_dtype=self.param_dtype,
                            name="dnn")
        self.out = nn.Dense(self.vocab, param_dtype=self.param_dtype, name="out")
        # applied after each LSTM layer and the DNN activation in training
        # (the reference RNNLM regularises its RNN/DNN stack the same way)
        self.drop = nn.Dropout(rate=self.dropout_rate)

    def initial_state(self, batch: int):
        rng = jax.random.PRNGKey(0)
        return [
            cell.initialize_carry(rng, (batch, self.embedding_dim))
            for cell in self.cells
        ]

    def step(self, carry, token: Array,
             deterministic: bool = True) -> Tuple[list, Array]:
        """One token step: carry (list of LSTM states), token [B] ->
        (new_carry, logits [B, vocab])."""
        x = self.emb(token)
        new_carry = []
        for cell, c in zip(self.cells, carry):
            c2, x = cell(c, x)
            x = self.drop(x, deterministic=deterministic)
            new_carry.append(c2)
        x = self.drop(jax.nn.leaky_relu(self.dnn(x)),
                      deterministic=deterministic)
        return new_carry, self.out(x)

    def __call__(self, tokens: Array, deterministic: bool = True) -> Array:
        """tokens [B, U] -> logits [B, U, vocab] via scan over steps."""
        b = tokens.shape[0]
        carry = self.initial_state(b)
        _, logits = nn.scan(
            lambda mdl, c, t: mdl.step(c, t, deterministic),
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=1, out_axes=1,
        )(self, carry, tokens)
        return logits


def build_lm(lm_cfg, vocab: int):
    """LMConfig (config/schema.py) -> flax LM module."""
    if lm_cfg.model_type == "transformer":
        return TransformerLM(
            vocab=vocab, d_model=lm_cfg.d_model, nhead=lm_cfg.nhead,
            num_layers=lm_cfg.num_layers, d_ffn=lm_cfg.d_ffn,
            dropout_rate=lm_cfg.dropout, output_proj=lm_cfg.output_proj,
        )
    if lm_cfg.model_type == "rnn":
        return RNNLM(
            vocab=vocab, embedding_dim=lm_cfg.embedding_dim,
            rnn_layers=lm_cfg.rnn_layers, rnn_neurons=lm_cfg.rnn_neurons,
            dnn_neurons=lm_cfg.dnn_neurons, dropout_rate=lm_cfg.dropout,
        )
    raise ValueError(f"unknown lm model_type {lm_cfg.model_type!r}")
