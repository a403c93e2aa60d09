"""Clean-room PyTorch builds of the reference FUSION LMs, used only as
conversion/parity oracles (tests/test_convert_lm.py).

- TransformerLMTorch: speechbrain TransformerLM topology + state-dict
  naming (reference branchformer yaml:182-191: causal encoder-only
  transformer, normalize_before False, GELU; NormalizedEmbedding at
  custom_src_module; encoder layers from the vendored
  Transformer.py:404-467 attrs self_att/pos_ffn/norm1/norm2 with the
  stack-final LayerNorm eps 1e-6 at :632; output head = Linear(d,d) ->
  LayerNorm(eps 1e-6) -> Linear(d,vocab) ModuleList).
- RNNLMTorch: speechbrain RNNLM topology (reference transducer
  yaml:339-348: Embedding -> LSTM stack -> one DNN block -> output
  linear, LeakyReLU activation).

Assembled from standard torch modules — no reference code is copied;
`state_dict()` has the key layout utils/convert.py's convert_transformer_lm
/ convert_rnnlm consume."""

from __future__ import annotations

import torch
import torch.nn as nn

from torch_full_oracle import (
    NormalizedEmbeddingTorch,
    PosFFNTorch,
    SBEmbedding,
    SBLayerNorm,
    SBLinear,
    SBMha,
    sinusoid_table_torch,
)


class EncoderLayerTorch(nn.Module):
    """Post-LN encoder layer (normalize_before=False, the published LM's
    configuration — reference yaml:191)."""

    def __init__(self, d_model, nhead, d_ffn):
        super().__init__()
        self.self_att = SBMha(d_model, nhead)
        self.pos_ffn = PosFFNTorch(d_model, d_ffn)
        self.norm1 = SBLayerNorm(d_model, eps=1e-6)
        self.norm2 = SBLayerNorm(d_model, eps=1e-6)

    def forward(self, x, causal_mask):
        x = self.norm1(x + self.self_att(x, x, x, attn_mask=causal_mask))
        return self.norm2(x + self.pos_ffn(x))


class EncoderTorch(nn.Module):
    def __init__(self, n_layers, d_model, nhead, d_ffn):
        super().__init__()
        self.layers = nn.ModuleList(
            [EncoderLayerTorch(d_model, nhead, d_ffn)
             for _ in range(n_layers)])
        self.norm = SBLayerNorm(d_model, eps=1e-6)

    def forward(self, x, causal_mask):
        for layer in self.layers:
            x = layer(x, causal_mask)
        return self.norm(x)


class OutputProjTorch(nn.Module):
    """speechbrain ModuleList output_proj: Linear(d, d) -> LayerNorm ->
    Linear(d, vocab), applied sequentially (keys output_proj.layers.{i})."""

    def __init__(self, d_model, vocab):
        super().__init__()
        self.layers = nn.ModuleList([
            SBLinear(d_model, d_model),
            SBLayerNorm(d_model, eps=1e-6),
            SBLinear(d_model, vocab),
        ])

    def forward(self, x):
        for m in self.layers:
            x = m(x)
        return x


class TransformerLMTorch(nn.Module):
    def __init__(self, vocab, d_model=16, nhead=2, n_layers=2, d_ffn=24):
        super().__init__()
        self.d_model = d_model
        self.custom_src_module = NormalizedEmbeddingTorch(d_model, vocab)
        self.encoder = EncoderTorch(n_layers, d_model, nhead, d_ffn)
        self.output_proj = OutputProjTorch(d_model, vocab)

    def forward(self, tokens):
        t = tokens.shape[1]
        x = self.custom_src_module(tokens)
        x = x + sinusoid_table_torch(t, self.d_model)[None]
        causal = torch.full((t, t), float("-inf")).triu(1)
        return self.output_proj(self.encoder(x, causal))


class SBLSTM(nn.Module):
    """speechbrain RNN.LSTM: torch LSTM at attr `rnn`."""

    def __init__(self, input_size, hidden, layers):
        super().__init__()
        self.rnn = nn.LSTM(input_size, hidden, num_layers=layers,
                           batch_first=True)

    def forward(self, x):
        out, _ = self.rnn(x)
        return out


class RNNLMTorch(nn.Module):
    def __init__(self, vocab, embedding_dim=8, rnn_neurons=16, rnn_layers=2,
                 dnn_neurons=12):
        super().__init__()
        self.embedding = SBEmbedding(vocab, embedding_dim)
        self.rnn = SBLSTM(embedding_dim, rnn_neurons, rnn_layers)
        self.dnn = SBLinear(rnn_neurons, dnn_neurons)
        self.out = SBLinear(dnn_neurons, vocab)

    def forward(self, tokens):
        x = self.rnn(self.embedding(tokens))
        return self.out(torch.nn.functional.leaky_relu(self.dnn(x)))


def build_lm_oracles(vocab=13, seed=5):
    torch.manual_seed(seed)
    tlm = TransformerLMTorch(vocab)
    rlm = RNNLMTorch(vocab)
    return tlm, rlm
