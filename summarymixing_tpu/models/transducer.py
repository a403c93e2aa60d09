"""Transducer (RNN-T) model components: one-hot prediction-network
embedding, LSTM predictor, sum-joint, and the full transducer model graph.

Capability parity with the transducer recipe object graph
(conformer_summarymixing_transducer.yaml:276-336):
- emb: one-hot Embedding(output_neurons, consider_as_one_hot, blank_id)
  -> [B, U, output_neurons - 1] (blank column removed)
- dec: 1-layer LSTM hidden dec_dim 512
- proj_enc / proj_dec: Linear(-> joint_dim 640, bias=False)
- Tjoint: sum-joint + nonlinearity (speechbrain Transducer_joint joint="sum")
- transducer_lin: Linear(joint_dim -> output_neurons, bias=False)
- proj_ctc: Linear(joint_dim -> output_neurons) for the CTC aux loss

The prediction network exposes both a full-sequence call (training: one
scan) and an explicit-state `step` (greedy/beam search)."""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from summarymixing_tpu.ops.linear import gelu_exact

Array = jax.Array


def one_hot_no_blank(tokens: Array, vocab: int, blank_id: int = 0) -> Array:
    """[B, U] -> [B, U, vocab-1]: one-hot with the blank column removed
    (speechbrain Embedding(consider_as_one_hot=True, blank_id))."""
    oh = jax.nn.one_hot(tokens, vocab)
    return jnp.delete(oh, blank_id, axis=-1, assume_unique_indices=True)


class TransducerPredictor(nn.Module):
    """Prediction network: one-hot embedding -> 1-layer LSTM -> proj."""

    vocab: int
    dec_dim: int = 512
    joint_dim: int = 640
    blank_id: int = 0
    emb_dropout: float = 0.2
    dropout: float = 0.1
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.cell = nn.OptimizedLSTMCell(
            self.dec_dim, param_dtype=self.param_dtype, name="lstm"
        )
        self.proj_dec = nn.Dense(self.joint_dim, use_bias=False,
                                 param_dtype=self.param_dtype, name="proj_dec")
        self.emb_drop = nn.Dropout(rate=self.emb_dropout)
        self.out_drop = nn.Dropout(rate=self.dropout)

    def initial_state(self, batch: int):
        return self.cell.initialize_carry(
            jax.random.PRNGKey(0), (batch, self.vocab - 1)
        )

    def step(self, carry, token: Array):
        """token [B] -> (carry', proj [B, joint_dim])."""
        x = one_hot_no_blank(token, self.vocab, self.blank_id)
        carry, h = self.cell(carry, x)
        return carry, self.proj_dec(h)

    def __call__(self, tokens_bos: Array, deterministic: bool = True) -> Array:
        """tokens_bos [B, U+1] (bos/blank-prefixed targets) ->
        [B, U+1, joint_dim]."""
        x = one_hot_no_blank(tokens_bos, self.vocab, self.blank_id)
        x = self.emb_drop(x, deterministic=deterministic)
        carry = self.initial_state(x.shape[0])

        scan = nn.scan(
            lambda cell, c, xt: cell(c, xt),
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )
        _, h = scan(self.cell, carry, x)
        h = self.out_drop(h, deterministic=deterministic)
        return self.proj_dec(h)


class TransducerJoint(nn.Module):
    """Joint network (speechbrain Transducer_joint + transducer_lin):
    joint="sum" -> act(enc + dec); joint="concat" -> act(cat[enc, dec])
    (both reference options, transducer yaml:322-324)."""

    vocab: int
    activation: Callable = gelu_exact
    joint: str = "sum"
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.joint not in ("sum", "concat"):
            raise ValueError(f"joint must be sum|concat, got {self.joint!r}")
        self.transducer_lin = nn.Dense(
            self.vocab, use_bias=False, param_dtype=self.param_dtype,
            name="transducer_lin",
        )

    def _combine(self, enc: Array, dec: Array) -> Array:
        if self.joint == "sum":
            return self.activation(enc + dec)
        return self.activation(jnp.concatenate(
            [jnp.broadcast_to(enc, jnp.broadcast_shapes(enc.shape, dec.shape)),
             jnp.broadcast_to(dec, jnp.broadcast_shapes(enc.shape, dec.shape))],
            axis=-1,
        ))

    def __call__(self, enc_proj: Array, dec_proj: Array) -> Array:
        """enc_proj [B, T, J]; dec_proj [B, U+1, J] -> [B, T, U+1, V]."""
        return self.transducer_lin(
            self._combine(enc_proj[:, :, None, :], dec_proj[:, None, :, :])
        )

    def step(self, enc_frame: Array, dec_step: Array) -> Array:
        """enc_frame [B, J]; dec_step [B, J] -> [B, V] logits."""
        return self.transducer_lin(self._combine(enc_frame, dec_step))


class TransducerModel(nn.Module):
    """Full transducer graph over encoder outputs: proj_enc + predictor +
    joint (+ proj_ctc head for the CTC aux loss, + dec_lin for CE aux)."""

    vocab: int
    dec_dim: int = 512
    joint_dim: int = 640
    # "sum" (reference transducer yaml:324 joint: sum) or "concat"
    joint_type: str = "sum"
    blank_id: int = 0
    activation: Callable = gelu_exact
    emb_dropout: float = 0.2
    dec_dropout: float = 0.1
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.proj_enc = nn.Dense(self.joint_dim, use_bias=False,
                                 param_dtype=self.param_dtype, name="proj_enc")
        self.predictor = TransducerPredictor(
            vocab=self.vocab, dec_dim=self.dec_dim, joint_dim=self.joint_dim,
            blank_id=self.blank_id, emb_dropout=self.emb_dropout,
            dropout=self.dec_dropout, param_dtype=self.param_dtype,
            name="predictor",
        )
        self.joint = TransducerJoint(
            vocab=self.vocab, activation=self.activation,
            joint=self.joint_type,
            param_dtype=self.param_dtype, name="joint",
        )
        self.proj_ctc = nn.Dense(self.vocab, param_dtype=self.param_dtype,
                                 name="proj_ctc")
        # CE aux head over the prediction network (transducer yaml:312-315
        # dec_lin, "MTL with LM over the decoder")
        self.dec_lin = nn.Dense(self.vocab, use_bias=False,
                                param_dtype=self.param_dtype, name="dec_lin")

    def __call__(
        self,
        enc_out: Array,
        tokens_bos: Array,
        deterministic: bool = True,
    ) -> Array:
        """enc_out [B, T, enc_dim]; tokens_bos [B, U+1] -> logits
        [B, T, U+1, V]."""
        enc_proj = self.proj_enc(enc_out)
        dec_proj = self.predictor(tokens_bos, deterministic=deterministic)
        return self.joint(enc_proj, dec_proj)

    def init_all(self, enc_out: Array, tokens_bos: Array):
        """Touches every submodule so flax init creates all params
        (ctc_head / ce_head are not reached by __call__)."""
        return (self(enc_out, tokens_bos), self.ctc_head(enc_out),
                self.ce_head(tokens_bos))

    def ce_head(self, tokens_bos: Array,
                deterministic: bool = True) -> Array:
        """Next-token log-probs from the prediction network alone
        ([B, U+1, V]); position u predicts target u."""
        dec_proj = self.predictor(tokens_bos, deterministic=deterministic)
        return self.ce_from_dec(dec_proj)

    def ce_from_dec(self, dec_proj: Array) -> Array:
        """CE log-probs from an ALREADY-computed predictor output — the
        train step shares one dropout-applied dec_proj between the joint
        and this aux head (reference: dec_lin over the same decoder
        output, transducer yaml:319-320)."""
        return jax.nn.log_softmax(self.dec_lin(dec_proj), axis=-1)

    def ctc_head(self, enc_out: Array) -> Array:
        """CTC aux log-probs from the projected encoder (transducer
        yaml:280-284: proj_ctc over proj_enc)."""
        return jax.nn.log_softmax(
            self.proj_ctc(self.proj_enc(enc_out)), axis=-1
        )

    # pieces for search
    def encode_proj(self, enc_out: Array) -> Array:
        return self.proj_enc(enc_out)

    def predictor_init(self, batch: int):
        return self.predictor.initial_state(batch)

    def predictor_step(self, carry, token: Array):
        return self.predictor.step(carry, token)

    def joint_step(self, enc_frame: Array, dec_step: Array) -> Array:
        return self.joint.step(enc_frame, dec_step)
