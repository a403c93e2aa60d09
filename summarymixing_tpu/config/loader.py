"""YAML recipe loader + model builder.

Plain-YAML replacement for HyperPyYAML: a recipe file is a nested mapping
whose keys mirror the dataclass schema (and thus the reference YAML
hyperparameter names); `load_recipe` materialises a RecipeConfig,
`build_model` turns it into the flax model objects."""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import yaml

from summarymixing_tpu.config.schema import (
    AugmentConfig,
    DecodingConfig,
    FeaturesConfig,
    LMConfig,
    ModelConfig,
    RecipeConfig,
    TrainingConfig,
    TransducerConfig,
)

_SECTIONS = {
    "features": FeaturesConfig,
    "augment": AugmentConfig,
    "model": ModelConfig,
    "transducer": TransducerConfig,
    "lm": LMConfig,
    "training": TrainingConfig,
    "decoding": DecodingConfig,
}


def _build_section(cls, data: dict):
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for key, value in data.items():
        if key not in fields:
            raise ValueError(f"unknown {cls.__name__} field: {key!r}")
        if isinstance(value, list):
            value = tuple(value)
        kwargs[key] = value
    return cls(**kwargs)


def load_recipe(path: str, overrides: Optional[dict] = None) -> RecipeConfig:
    with open(path) as f:
        data = yaml.safe_load(f) or {}
    if overrides:
        for dotted, value in overrides.items():
            parts = dotted.split(".")
            node = data
            for p in parts[:-1]:
                # a present-but-empty section ("lm:") parses as None;
                # normalise so the override can be applied
                if node.get(p) is None:
                    node[p] = {}
                node = node[p]
            node[parts[-1]] = value
    kwargs = {}
    for key, value in data.items():
        if key in _SECTIONS:
            kwargs[key] = _build_section(_SECTIONS[key], value or {})
        else:
            kwargs[key] = tuple(value) if isinstance(value, list) else value
    return RecipeConfig(**kwargs)


_ACTIVATIONS = {
    # "gelu" maps to the tanh approximation for training: measured 2x faster
    # than erf-GELU on the [B,T,3072] cgMLP activations (v5e; see
    # benchmarks/RESULTS.md) and accuracy-neutral when training from
    # scratch. Use "gelu_exact" to bit-match torch-converted checkpoints.
    "gelu": partial(jax.nn.gelu, approximate=True),
    "gelu_exact": partial(jax.nn.gelu, approximate=False),
    "relu": jax.nn.relu,
    "swish": jax.nn.silu,
    "silu": jax.nn.silu,
    "leaky_relu": jax.nn.leaky_relu,
}


def build_model(cfg: RecipeConfig):
    """RecipeConfig -> (SpeechRecognizer, Fbank[, TransducerModel])."""
    import jax.numpy as jnp

    from summarymixing_tpu.frontend.features import Fbank
    from summarymixing_tpu.models.asr import TransformerASR
    from summarymixing_tpu.models.speech_recognizer import SpeechRecognizer
    from summarymixing_tpu.models.transducer import TransducerModel

    m = cfg.model
    act = _ACTIVATIONS[m.activation]
    dtype = jnp.bfloat16 if cfg.training.precision == "bf16" else None
    asr = TransformerASR(
        tgt_vocab=m.output_neurons,
        input_size=m.input_size,
        d_model=m.d_model,
        nhead=m.nhead,
        num_encoder_layers=m.num_encoder_layers,
        num_decoder_layers=m.num_decoder_layers,
        d_ffn=m.d_ffn,
        dropout_rate=m.transformer_dropout,
        encoder_module=m.encoder_module,
        attention_type=m.attention_type,
        decoder_attention_type=m.decoder_attention_type,
        mode=m.mode,
        causal=m.causal,
        normalize_before=m.normalize_before,
        kernel_size=m.csgu_kernel_size,
        csgu_linear_units=m.csgu_linear_units,
        local_proj_hid_dim=tuple(m.local_proj_hid_dim),
        local_proj_out_dim=m.local_proj_out_dim,
        summary_hid_dim=tuple(m.summary_hid_dim),
        summary_out_dim=m.summary_out_dim,
        branchformer_activation=act,
        conformer_activation=_ACTIVATIONS["swish"]
        if m.encoder_module == "conformer" and m.activation == "swish"
        else act,
        # the yaml's activation feeds the decoder/encoder FFNs too
        # (reference yaml:169 activation: !ref <activation> = GELU)
        activation=act,
        remat=m.remat,
        act_int8=m.act_int8,
        max_length=m.max_length,
        dtype=dtype,
    )
    model = SpeechRecognizer(
        asr=asr,
        vocab_size=m.output_neurons,
        frontend_channels=tuple(m.frontend_channels),
        frontend_strides=tuple(m.frontend_strides),
        frontend_dropout=m.transformer_dropout,
        dtype=dtype,
    )
    f = cfg.features
    fbank = Fbank(
        sample_rate=f.sample_rate,
        n_fft=f.n_fft,
        win_length_ms=float(f.win_length),
        hop_length_ms=float(f.hop_length),
        n_mels=f.n_mels,
    )
    transducer = None
    if cfg.transducer is not None:
        t = cfg.transducer
        transducer = TransducerModel(
            vocab=m.output_neurons,
            joint_type=t.joint,
            dec_dim=t.dec_dim,
            joint_dim=t.joint_dim,
            blank_id=m.blank_index,
            activation=act,
            emb_dropout=t.dec_emb_dropout,
            dec_dropout=t.dec_dropout,
        )
    return model, fbank, transducer
