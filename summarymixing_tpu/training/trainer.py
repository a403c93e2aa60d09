"""Training orchestration: a single jitted train step (feature extraction ->
augmentation -> model -> joint CTC/attention loss -> optimizer update) with
data-parallel batch sharding, plus the fit/eval loops.

Capability parity with the reference's L6 (SURVEY.md §1): sb.Brain fit loop,
grad accumulation, max_grad_norm clipping, InputNormalization freezing,
bf16/fp32 precision — rebuilt as one functional step:

- the WHOLE step (fbank, SpecAugment, CNN, encoder, decoder, losses, grads,
  optimizer, normalizer stats) is one jit with donated state, so there is a
  single host->device transfer per step and zero Python in the hot loop;
- batch arrays are sharded over the mesh "data" axis; XLA inserts the
  gradient all-reduce over ICI (replaces DDP/NCCL, SURVEY.md §2.4);
- randomness is an explicit PRNG key in the state (replaces torch globals).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import optax

from summarymixing_tpu.data.batching import pad_batch
from summarymixing_tpu.decoding.ctc import collapse_ctc, ctc_greedy_decode
from summarymixing_tpu.frontend.augment import SpecAugmentConfig, spec_augment
from summarymixing_tpu.frontend.features import Fbank, InputNormalization, NormStats
from summarymixing_tpu.losses import ctc_loss, kldiv_loss
from summarymixing_tpu.training.optim import apply_safe_update
from summarymixing_tpu.parallel.mesh import (
    data_parallel_sharding,
    make_mesh,
    replicate,
    shard_batch,
)

Array = jax.Array


@dataclass(frozen=True)
class TrainerConfig:
    ctc_weight: float = 0.3
    label_smoothing: float = 0.1
    blank_id: int = 0
    pad_id: int = 0
    bos_id: int = 1
    eos_id: int = 2
    augment: Optional[SpecAugmentConfig] = SpecAugmentConfig()
    # Augmenter concat_original (AISHELL yaml:274): the train batch becomes
    # [original; augmented] along the batch axis, targets replicated
    concat_original: bool = False
    # no feature augmentation before this step (VoxPopuli yaml:41)
    augment_warmup_steps: int = 0
    normalize_update_until_epoch: int = 4
    # reference TransformerASR._init_params (TransformerASR.py:681-684):
    # AFTER construction, every >1-D parameter of the ASR module is redrawn
    # xavier-normal, overwriting the SummaryMixing cell's own init — a quirk
    # every reference-trained model inherits, so from-scratch training
    # reproduces it (False for experiments keeping the cell's native init)
    xavier_init_overwrite: bool = True



class ASRTrainer:
    """Joint CTC/attention (or CTC-only when the model has no decoder)."""

    def __init__(
        self,
        model,                      # SpeechRecognizer
        tx: optax.GradientTransformation,
        fbank: Fbank = Fbank(),
        config: TrainerConfig = TrainerConfig(),
        mesh=None,
        param_sharding_fn=None,     # e.g. tensor_parallel_param_sharding(mesh)
    ):
        self.model = model
        self.tx = tx
        self.fbank = fbank
        self.config = config
        self.mesh = mesh if mesh is not None else make_mesh()
        self.param_sharding_fn = param_sharding_fn
        self.normalize = InputNormalization(
            update_until_epoch=config.normalize_update_until_epoch
        )
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=0)
        self._eval_step = jax.jit(self._eval_step_impl)

    # -- state ---------------------------------------------------------------
    def init_state(self, rng: Array, example_batch: Dict[str, Array]) -> Dict:
        feats = self.fbank(example_batch["wav"][:1])
        feat_len = self.fbank.frame_lengths(example_batch["wav_lens"][:1])
        tokens_bos = self._add_bos(example_batch["tokens"][:1])
        rng, init_rng, train_rng = jax.random.split(rng, 3)
        params = self.model.init(
            {"params": rng}, feats, feat_len, tokens_bos
        )["params"]
        if self.config.xavier_init_overwrite and "asr" in params:
            from summarymixing_tpu.utils.init import xavier_normal_overwrite

            params = dict(params)
            params["asr"] = xavier_normal_overwrite(init_rng, params["asr"])
        state = {
            "params": params,
            "opt_state": self.tx.init(params),
            "norm_stats": NormStats.init(self.fbank.n_mels),
            "step": jnp.zeros((), jnp.int32),
            "epoch": jnp.zeros((), jnp.int32),
            # training-time stochasticity (dropout/SpecAugment) seeded
            # from the caller rng — different seeds must diverge
            "rng": train_rng,
        }
        rep = replicate(self.mesh)
        if self.param_sharding_fn is not None:
            # tensor-parallel: shard params (and the optimizer moments, whose
            # leaves mirror param shapes) per rule; everything else replicated
            for k in ("params", "opt_state"):
                state[k] = jax.tree.map(
                    jax.device_put, state[k], self.param_sharding_fn(state[k])
                )
            for k in ("norm_stats", "step", "epoch", "rng"):
                state[k] = jax.tree.map(
                    lambda x: jax.device_put(x, rep), state[k]
                )
            return state
        return jax.tree.map(lambda x: jax.device_put(x, rep), state)

    def _add_bos(self, tokens: Array) -> Array:
        b = tokens.shape[0]
        bos = jnp.full((b, 1), self.config.bos_id, tokens.dtype)
        return jnp.concatenate([bos, tokens], axis=1)

    def _add_eos(self, tokens: Array, token_lens: Array) -> Array:
        b, u = tokens.shape
        padded = jnp.concatenate(
            [tokens, jnp.full((b, 1), self.config.pad_id, tokens.dtype)], axis=1
        )
        pos = jnp.arange(u + 1)[None, :]
        return jnp.where(
            pos == token_lens[:, None],
            jnp.asarray(self.config.eos_id, tokens.dtype),
            padded,
        )

    # -- steps ---------------------------------------------------------------
    def _forward_loss(self, params, norm_stats, batch, rng, deterministic,
                      epoch, step=0):
        cfg = self.config
        feats = self.fbank(batch["wav"])
        feat_len = self.fbank.frame_lengths(batch["wav_lens"])
        pad_mask = (
            jnp.arange(feats.shape[1])[None, :] < feat_len[:, None]
        ).astype(feats.dtype)

        feats, norm_stats = self.normalize(
            feats, norm_stats, pad_mask,
            epoch=epoch, update=not deterministic,
        )
        tokens = batch["tokens"]
        token_lens = batch["token_lens"]
        if not deterministic and cfg.augment is not None:
            rng, k = jax.random.split(rng)
            aug = spec_augment(k, feats, pad_mask, cfg.augment)
            if cfg.augment_warmup_steps > 0:
                aug = jnp.where(step >= cfg.augment_warmup_steps, aug, feats)
            if cfg.concat_original:
                feats = jnp.concatenate([feats, aug], axis=0)
                feat_len = jnp.concatenate([feat_len, feat_len], axis=0)
                pad_mask = jnp.concatenate([pad_mask, pad_mask], axis=0)
                tokens = jnp.concatenate([tokens, tokens], axis=0)
                token_lens = jnp.concatenate([token_lens, token_lens], axis=0)
            else:
                feats = aug
        tokens_bos = self._add_bos(tokens) if self._has_decoder() else None

        rngs = {"dropout": rng} if not deterministic else {}
        out = self.model.apply(
            {"params": params},
            feats, feat_len, tokens_bos,
            pad_idx=cfg.pad_id,
            deterministic=deterministic,
            rngs=rngs,
        )

        losses = {}
        loss = 0.0
        if cfg.ctc_weight > 0.0:
            l_ctc = ctc_loss(
                out["ctc_log_probs"], out["enc_lengths"], tokens, token_lens,
                blank_id=cfg.blank_id,
            )
            losses["ctc"] = l_ctc
            loss += cfg.ctc_weight * l_ctc
        if self._has_decoder() and cfg.ctc_weight < 1.0:
            tokens_eos = self._add_eos(tokens, token_lens)
            l_att = kldiv_loss(
                out["seq_log_probs"], tokens_eos, token_lens + 1,
                label_smoothing=cfg.label_smoothing,
            )
            losses["att"] = l_att
            loss += (1.0 - cfg.ctc_weight) * l_att
        losses["loss"] = loss
        return loss, (losses, norm_stats, out)

    def _has_decoder(self) -> bool:
        return self.model.asr.num_decoder_layers > 0

    def _train_step_impl(self, state, batch):
        rng, step_rng = jax.random.split(state["rng"])
        grad_fn = jax.value_and_grad(self._forward_loss, has_aux=True)
        (_, (losses, norm_stats, _)), grads = grad_fn(
            state["params"], state["norm_stats"], batch, step_rng,
            False, state["epoch"], state["step"],
        )
        new_state, grad_norm, finite = apply_safe_update(
            self.tx, state, grads, losses, norm_stats, rng
        )
        metrics = {k: v for k, v in losses.items()}
        metrics["grad_norm"] = grad_norm
        metrics["nonfinite_skipped"] = (~finite).astype(jnp.int32)
        return new_state, metrics

    def _eval_step_impl(self, state, batch):
        loss, (losses, _, out) = self._forward_loss(
            state["params"], state["norm_stats"], batch,
            jax.random.PRNGKey(0), True, state["epoch"],
        )
        ids, keep = ctc_greedy_decode(
            out["ctc_log_probs"], out["enc_lengths"], self.config.blank_id
        )
        return losses, ids, keep

    # -- public --------------------------------------------------------------
    def train_step(self, state, batch):
        return self._train_step(state, shard_batch(batch, self.mesh))

    def eval_step(self, state, batch):
        losses, ids, keep = self._eval_step(state, shard_batch(batch, self.mesh))
        # multi-process runs shard the batch over every host's devices;
        # gather the (tiny) id tensors so host-side decoding sees the
        # full batch on every process (parallel/launch.py)
        from summarymixing_tpu.parallel.launch import fetch_global

        return losses, collapse_ctc(fetch_global(ids), fetch_global(keep))

    def next_epoch(self, state):
        state["epoch"] = state["epoch"] + 1
        return state
