"""Transducer training: encoder (streaming-capable Conformer) + predictor +
joint + RNN-T loss (+ CTC/CE aux), with Dynamic Chunk Training sampling.

Capability parity with the transducer recipes (SURVEY.md §3.3,
conformer_summarymixing_transducer.yaml):
- dynchunktrain_config_sampler (yaml:74-99): chunkwise training with prob
  0.6, chunk size ~ U[8, 32], limited left context with prob 0.75 of
  U[2, 32] chunks. Sampled with jax PRNG as TRACED scalars: the chunk mask
  and DCConv are gated arithmetically, so every sampled configuration runs
  the same compiled program (no-chunk == chunk_size = T).
- loss = transducer_loss + ctc_weight * ctc_aux + ce_weight * ce_aux
  (yaml:57-58,297-336).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import optax

from summarymixing_tpu.frontend.augment import SpecAugmentConfig, spec_augment
from summarymixing_tpu.frontend.features import Fbank, InputNormalization, NormStats
from summarymixing_tpu.losses import (
    ctc_loss,
    nll_loss,
    transducer_loss,
    transducer_loss_chunked,
)
from summarymixing_tpu.models.asr import DynChunkTrainConfig
from summarymixing_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from summarymixing_tpu.training.optim import apply_safe_update

Array = jax.Array


@dataclass(frozen=True)
class DynChunkTrainSamplerConfig:
    """yaml:74-99."""

    chunkwise_prob: float = 0.6
    chunk_size_min: int = 8
    chunk_size_max: int = 32
    limited_left_context_prob: float = 0.75
    left_context_chunks_min: int = 2
    left_context_chunks_max: int = 32


def sample_dynchunk(
    key: Array, max_frames: int, cfg: DynChunkTrainSamplerConfig
) -> DynChunkTrainConfig:
    """Sample a DCT config with traced values. 'No chunking' is encoded as
    chunk_size = max_frames (full context); 'infinite left context' as
    left_context_chunks covering the whole sequence."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    use_chunks = jax.random.uniform(k1, ()) < cfg.chunkwise_prob
    chunk = jax.random.randint(
        k2, (), cfg.chunk_size_min, cfg.chunk_size_max + 1
    )
    chunk = jnp.where(use_chunks, chunk, max_frames)
    limited = jax.random.uniform(k3, ()) < cfg.limited_left_context_prob
    left = jax.random.randint(
        k4, (), cfg.left_context_chunks_min, cfg.left_context_chunks_max + 1
    )
    left = jnp.where(limited & use_chunks, left, max_frames)
    return DynChunkTrainConfig(chunk_size=chunk, left_context_size=left)


@dataclass(frozen=True)
class TransducerTrainerConfig:
    ctc_weight: float = 0.3
    ce_weight: float = 0.0
    # CTC aux only while epoch < number_of_ctc_epochs (LibriSpeech transducer
    # yaml:56 = 60, VoxPopuli yaml:46 = 10); None = always on
    number_of_ctc_epochs: Optional[int] = None
    blank_id: int = 0
    pad_id: int = 0
    augment: Optional[SpecAugmentConfig] = SpecAugmentConfig()
    # no feature augmentation before this step (VoxPopuli yaml:41)
    augment_warmup_steps: int = 0
    normalize_update_until_epoch: int = 4
    dct: Optional[DynChunkTrainSamplerConfig] = DynChunkTrainSamplerConfig()
    # reference TransformerASR.py:681-684 xavier-normal overwrite of the
    # ASR module (see trainer.py)
    xavier_init_overwrite: bool = True
    # > 0: compute the joint in T-chunks of this many encoder frames and
    # never materialise the [B, T, U+1, V] logits (exact; rematerialised
    # backward — losses/transducer.py::transducer_loss_chunked)
    joint_chunk: int = 0


class TransducerTrainer:
    """encoder_model: SpeechRecognizer-like module exposing encode();
    transducer_model: models.transducer.TransducerModel."""

    def __init__(
        self,
        encoder_model,
        transducer_model,
        tx: optax.GradientTransformation,
        fbank: Fbank = Fbank(),
        config: TransducerTrainerConfig = TransducerTrainerConfig(),
        mesh=None,
    ):
        self.encoder_model = encoder_model
        self.transducer_model = transducer_model
        self.tx = tx
        self.fbank = fbank
        self.config = config
        self.mesh = mesh if mesh is not None else make_mesh()
        self.normalize = InputNormalization(
            update_until_epoch=config.normalize_update_until_epoch
        )
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=0)
        self._eval_loss = jax.jit(self._eval_loss_impl)

    def init_state(self, rng: Array, example_batch: Dict[str, Array]) -> Dict:
        r1, r2, r3, train_rng = jax.random.split(rng, 4)
        feats = self.fbank(example_batch["wav"][:1])
        feat_len = self.fbank.frame_lengths(example_batch["wav_lens"][:1])
        enc_params = self.encoder_model.init({"params": r1}, feats, feat_len)[
            "params"
        ]
        if self.config.xavier_init_overwrite and "asr" in enc_params:
            from summarymixing_tpu.utils.init import xavier_normal_overwrite

            enc_params = dict(enc_params)
            enc_params["asr"] = xavier_normal_overwrite(
                r3, enc_params["asr"])
        enc_out, _ = self.encoder_model.apply(
            {"params": enc_params}, feats, feat_len,
            method=self.encoder_model.encode,
        )
        tokens_bos = self._add_blank_bos(example_batch["tokens"][:1])
        td_params = self.transducer_model.init(
            {"params": r2}, enc_out, tokens_bos,
            method=self.transducer_model.init_all,
        )["params"]
        params = {"encoder": enc_params, "transducer": td_params}
        state = {
            "params": params,
            "opt_state": self.tx.init(params),
            "norm_stats": NormStats.init(self.fbank.n_mels),
            "step": jnp.zeros((), jnp.int32),
            "epoch": jnp.zeros((), jnp.int32),
            # training-time stochasticity seeded from the caller rng
            "rng": train_rng,
        }
        rep = replicate(self.mesh)
        return jax.tree.map(lambda x: jax.device_put(x, rep), state)

    def _add_blank_bos(self, tokens: Array) -> Array:
        """Transducer prediction input: blank-prefixed targets (the recipes
        use bos == blank == 0, yaml:146-149)."""
        b = tokens.shape[0]
        bos = jnp.full((b, 1), self.config.blank_id, tokens.dtype)
        return jnp.concatenate([bos, tokens], axis=1)

    def _forward_loss(self, params, norm_stats, batch, rng, deterministic,
                      epoch, step=0):
        cfg = self.config
        feats = self.fbank(batch["wav"])
        feat_len = self.fbank.frame_lengths(batch["wav_lens"])
        pad_mask = (
            jnp.arange(feats.shape[1])[None, :] < feat_len[:, None]
        ).astype(feats.dtype)
        feats, norm_stats = self.normalize(
            feats, norm_stats, pad_mask, epoch=epoch, update=not deterministic
        )
        rng, k_aug, k_dct = jax.random.split(rng, 3)
        if not deterministic and cfg.augment is not None:
            aug = spec_augment(k_aug, feats, pad_mask, cfg.augment)
            if cfg.augment_warmup_steps > 0:
                aug = jnp.where(step >= cfg.augment_warmup_steps, aug, feats)
            feats = aug

        dct = None
        if not deterministic and cfg.dct is not None:
            # sampled in encoder-frame units (after the frontend's actual
            # subsampling — strides are configurable)
            max_frames = feats.shape[1]
            for stride in getattr(self.encoder_model, "frontend_strides", (2, 2)):
                max_frames = -(-max_frames // stride)
            dct = sample_dynchunk(k_dct, max_frames + 1, cfg.dct)

        rngs = {"dropout": rng} if not deterministic else {}
        enc_out, enc_lens = self.encoder_model.apply(
            {"params": params["encoder"]}, feats, feat_len,
            dynchunktrain=dct,
            deterministic=deterministic,  # train-time encoder dropout ON
            method=self.encoder_model.encode,
            rngs=rngs,
        )

        tokens = batch["tokens"]
        token_lens = batch["token_lens"]
        tokens_bos = self._add_blank_bos(tokens)
        td_params = {"params": params["transducer"]}
        losses = {}
        # the reference passes NO reduction to transducer_cost
        # (conformer_summarymixing_transducer.yaml:333-336), so the
        # speechbrain default "mean" applies — only ctc_cost gets the
        # yaml's loss_reduction "batchmean" (yaml:297-299)
        # ONE predictor pass shared by the joint AND the CE aux (the
        # reference's dec_lin reads the same dropout-applied decoder
        # output the joint consumes; a separate deterministic ce_head
        # pass both wasted a forward and regularized differently)
        enc_proj = self.transducer_model.apply(
            td_params, enc_out, method=self.transducer_model.encode_proj)
        dec_proj = self.transducer_model.apply(
            td_params, tokens_bos,
            method=lambda m, t: m.predictor(
                t, deterministic=deterministic),
            rngs=rngs,
        )
        if cfg.joint_chunk > 0:
            l_t = transducer_loss_chunked(
                enc_proj, dec_proj,
                lambda e, d: self.transducer_model.apply(
                    td_params, e, d, method=lambda m, e, d: m.joint(e, d)),
                tokens, enc_lens, token_lens, blank_id=cfg.blank_id,
                reduction="mean", chunk_size=cfg.joint_chunk,
            )
        else:
            logits = self.transducer_model.apply(
                td_params, enc_proj, dec_proj,
                method=lambda m, e, d: m.joint(e, d),
            )
            l_t = transducer_loss(
                logits, tokens, enc_lens, token_lens, blank_id=cfg.blank_id,
                reduction="mean",
            )
        losses["transducer"] = l_t
        loss = l_t
        if cfg.ctc_weight > 0.0:

            def _ctc_aux():
                ctc_lp = self.transducer_model.apply(
                    {"params": params["transducer"]}, enc_out,
                    method=self.transducer_model.ctc_head,
                )
                return ctc_loss(
                    ctc_lp, enc_lens, tokens, token_lens,
                    blank_id=cfg.blank_id,
                ).astype(jnp.float32)

            if cfg.number_of_ctc_epochs is not None:
                # Epoch-gated aux (traced epoch -> same compiled program).
                # lax.cond rather than a 0-weight multiply: after the gate
                # the CTC head/loss (and its backward) are not computed at
                # all — matching the reference's Python-level epoch gate
                # (train.py `epoch <= number_of_ctc_epochs`) and keeping a
                # degenerate CTC batch from leaking 0 * huge into the loss.
                l_ctc = jax.lax.cond(
                    epoch < cfg.number_of_ctc_epochs,
                    _ctc_aux,
                    lambda: jnp.zeros((), jnp.float32),
                )
            else:
                l_ctc = _ctc_aux()
            losses["ctc"] = l_ctc
            loss = loss + cfg.ctc_weight * l_ctc
        if cfg.ce_weight > 0.0:
            # CE over the prediction network: position u predicts
            # tokens[u] — from the SAME dec_proj the joint consumed
            ce_lp = self.transducer_model.apply(
                td_params, dec_proj,
                method=self.transducer_model.ce_from_dec,
            )[:, :-1]
            l_ce = nll_loss(ce_lp, tokens, token_lens)
            losses["ce"] = l_ce
            loss = loss + cfg.ce_weight * l_ce
        losses["loss"] = loss
        return loss, (losses, norm_stats, (enc_out, enc_lens))

    def _train_step_impl(self, state, batch):
        rng, step_rng = jax.random.split(state["rng"])
        grad_fn = jax.value_and_grad(self._forward_loss, has_aux=True)
        (_, (losses, norm_stats, _)), grads = grad_fn(
            state["params"], state["norm_stats"], batch, step_rng, False,
            state["epoch"], state["step"],
        )
        new_state, grad_norm, finite = apply_safe_update(
            self.tx, state, grads, losses, norm_stats, rng
        )
        losses = dict(losses)
        losses["grad_norm"] = grad_norm
        losses["nonfinite_skipped"] = (~finite).astype(jnp.int32)
        return new_state, losses

    def _eval_loss_impl(self, state, batch):
        _, (losses, _, enc) = self._forward_loss(
            state["params"], state["norm_stats"], batch,
            jax.random.PRNGKey(0), True, state["epoch"],
        )
        return losses, enc

    def next_epoch(self, state):
        """Advance the epoch counter (gates normalizer freezing and
        number_of_ctc_epochs) — same API as ASRTrainer.next_epoch."""
        state["epoch"] = state["epoch"] + 1
        return state

    def train_step(self, state, batch):
        return self._train_step(state, shard_batch(batch, self.mesh))

    def eval_step(self, state, batch):
        return self._eval_loss(state, shard_batch(batch, self.mesh))
