"""Recipe configuration schema — the dataclass-tree replacement for the
reference's HyperPyYAML object graphs (SURVEY.md §5 "Config/flag system").
Hyperparameter names and defaults mirror the reference YAMLs so a user of
the reference recipes finds the same knobs with the same meanings."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass
class FeaturesConfig:
    sample_rate: int = 16000
    n_fft: int = 512
    # ms; speechbrain Fbank default (25) — the LibriSpeech recipes override
    # to 32 explicitly (reference yaml:71); AISHELL/CommonVoice do not and
    # run 25 ms windows with their n_fft 400
    win_length: int = 25
    hop_length: int = 10       # ms
    n_mels: int = 80
    normalize_update_until_epoch: int = 4


@dataclass
class AugmentConfig:
    # feature-domain augmentation on/off (VoxPopuli's reference yaml:332-343
    # ships fea_augment commented out -> disabled)
    fea_augment: bool = True
    speed_perturb: bool = True
    speeds: Tuple[int, ...] = (95, 100, 105)
    time_drop_length_low: int = 15
    time_drop_length_high: int = 25
    time_drop_count: int = 4
    freq_drop_length_low: int = 10
    freq_drop_length_high: int = 20
    freq_drop_count: int = 4
    time_warp_window: int = 5
    drop_replace: str = "mean"
    # Augmenter combinator knobs (reference Augmenter blocks, e.g. AISHELL
    # yaml:273-284: concat_original True + min/max_augmentations 1)
    min_augmentations: int = 3
    max_augmentations: int = 3
    shuffle_augmentations: bool = False
    concat_original: bool = False
    # no feature augmentation before this many optimizer steps
    # (VoxPopuli yaml:41 augment_warmup_steps)
    augment_warmup_steps: int = 0


@dataclass
class ModelConfig:
    # Transformer/encoder block (reference yaml:112-133)
    attention_type: str = "SummaryMixing"
    mode: str = "SummaryMixing"
    encoder_module: str = "branchformer"
    # decoder self-attention mixer: "regularMHA" (reference hardwired,
    # Transformer.py:274) or "SummaryMixing" (the paper's Summary Decoder,
    # reference README.md:35 — +Summary Decoder row)
    decoder_attention_type: str = "regularMHA"
    d_model: int = 512
    nhead: int = 1
    num_encoder_layers: int = 18
    num_decoder_layers: int = 6
    d_ffn: int = 2048
    transformer_dropout: float = 0.1
    normalize_before: bool = True   # reference yaml:175 / Transformer.py:141
    activation: str = "gelu"
    csgu_linear_units: int = 3072
    csgu_kernel_size: int = 31
    local_proj_hid_dim: Tuple[int, ...] = (512,)
    local_proj_out_dim: int = 512
    summary_hid_dim: Tuple[int, ...] = (512,)
    summary_out_dim: int = 512
    causal: bool = False
    # positional-encoding table length in post-subsample frames (~40 ms
    # each). Streams/utterances longer than this clamp to the last PE
    # window — raise for very long-form audio (reference yaml max_length
    # is the same knob on PositionalEncoding)
    max_length: int = 2500
    # rematerialize encoder layers in the backward pass: peak activation
    # memory O(T) instead of O(layers*T) for one extra forward's FLOPs
    # (TPU-native memory lever; no reference equivalent)
    remat: bool = False
    # W8A8 int8 cgMLP projections for inference (ops/quant.py). Measured
    # SLOWER than bf16 through XLA on v5e (RESULTS.md "int8 W8A8
    # decode") — kept as the documented closure of that question; leave
    # false in production
    act_int8: bool = False
    # frontend (reference yaml:147-154)
    input_size: int = 640
    frontend_channels: Tuple[int, ...] = (64, 32)
    frontend_strides: Tuple[int, ...] = (2, 2)
    # vocabulary (reference yaml:133-139)
    output_neurons: int = 5000
    blank_index: int = 0
    pad_index: int = 0
    bos_index: int = 1
    eos_index: int = 2


@dataclass
class TransducerConfig:
    joint_dim: int = 640
    # joint combination (reference transducer yaml:322-324): sum | concat
    joint: str = "sum"
    dec_dim: int = 512
    dec_emb_dropout: float = 0.2
    dec_dropout: float = 0.1
    # compute the joint in T-chunks of this many encoder frames instead of
    # materialising the full [B, T, U+1, V] logits (the train step's
    # largest tensor); exact — losses/transducer.py::transducer_loss_chunked.
    # 0 = dense
    joint_chunk: int = 0
    # DCT sampler (transducer yaml:74-99)
    chunkwise_prob: float = 0.6
    chunk_size_min: int = 8
    chunk_size_max: int = 32
    limited_left_context_prob: float = 0.75
    left_context_chunks_min: int = 2
    left_context_chunks_max: int = 32


@dataclass
class TrainingConfig:
    number_of_epochs: int = 120
    batch_size: int = 16
    grad_accumulation_factor: int = 2
    max_grad_norm: float = 5.0
    loss_reduction: str = "batchmean"
    precision: str = "bf16"
    # JAX PRNG implementation for the run. "rbg" (hardware RngBitGenerator)
    # makes dropout mask generation ~free: measured 80 -> 59 ms/step (-26%)
    # on the flagship train step (benchmarks/RESULTS.md). "threefry" gives
    # the counter-based, implementation-stable stream. Resuming a
    # checkpoint saved under a different impl re-seeds the dropout stream
    # (key shapes differ; recipes/train.py::_fix_restored_rng).
    rng_impl: str = "rbg"
    ctc_weight: float = 0.3
    ce_weight: float = 0.0   # transducer CE aux (yaml:319-320, optional MTL)
    # CTC aux active only for the first N epochs (transducer recipes:
    # LibriSpeech yaml:56 = 60, VoxPopuli yaml:46 = 10); None = always on
    number_of_ctc_epochs: Optional[int] = None
    label_smoothing: float = 0.0
    lr_adam: float = 0.0008
    adam_betas: Tuple[float, float] = (0.9, 0.98)
    adam_eps: float = 1e-9
    weight_decay: float = 0.01
    scheduler: str = "noam"            # noam | warm_exp_decay | two_stage
    n_warmup_steps: int = 30000
    optimizer_step_limit: Optional[int] = None
    decay_factor: float = 0.05
    stage_one_epochs: Optional[int] = None   # two-stage Adam->SGD switch
    lr_sgd: float = 0.000025
    # reference second-stage SGD (AISHELL yaml:173-176): momentum + nesterov
    sgd_momentum: float = 0.99
    sgd_nesterov: bool = True
    # dynamic batching (reference yaml:75-95)
    dynamic_batching: bool = True
    max_batch_length: float = 500.0     # seconds of audio per batch
    # smaller budget for valid/test where the beam is wider (reference
    # max_batch_length_val / max_batch_len_val); None = same as train
    max_batch_length_val: Optional[float] = None
    num_buckets: int = 200
    max_batch_ex: int = 128
    # transducer path: ALSO run the greedy valid stage every N optimizer
    # steps (0 = per-epoch only, the reference cadence). At flagship
    # corpus scale an epoch is hours; step-interval points give a
    # WER-vs-step trajectory inside a bounded chip window.
    valid_every_steps: int = 0
    # snap bucket boundaries to a fixed geometric grid (batching.py::
    # quantize_len) so bucket SHAPES are manifest-independent: a subset
    # manifest / new split reuses the persistent compile cache instead
    # of paying fresh multi-minute XLA:TPU compiles for shifted
    # boundaries (costs <=10% extra padding)
    bucket_shape_grid: bool = False
    # Eval batches pad the token axis up to a multiple of this, so the
    # valid/test loops present ONE compiled shape per wav bucket instead
    # of one per distinct batch-max token length (measured: the flagship
    # valid stage collapses 16 programs -> 8; each extra program is a
    # multi-minute XLA:TPU compile in this environment, and the padding
    # columns are loss-masked by token_lens). Train batches are left
    # exact: their umax concentrates on the corpus maximum anyway. 1 = off.
    eval_token_multiple: int = 16
    # checkpointing
    ckpt_interval_minutes: float = 15.0
    avg_checkpoints: int = 10


@dataclass
class LMConfig:
    """Language model for shallow fusion (reference yaml:183-191:
    TransformerLM 768d/12h/12L/3072, GELU, normalize_before False; and
    transducer yaml:339-348: RNNLM emb 128, 2x2048 LSTM, 512 DNN)."""

    model_type: str = "transformer"   # "transformer" | "rnn"
    d_model: int = 768
    nhead: int = 12
    num_layers: int = 12
    d_ffn: int = 3072
    # rnn variant
    embedding_dim: int = 128
    rnn_layers: int = 2
    rnn_neurons: int = 2048
    dnn_neurons: int = 512
    # TransformerLM output head: "linear" (in-repo trained) or "sb" (the
    # SpeechBrain Linear->LayerNorm->Linear output_proj; set by
    # convert_checkpoint.py for converted published lm.ckpt weights)
    output_proj: str = "linear"
    # training (recipes/train_lm.py)
    lr: float = 1.0e-4
    dropout: float = 0.0
    batch_tokens: int = 4096
    max_seq_len: int = 256


@dataclass
class DecodingConfig:
    valid_search_interval: int = 10
    valid_beam_size: int = 10
    test_beam_size: int = 66
    lm_weight: float = 0.60
    lm_temperature: float = 1.15   # TransformerLMScorer temperature (yaml:235)
    # decoder-softmax temperature at the TEST search stage only
    # (reference test_search `temperature: 1.15`, branchformer yaml:266 /
    # CommonVoice yaml:203; valid_search and AISHELL have none)
    test_temperature: float = 1.0
    ctc_weight_decode: float = 0.40
    min_decode_ratio: float = 0.0
    max_decode_ratio: float = 1.0
    # CTC blank-skip compaction for the joint-beam prefix scorer
    # (decoding/ctc_prefix.py::compact_blank_frames). 0.0 = off (exact).
    # Enabled: frames with blank prob >= ctc_blank_skip collapse into
    # synthetic blank frames; ctc_frame_cap = max kept frames per
    # utterance (0 -> T//4; the scorer's static time axis becomes
    # 2*cap+1, which is what sets the speedup)
    ctc_blank_skip: float = 0.0
    ctc_frame_cap: int = 0
    # HBM budget for one beam-decode program, in hypothesis rows
    # (batch_slice * beam). Eval buckets can be tens of utterances wide;
    # at the reference test config (beam 66, 6L d512 decoder + 12L d768
    # LM) the per-hypothesis KV caches scale linearly in rows, so wide
    # buckets are decoded in row-capped slices (train.py::beam_slices;
    # the trailing slice repeat-pads so every slice is ONE compiled
    # program). 0 = never slice.
    max_beam_rows: int = 1024
    # transducer beam (transducer yaml:150-156)
    beam_size: int = 10
    nbest: int = 1
    state_beam: float = 2.3
    expand_beam: float = 2.3


@dataclass
class RecipeConfig:
    name: str = "librispeech_branchformer_summarymixing"
    seed: int = 3407
    output_folder: str = "results"
    tokenizer_type: str = "sentencepiece"   # or "char"
    token_type: str = "unigram"
    character_coverage: float = 1.0
    features: FeaturesConfig = field(default_factory=FeaturesConfig)
    augment: AugmentConfig = field(default_factory=AugmentConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    transducer: Optional[TransducerConfig] = None
    lm: Optional[LMConfig] = None
    training: TrainingConfig = field(default_factory=TrainingConfig)
    decoding: DecodingConfig = field(default_factory=DecodingConfig)
    # metrics
    error_rate: str = "wer"    # "wer" | "cer" (AISHELL: cer, remove_spaces)
    remove_spaces: bool = False
