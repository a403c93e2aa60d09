"""summarymixing_tpu — a TPU-native (JAX/XLA/Pallas) speech recognition framework.

A ground-up rebuild of the capabilities of SamsungLabs/SummaryMixing
(https://arxiv.org/abs/2307.07421) designed for TPU hardware:

- The SummaryMixing cell (full / lite / fast / exp-decay modes): a linear-time
  replacement for self-attention built from per-step local projections, a
  summary projection, a length-masked mean over time, and a broadcast-concat
  merge. Implemented in pure jnp (XLA-fused) with an optional fused Pallas
  kernel for the hot path.
- Branchformer / Conformer / Transformer encoders and Transformer decoder,
  with streaming (dynamic-chunk) support expressed as explicit functional
  state instead of mutable context objects.
- A jit-lowered speech frontend (STFT/Fbank/SpecAugment/CNN subsampling),
  CTC / joint CTC-attention / transducer losses, greedy + beam decoding,
  length-bucketed batching with static shapes, orbax checkpointing, and
  data-parallel sharding over a `jax.sharding.Mesh`.

Mask convention (everywhere): multiplicative float masks with 1 = valid,
0 = masked. Padding masks are [B, T]; summary masks are [T, T]. This adopts
the SummaryMixing convention globally and deletes the reference's
`masked_false_or_true` polarity bridging (reference TransformerASR.py:344-347).
"""

__version__ = "0.1.0"

from summarymixing_tpu.ops.summary_mixing import SummaryMixing  # noqa: F401
from summarymixing_tpu.ops.linear import ParallelLinear, SummaryNet  # noqa: F401

# Subpackages are imported lazily by users:
#   summarymixing_tpu.models     — encoders/decoders/ASR wrappers/LMs
#   summarymixing_tpu.frontend   — Fbank / SpecAugment / normalization
#   summarymixing_tpu.losses     — ctc / kldiv / transducer
#   summarymixing_tpu.decoding   — greedy / beam / transducer search
#   summarymixing_tpu.training   — trainers / optim / checkpoint / metrics
#   summarymixing_tpu.data       — batching / tokenizers / dataio
#   summarymixing_tpu.parallel   — mesh + sharding helpers
#   summarymixing_tpu.config     — recipe schema + loader
