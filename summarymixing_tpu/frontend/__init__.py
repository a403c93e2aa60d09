from summarymixing_tpu.frontend.features import (
    Fbank,
    InputNormalization,
    NormStats,
    mel_filterbank,
    stft_magnitude,
)
from summarymixing_tpu.frontend.augment import (
    Augmenter,
    SpecAugmentConfig,
    spec_augment,
    speed_perturb_batch,
)

__all__ = [
    "Fbank",
    "InputNormalization",
    "NormStats",
    "mel_filterbank",
    "stft_magnitude",
    "Augmenter",
    "SpecAugmentConfig",
    "spec_augment",
    "speed_perturb_batch",
]
