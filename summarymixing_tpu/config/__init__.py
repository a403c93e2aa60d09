from summarymixing_tpu.config.schema import (
    DecodingConfig,
    FeaturesConfig,
    ModelConfig,
    RecipeConfig,
    TrainingConfig,
    TransducerConfig,
)
from summarymixing_tpu.config.loader import load_recipe, build_model

__all__ = [
    "DecodingConfig",
    "FeaturesConfig",
    "ModelConfig",
    "RecipeConfig",
    "TrainingConfig",
    "TransducerConfig",
    "load_recipe",
    "build_model",
]
