from summarymixing_tpu.models.branchformer import (
    BranchformerEncoder,
    BranchformerEncoderLayer,
)
from summarymixing_tpu.models.conformer import (
    ConformerDecoder,
    ConformerDecoderLayer,
    ConformerEncoder,
    ConformerEncoderLayer,
)
from summarymixing_tpu.models.transformer import (
    NormalizedEmbedding,
    TransformerDecoder,
    TransformerDecoderLayer,
    TransformerEncoder,
    TransformerEncoderLayer,
)
from summarymixing_tpu.models.asr import TransformerASR, EncoderWrapper

__all__ = [
    "BranchformerEncoder",
    "BranchformerEncoderLayer",
    "ConformerDecoder",
    "ConformerDecoderLayer",
    "ConformerEncoder",
    "ConformerEncoderLayer",
    "NormalizedEmbedding",
    "TransformerDecoder",
    "TransformerDecoderLayer",
    "TransformerEncoder",
    "TransformerEncoderLayer",
    "TransformerASR",
    "EncoderWrapper",
]
