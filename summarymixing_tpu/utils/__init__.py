from summarymixing_tpu.utils.convert import (
    convert_linear,
    convert_summary_mixing,
    load_torch_checkpoint,
)
from summarymixing_tpu.utils.init import xavier_normal_overwrite

__all__ = [
    "convert_linear",
    "convert_summary_mixing",
    "load_torch_checkpoint",
    "xavier_normal_overwrite",
]
