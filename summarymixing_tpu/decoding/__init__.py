from summarymixing_tpu.decoding.ctc import ctc_greedy_decode, collapse_ctc
from summarymixing_tpu.decoding.ctc_prefix import compact_blank_frames

__all__ = ["ctc_greedy_decode", "collapse_ctc", "compact_blank_frames"]
