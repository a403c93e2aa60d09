from summarymixing_tpu.decoding.ctc import ctc_greedy_decode, collapse_ctc

__all__ = ["ctc_greedy_decode", "collapse_ctc"]
