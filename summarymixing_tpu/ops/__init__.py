from summarymixing_tpu.ops.linear import ParallelLinear, SummaryNet
from summarymixing_tpu.ops.summary_mixing import SummaryMixing

__all__ = ["ParallelLinear", "SummaryNet", "SummaryMixing"]
