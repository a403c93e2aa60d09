from summarymixing_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    data_parallel_sharding,
)
from summarymixing_tpu.parallel.pipeline import (
    make_pipeline_mesh,
    pipeline_layer_stack,
    pipeline_branchformer_encode,
)
from summarymixing_tpu.parallel.sequence import (
    make_seq_mesh,
    time_sharding,
    shard_time,
    sequence_parallel_encode,
    sequence_parallel_ctc_decode,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "data_parallel_sharding",
    "make_pipeline_mesh",
    "pipeline_layer_stack",
    "pipeline_branchformer_encode",
    "make_seq_mesh",
    "time_sharding",
    "shard_time",
    "sequence_parallel_encode",
    "sequence_parallel_ctc_decode",
]
