from summarymixing_tpu.data.batching import (
    BucketSpec,
    DynamicBucketBatcher,
    make_buckets,
    pad_batch,
)
from summarymixing_tpu.data.tokenizer import CharTokenizer, load_tokenizer

__all__ = [
    "BucketSpec",
    "DynamicBucketBatcher",
    "make_buckets",
    "pad_batch",
    "CharTokenizer",
    "load_tokenizer",
]
