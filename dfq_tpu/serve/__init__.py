"""Serving-side host machinery: deadline micro-batching in front of the
fused int8 engine's compiled batch buckets."""

from dfq_tpu.serve.microbatch import MicroBatcher, MicroBatchStats

__all__ = ["MicroBatcher", "MicroBatchStats"]
