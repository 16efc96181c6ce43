"""dfq_tpu — a TPU-native data-free INT8 quantization & inference framework.

Re-implements the capability surface of the DFQ reference (jakc4103/DFQ:
Data-Free Quantization through weight equalization and bias correction,
arXiv:1906.04721, plus ZeroQ distilled-data calibration, arXiv:2001.00281)
as an idiomatic JAX/XLA/Pallas framework:

- models are pure functions over an explicit graph IR (no tracing hacks)
- all quantization passes are pure ``(graph, params) -> (graph, params)``
  transforms, vectorized over channels
- fake-quant simulation AND true int8 execution (Pallas kernels, int32
  accumulation, fused requantization)
- multi-chip scale-out via ``jax.sharding`` meshes (data-parallel eval,
  sharded calibration with ICI collectives)
"""

__version__ = "0.1.0"

from dfq_tpu.quant.core import (  # noqa: F401
    QSpec,
    fake_quant,
    quant_params,
)
