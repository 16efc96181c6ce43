from dfq_tpu.ops.pallas_int8 import (  # noqa: F401
    dw3x3_int8_requant,
    matmul_int8_requant,
)
