from dfq_tpu.quant.core import (  # noqa: F401
    QSpec,
    fake_quant,
    fake_quant_per_channel,
    quant_params,
    quantize_int,
    dequantize_int,
)
from dfq_tpu.quant.moments import (  # noqa: F401
    relu_gaussian_mean,
    relu_gaussian_var,
    relu6_gaussian_mean,
    relu6_gaussian_var,
)
