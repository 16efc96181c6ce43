from dfq_tpu.passes.fold_bn import fold_batchnorm  # noqa: F401
from dfq_tpu.passes.relations import Relation, create_relations  # noqa: F401
from dfq_tpu.passes.equalize import cross_layer_equalization  # noqa: F401
from dfq_tpu.passes.absorb import bias_absorption  # noqa: F401
from dfq_tpu.passes.correct import bias_correction  # noqa: F401
from dfq_tpu.passes.clip import clip_weights  # noqa: F401
from dfq_tpu.passes.weight_quant import quantize_layer_weights  # noqa: F401
from dfq_tpu.passes.range_setter import set_quant_ranges  # noqa: F401
from dfq_tpu.passes.learned_scale import learn_scales  # noqa: F401
