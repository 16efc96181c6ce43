from dfq_tpu.utils.profiling import layer_costs, roofline_report, trace  # noqa: F401
from dfq_tpu.utils.visualize import visualize_per_layer  # noqa: F401
