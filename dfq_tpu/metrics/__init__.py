from dfq_tpu.metrics.segmentation import SegEvaluator  # noqa: F401
from dfq_tpu.metrics.detection import (  # noqa: F401
    compute_average_precision,
    compute_voc2007_average_precision,
)
