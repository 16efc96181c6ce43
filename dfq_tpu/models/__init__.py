from dfq_tpu.models.common import init_params, load_torch_state_dict  # noqa: F401
from dfq_tpu.models.mobilenet_v2 import mobilenet_v2  # noqa: F401
from dfq_tpu.models.resnet import resnet18  # noqa: F401
from dfq_tpu.models.deeplab import deeplab_mobilenet_v2  # noqa: F401
from dfq_tpu.models.ssd import SSDConfig, mobilenet_v2_ssd_lite  # noqa: F401
