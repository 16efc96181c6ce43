from dfq_tpu.engine.int8 import Int8Model, execute_int8, lower_int8  # noqa: F401
from dfq_tpu.engine.autotune import (  # noqa: F401
    autotune_dw_policy,
    dw_policy_candidates,
    model_signature,
)
