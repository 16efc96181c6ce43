from dfq_tpu.engine.int8 import Int8Model, execute_int8, lower_int8  # noqa: F401
