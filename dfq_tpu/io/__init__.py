from dfq_tpu.io.artifact import load_artifact, save_artifact  # noqa: F401
