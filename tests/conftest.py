"""Test config: run JAX on a virtual 8-device CPU mesh so multi-chip
sharding paths are exercised without TPU hardware (the driver separately
dry-runs the multi-chip path).

Note: the axon TPU plugin in this environment overrides the
``JAX_PLATFORMS`` env var, so the platform must be forced through
``jax.config`` after import; the XLA flag must be set before.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
