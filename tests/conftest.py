"""Test configuration: force CPU with a virtual 8-device mesh.

Sharding/multi-chip tests follow the recipe from SURVEY.md section 4: an
``xla_force_host_platform_device_count=8`` CPU fake mesh stands in for real
multi-chip hardware.

Note: in this environment the axon TPU plugin ignores the ``JAX_PLATFORMS``
environment variable; the backend must be pinned via
``jax.config.update("jax_platforms", ...)`` before first device use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
