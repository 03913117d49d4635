"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated on emulated CPU devices per the
project test strategy (SURVEY.md §4).

Note: this environment pre-imports jax at interpreter startup (sitecustomize)
with JAX_PLATFORMS=axon (the real-TPU tunnel), so plain env-var assignment is
too late — jax.config.update is required to retarget tests to CPU. XLA_FLAGS
still works via the environment because the CPU client reads it lazily at
first backend initialization.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
