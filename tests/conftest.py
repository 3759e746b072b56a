"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must run before jax backends initialize. Note: in this environment the
JAX_PLATFORMS env var is ignored by the platform plugin, but
jax.config.update('jax_platforms', ...) works.
"""

import os

os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
