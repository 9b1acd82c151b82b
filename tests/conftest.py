"""Test config: force CPU backend with 8 virtual devices so multi-chip
sharding tests run without TPU hardware (SURVEY.md section 4, item 4).

NOTE: the JAX_PLATFORMS env var alone does not override this image's
pre-registered TPU platform plugin — jax.config.update is required.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
