"""Test config: force CPU backend with 8 virtual devices so multi-chip
sharding tests run anywhere (SURVEY §4: multi-host tests on fake meshes).

The container may pre-register a TPU PJRT plugin via sitecustomize and set
JAX_PLATFORMS globally; override both so tests never touch the real chip.
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
